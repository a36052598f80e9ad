"""Multi-chip / multi-host topology setup.

The reference's only parallelism is single-process DataParallel
(reference train.py:165-168). Here the scaling story is explicit
(SURVEY.md §2.4):

  * training: 1-D 'data' mesh; the jitted global-batch step gets its
    gradient psum and NT-Xent negative all-gather from GSPMD over ICI.
  * retrieval: 1-D 'db' mesh; DB rows shard across chips, local top-k +
    all-gather merge (retrieval/search.py:exact_topk_sharded).
  * hybrid: ('data', 'db') for concurrent fingerprinting + search
    services on one slice.
  * multi-host: jax.distributed.initialize() before any device access;
    meshes then span the full slice (ICI) or multi-slice (DCN) with the
    data axis outermost so gradient psums ride ICI within a slice and
    only the (small) cross-slice reductions touch DCN.

Validated on virtual CPU meshes (tests/) and by the driver's
dryrun_multichip; real multi-chip hardware is exercised identically -
none of the model code changes with mesh size.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh

from grafp_tpu.core.mesh import DATA_AXIS, DB_AXIS, make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (no-op single-host). Call before device access.

    With no args, reads the standard env (JAX_COORDINATOR_ADDRESS etc.)
    or auto-detects the TPU pod runtime.
    """
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") == "localhost":
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def training_mesh() -> Mesh:
    """All chips on the 'data' axis."""
    return make_mesh(n_data=0, n_db=1)


def retrieval_mesh() -> Mesh:
    """All chips on the 'db' axis."""
    return make_mesh(n_data=1, n_db=len(jax.devices()))


def hybrid_mesh(n_db: int) -> Mesh:
    """Remaining chips on 'data', n_db chips on 'db'."""
    return make_mesh(n_data=0, n_db=n_db)
