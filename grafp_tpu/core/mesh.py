"""Device mesh and sharding helpers.

The reference scales only via single-process ``torch.nn.DataParallel``
(reference train.py:165-168). Here parallelism is expressed the TPU way:
a ``jax.sharding.Mesh`` over the visible devices, sharding annotations on
the global-batch program, and GSPMD/XLA inserting the ICI collectives
(psum for grads, all-gather for the NT-Xent global negatives and for
retrieval top-k merges).

Axes:
    'data'  — batch data parallelism for training / fingerprint generation
    'db'    — database-shard axis for retrieval (distance matmul + local
              top-k per shard, merged across the axis)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DB_AXIS = "db"


def make_mesh(
    n_data: int = 0,
    n_db: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'db') mesh.

    n_data=0 means "all remaining devices". For single-axis use cases pass
    n_db=1 (training) or n_data=1 (pure retrieval).
    """
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data == 0:
        if total % max(n_db, 1) != 0:
            raise ValueError(f"{total} devices not divisible by n_db={n_db}")
        n_data = total // max(n_db, 1)
    use = n_data * n_db
    if use > total:
        raise ValueError(f"mesh {n_data}x{n_db} needs {use} > {total} devices")
    arr = np.asarray(devices[:use]).reshape(n_data, n_db)
    return Mesh(arr, (DATA_AXIS, DB_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension across the 'data' axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def db_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (database-row) dimension across the 'db' axis."""
    spec = P(DB_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def db_mesh_from_config(cfg) -> Optional[Mesh]:
    """Retrieval mesh from the config's ``mesh_db`` knob, or None.

    ``mesh_db > 1`` lays the requested number of visible devices on the
    'db' axis so eval_faiss -> get_index('l2') builds the sharded index
    (IndexFlatSharded). The default (0 or 1) keeps the single-chip path.
    Returns None - never raises - when the host cannot provide the
    devices, so a config written for a pod still runs on one chip.
    """
    n_db = int(cfg.get("mesh_db", 0) or 0) if hasattr(cfg, "get") else int(cfg)
    if n_db <= 1:
        return None
    devices = jax.devices()
    if len(devices) < n_db:
        print(f"[mesh] mesh_db={n_db} requested but only {len(devices)} "
              f"device(s) visible; falling back to single-chip retrieval")
        return None
    return make_mesh(n_data=1, n_db=n_db, devices=devices[:n_db])


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} % {n} devices != 0")
    return global_batch // n
