"""Worker for the 2-process jax.distributed CPU test (test_parallel.py).

Each process owns ONE cpu device; the pair forms a 2-device global mesh
across processes (localhost coordinator). The worker runs a shard_map
psum over the global mesh and asserts the cross-process reduction - the
same collective path a multi-host TPU pod uses, minus the ICI.

Usage: python tests/_distributed_worker.py <port> <process_id> <nproc>
"""

import functools
import os
import sys

# CPU backend with exactly one local device per process, before any jax
# import side effects (the axon plugin would otherwise grab the backend).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = " ".join(
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "host_platform_device_count" not in f
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from grafp_tpu.parallel import initialize_distributed  # noqa: E402


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc, jax.devices()
    assert len(jax.local_devices()) == 1

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    # global (nproc,) array: this process contributes the shard pid+1
    arr = jax.make_array_from_callback(
        (nproc,), sharding, lambda idx: np.asarray([float(pid + 1)])
    )

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P()
    )
    def total(x):
        return jax.lax.psum(jnp.sum(x), "data")

    got = float(total(arr))
    want = nproc * (nproc + 1) / 2.0
    assert got == want, (got, want)
    print(f"worker {pid}: psum across {nproc} processes = {got} OK",
          flush=True)


if __name__ == "__main__":
    main()
