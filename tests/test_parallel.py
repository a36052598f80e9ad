import jax

from grafp_tpu.core.mesh import DATA_AXIS, DB_AXIS
from grafp_tpu.parallel import (
    hybrid_mesh,
    initialize_distributed,
    retrieval_mesh,
    training_mesh,
)


def test_mesh_presets():
    m = training_mesh()
    assert m.shape[DATA_AXIS] == 8 and m.shape[DB_AXIS] == 1
    m = retrieval_mesh()
    assert m.shape[DB_AXIS] == 8
    m = hybrid_mesh(n_db=2)
    assert m.shape[DATA_AXIS] == 4 and m.shape[DB_AXIS] == 2


def test_initialize_distributed_single_host_noop():
    initialize_distributed()  # must not raise on single host
    initialize_distributed(num_processes=1)
