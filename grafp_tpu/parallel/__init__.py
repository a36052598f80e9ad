from grafp_tpu.parallel.distributed import (
    initialize_distributed,
    training_mesh,
    retrieval_mesh,
    hybrid_mesh,
)
