"""Reference-contract module shim for the reference's util.py surface."""
from grafp_tpu.core.config import load_config, override  # noqa: F401
from grafp_tpu.data.indexing import (  # noqa: F401
    load_augmentation_index,
    load_index,
    update_index,
)
from grafp_tpu.train.checkpoint import load_ckp, save_ckp  # noqa: F401
from grafp_tpu.utils.helpers import (  # noqa: F401
    count_parameters,
    create_fp_dir,
    query_len_from_seconds,
    seconds_from_query_len,
)
from grafp_tpu.data.dataset import qtile_norm  # noqa: F401
