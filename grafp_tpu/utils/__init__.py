from grafp_tpu.utils.helpers import (
    create_fp_dir,
    count_parameters,
    query_len_from_seconds,
    seconds_from_query_len,
)
