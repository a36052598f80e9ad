from grafp_tpu.retrieval.search import exact_topk, exact_topk_sharded
from grafp_tpu.retrieval.memmap_io import load_memmap_data, save_memmap
