"""Reference-contract module shim (the reference's eval.py API surface,
implemented by the on-TPU retrieval engine)."""
from grafp_tpu.retrieval.evaluate import eval_faiss  # noqa: F401
from grafp_tpu.retrieval.index import get_index  # noqa: F401
from grafp_tpu.retrieval.memmap_io import load_memmap_data  # noqa: F401
