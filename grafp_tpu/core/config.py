"""Typed configuration for grafp_tpu.

Reads the reference's flat-YAML schema verbatim (keys of
/root/reference/config/grafp.yaml:1-56 and config/ast.yaml) so the public
CLI contract (``train.py --config config/grafp.yaml``) holds, while adding
TPU-specific knobs (compute dtype, mesh shape, kernel selection) with safe
defaults. Unknown YAML keys are preserved in ``extras`` rather than dropped,
and dict-style ``cfg['key']`` access is supported for driver-code parity
with the reference's plain-dict convention (reference util.py:124-130).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


def _as_list(x, n=None, cast=float):
    if x is None:
        return None
    if isinstance(x, (list, tuple)):
        out = [cast(v) for v in x]
    else:
        out = [cast(x)]
    if n is not None and len(out) == 1:
        out = out * n
    return out


@dataclass
class Config:
    """Flat experiment configuration.

    Field names intentionally match the reference YAML keys one-to-one
    (reference config/grafp.yaml) so existing configs load unchanged.
    """

    # --- dataset directories (reference config/grafp.yaml:1-6) ---
    data_dir: str = "data"
    train_dir: str = "PATH/TO/TRAINING/DATA"
    val_dir: str = "PATH/TO/VALIDATION/DATA"
    ir_dir: Optional[str] = None
    noise_dir: Optional[str] = None

    # --- model input parameters (grafp.yaml:9-21) ---
    arch: str = "grafp"          # 'grafp' | 'ast' | 'nafp'
    fs: int = 16000
    dur: float = 1.0
    offset: float = 0.05
    norm: Optional[float] = 0.95  # quantile used for amplitude normalization
    win_len: int = 1024
    hop_len: int = 512
    n_mels: int = 64
    n_fft: int = 1024
    n_peaks: int = 512
    silence: float = 0.0005
    blur_kernel: List[int] = field(default_factory=lambda: [7, 7])

    # --- dataset and model hyperparameters (grafp.yaml:24-36) ---
    train_sz: int = 8000
    val_sz: int = 106574
    bsz_train: int = 256
    peak_stride: int = 2
    n_filters: int = 8
    tau: float = 0.05
    lr: float = 8.0e-5
    min_lr: float = 7.0e-7
    n_epochs: int = 400
    T_max: int = 400
    error_threshold: int = 5
    # 'lambda' is a reserved word; stored under lambda_ but serialized as
    # 'lambda' for YAML round-trips (reference grafp.yaml:35).
    lambda_: float = 0.0

    # --- augmentation hyperparameters (grafp.yaml:39-47) ---
    n_frames: int = 32
    overlap: float = 0.9
    tr_snr: List[float] = field(default_factory=lambda: [0.0, 20.0])
    val_snr: List[float] = field(default_factory=lambda: [0.0, 10.0])
    test_snr: List[float] = field(default_factory=lambda: [19.0, 21.0])
    time_mask: int = 8
    freq_mask: int = 16
    noise_prob: float = 1.0
    ir_prob: float = 1.0

    # --- model architecture (grafp.yaml:50-52) ---
    d: int = 128      # fingerprint dimension
    h: int = 1024     # encoder embedding dimension
    u: int = 32       # projector expansion (hidden = d*u)

    # --- validation database sizes (grafp.yaml:55-56) ---
    n_dummy: int = 100
    n_query: int = 20

    # ============== TPU-native extensions (not in reference) ==============
    # Graph encoder topology knobs; defaults replicate the reference's
    # effective behavior (graph_encoder.py:96-152: size 't', k=3, and —
    # because the reference never increments its block index — dilation 1
    # and drop_path 0 for every block).
    size: str = "t"
    k: int = 3
    dilation_schedule: str = "reference"  # 'reference' (all 1) | 'ramp'
    drop_path: float = 0.1                # peak rate when schedule='ramp'
    drop_path_schedule: str = "reference"  # 'reference' (all 0) | 'ramp'

    # numerics / performance
    compute_dtype: str = "float32"   # 'float32' | 'bfloat16' matmul inputs
    # int8 quantized matmuls for fingerprint EXTRACTION (the v5e MXU
    # int8 path is 2x the bf16 rate). 'none' | 'int8' (dynamic per-call
    # activation scales; measured 0.927x bf16 — the max passes dominate)
    # | 'int8_static' (calibrated per-layer scales from one
    # 'int8_calibrate' pass, models/simclr.calibrate_act_scales — no
    # dynamic max passes). Serving only: the train driver rejects it
    # (round() has zero gradient), and the projector + pallas selection
    # kernel stay bf16/f32 (models/layers.py:int8_*_matmul).
    serve_quant: str = "none"
    bn_cross_replica: bool = False   # batch-norm stats across data shards
    knn_block_size: int = 0          # 0 = dense; >0 = blockwise distance
    # neighbor-selection strategy for dilation-1 MRConv blocks:
    # 'auto' = 'pallas' on TPU else 'onehot'. Exact semantics throughout.
    # v5e stage-1 timings: pallas 6.0 / onehot 10.5 / approx 19.3 /
    # exact(top_k+gather) 88.6 ms (scripts/profile_knn_variants.py,
    # scripts/profile_pallas_knn.py).
    knn_strategy: str = "auto"
    use_pallas: bool = True          # prefer Pallas kernels when on TPU
    remat: bool = False              # jax.checkpoint the backbone blocks

    # mesh / parallelism
    mesh_data: int = 0               # 0 = all visible devices on 'data'
    mesh_db: int = 0                 # retrieval: devices on the 'db' axis

    # retrieval defaults (reference eval.py:9-123)
    index_type: str = "ivfpq"
    n_centroids: int = 64
    nprobe: int = 20
    k_probe: int = 20
    # per-block top-k inside the index scan: 'exact' (lax.top_k,
    # FAISS-parity ranking) | 'approx' (lax.approx_max_k at scan_recall
    # per-neighbor recall). The block scan is top-k-bound on v5e
    # (exact top_k over a (1024, 1M) block ~75 ms vs ~8 ms matmul);
    # approx measures 11.2x end-to-end at 7M rows
    # (scripts/profile_scan_dtype.py). Exact stays the default for
    # reference parity; flip for large-DB serving.
    scan_topk: str = "exact"
    scan_recall: float = 0.99

    # anything in the YAML we do not model explicitly
    extras: Dict[str, Any] = field(default_factory=dict)

    # ---- dict-style access for reference-driver parity ----
    _ALIASES = {"lambda": "lambda_"}

    def __getitem__(self, key: str) -> Any:
        key = self._ALIASES.get(key, key)
        if hasattr(self, key):
            return getattr(self, key)
        return self.extras[key]

    def __setitem__(self, key: str, value: Any) -> None:
        key = self._ALIASES.get(key, key)
        if hasattr(self, key):
            object.__setattr__(self, key, value)
        else:
            self.extras[key] = value

    def __contains__(self, key: str) -> bool:
        key = self._ALIASES.get(key, key)
        return hasattr(self, key) or key in self.extras

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    # ---- derived quantities ----
    @property
    def clip_frames(self) -> int:
        """Samples per 1-second training clip (reference data.py:59)."""
        return int(self.fs * self.dur)

    @property
    def n_nodes(self) -> int:
        """Graph nodes emitted by the peak embedder
        (reference graph_encoder.py:124: n_mels*n_frames//peak_stride)."""
        return self.n_mels * self.n_frames // self.peak_stride

    @property
    def seg_hop_frames(self) -> int:
        """Frame hop between overlapping eval segments
        (reference transformations.py:90: int(n_frames*(1-overlap))).
        Floored at 1: at degenerate geometries (high overlap x small
        n_frames, e.g. the tc_29 preset's 0.9 on a 8-frame test config)
        the reference formula truncates to 0 and its unfold would
        zero-divide; a 1-frame hop is the closest well-defined protocol
        (production geometry 32 x 0.9 -> 3 is unaffected)."""
        return max(1, int(self.n_frames * (1 - self.overlap)))

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for f in dataclasses.fields(self):
            if f.name == "extras":
                continue
            name = "lambda" if f.name == "lambda_" else f.name
            out[name] = getattr(self, f.name)
        out.update(self.extras)
        return out

    def save(self, path: str) -> None:
        with open(path, "w") as fp:
            yaml.safe_dump(self.to_dict(), fp, sort_keys=False)


_FIELD_NAMES = {f.name for f in dataclasses.fields(Config)} - {"extras"}


def load_config(config_path: str) -> Config:
    """Load a reference-schema YAML into a typed Config.

    Mirrors the reference's ``load_config`` (util.py:124-127) but returns a
    dataclass; unknown keys land in ``extras`` so nothing is lost.
    """
    with open(config_path, "r") as fp:
        raw = yaml.safe_load(fp) or {}
    return config_from_dict(raw)


def config_from_dict(raw: Dict[str, Any]) -> Config:
    kwargs: Dict[str, Any] = {}
    extras: Dict[str, Any] = {}
    for key, val in raw.items():
        name = Config._ALIASES.get(key, key)
        if name in _FIELD_NAMES:
            kwargs[name] = val
        else:
            extras[name] = val
    cfg = Config(**kwargs, extras=extras)
    # normalize SNR ranges to 2-element float lists
    cfg.tr_snr = _as_list(cfg.tr_snr, 2)
    cfg.val_snr = _as_list(cfg.val_snr, 2)
    cfg.test_snr = _as_list(cfg.test_snr, 2)
    return cfg


def override(config_val: Any, arg: Any) -> Any:
    """CLI-over-YAML precedence, same contract as reference util.py:129-130."""
    return arg if arg is not None else config_val
