"""Unified transform pipeline - the reference's GPUTransformNeuralfp
surface (modules/transformations.py:9-116) over this framework's DSP
pieces, for users porting reference code verbatim.

Three modes, same contract:
  * cpu=True   : time-domain corruption of x_j only (IR + noise at
                 tr_snr) - here it runs on DEVICE from corpus banks.
  * train=True : log-mel of both 1-s views -> (B, n_mels, n_frames).
  * train=False: log-mel of the full track unfolded into overlapping
                 segments; x_j (if given) corrupted at val_snr first,
                 without IR when abl=True ("sanir" ablation,
                 test_fp.py:223-231); x_j=None short-circuits for the
                 dummy DB (transformations.py:93-95).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from grafp_tpu.dsp.augment import AugmentBanks, augment_waveforms
from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
from grafp_tpu.dsp.segment import unfold_segments


class AudioTransform:
    def __init__(self, cfg, banks: Optional[AugmentBanks] = None,
                 train: bool = True, cpu: bool = False, abl: bool = False,
                 seed: int = 0):
        self.cfg = cfg
        self.banks = banks
        self.train = train
        self.cpu = cpu
        self.abl = abl
        self.mcfg = LogMelConfig.from_config(cfg)
        self.n_frames = int(cfg["n_frames"])
        self.step = cfg.seg_hop_frames
        self._key = jax.random.key(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _corrupt(self, x: jnp.ndarray, snr, ir_prob: float) -> jnp.ndarray:
        if self.banks is None or (
            self.banks.noise is None and self.banks.ir is None
        ):
            return x
        squeeze = x.ndim == 1
        xb = x[None, :] if squeeze else x
        out = augment_waveforms(
            xb, self.banks, self._next_key(),
            (float(snr[0]), float(snr[1])), ir_prob=ir_prob, noise_prob=1.0,
        )
        return out[0] if squeeze else out

    def __call__(self, x_i, x_j) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        if self.cpu:
            x_j = self._corrupt(jnp.asarray(x_j), cfg["tr_snr"],
                                float(cfg["ir_prob"]))
            return x_i, x_j[..., : int(cfg["fs"] * cfg["dur"])]

        if self.train:
            return (
                log_mel_spectrogram(jnp.asarray(x_i), self.mcfg),
                log_mel_spectrogram(jnp.asarray(x_j), self.mcfg),
            )

        # eval: full track -> overlapping segments
        spec_i = log_mel_spectrogram(jnp.asarray(x_i).reshape(-1), self.mcfg)
        X_i = unfold_segments(spec_i, self.n_frames, self.step)
        if x_j is None:
            return X_i, X_i
        ir_prob = 0.0 if self.abl else 1.0
        x_j = self._corrupt(jnp.asarray(x_j).reshape(-1), cfg["val_snr"],
                            ir_prob)
        spec_j = log_mel_spectrogram(x_j, self.mcfg)
        X_j = unfold_segments(spec_j, self.n_frames, self.step)
        return X_i, X_j
