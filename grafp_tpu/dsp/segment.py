"""Segment unfolding: full-track spectrogram -> overlapping model inputs.

Equivalent of the reference's eval-time path
(modules/transformations.py:89-113): log-mel of the whole track
(n_mels, T frames) -> transpose -> ``unfold(0, n_frames, step)`` ->
(n_segments, n_mels, n_frames), where step = int(n_frames*(1-overlap))
(3 frames at overlap 0.9). Implemented as a static gather so it jits.
"""

from __future__ import annotations

import jax.numpy as jnp


def num_segments(total_frames: int, n_frames: int, step: int) -> int:
    """Segments produced by unfold (torch.Tensor.unfold semantics):
    floor((total - size)/step) + 1, or 0 when total < size."""
    if total_frames < n_frames:
        return 0
    return (total_frames - n_frames) // step + 1


def unfold_segments(spec: jnp.ndarray, n_frames: int, step: int) -> jnp.ndarray:
    """(n_mels, T) -> (n_segments, n_mels, n_frames).

    Matches ``spec.transpose(1,0).unfold(0, n_frames, step)``: segment s
    covers frames [s*step, s*step + n_frames).
    """
    n_mels, total = spec.shape
    s = num_segments(total, n_frames, step)
    starts = jnp.arange(s) * step                          # (S,)
    idx = starts[:, None] + jnp.arange(n_frames)[None, :]  # (S, n_frames)
    return jnp.take(spec, idx, axis=1).transpose(1, 0, 2)  # -> (S, n_mels, n_frames)


def segment_starts_samples(n_segments: int, hop_len: int, step: int) -> jnp.ndarray:
    """Audio-sample offset of each segment start (for provenance/debug)."""
    return jnp.arange(n_segments) * step * hop_len
