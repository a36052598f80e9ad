"""NT-Xent contrastive loss, vectorized.

Semantics identical to the reference (simclr/ntxent.py:4-29) - verified
element-for-element in tests/test_loss.py - but as one masked
log-softmax over the full similarity matrix instead of a Python loop of
2B row slices (512 iterations/step in the reference, SURVEY.md §3.1).

Layout: z = interleave(z_i, z_j) row-wise -> (2B, d) with pairs at
(2t, 2t+1) (the reference's stack(dim=1).view). For row r the positive
is r XOR 1; the self column is excluded from the softmax (masking it to
-inf is exactly equivalent to the reference's slice-out-self).

Under a data-sharded mesh the z's are global-batch arrays; the (2B, 2B)
similarity matmul makes XLA all-gather z over ICI, which IS the global
in-batch-negatives semantics (the reference's DataParallel gathers
outputs to device 0 before the loss, train.py:69-71).
"""

from __future__ import annotations

import jax.numpy as jnp


def ntxent_loss(z_i: jnp.ndarray, z_j: jnp.ndarray, tau: float) -> jnp.ndarray:
    """z_i, z_j: (B, d) L2-normalized projections. Returns scalar loss."""
    b, d = z_i.shape
    z = jnp.stack([z_i, z_j], axis=1).reshape(2 * b, d)
    sim = jnp.matmul(z, z.T, preferred_element_type=jnp.float32) / tau
    n = 2 * b
    diag = jnp.eye(n, dtype=bool)
    logits = jnp.where(diag, -jnp.inf, sim)
    log_prob = logits - jnp.nan_to_num(
        jnp.max(logits, axis=1, keepdims=True)
    )
    log_prob = log_prob - jnp.log(
        jnp.sum(jnp.exp(log_prob), axis=1, keepdims=True)
    )
    rows = jnp.arange(n)
    pos = rows ^ 1  # (2t, 2t+1) are positives of each other
    return -jnp.mean(log_prob[rows, pos])
