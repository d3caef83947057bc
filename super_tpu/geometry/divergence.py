"""Distribution divergences used for semantic-aware KNN weights / ICP weights.

Parity: utils/utils.py:244-254 (KLD/JSD) -- note the reference's slightly
unusual epsilon placement ``(P * log(P/(Q+eps) + eps)).sum``; we reproduce it
exactly since the JSD feeds softmax weights whose values matter for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def kld(p, q, eps: float = 1e-13, axis: int = -1):
    """KL(P || Q) with the reference's epsilon convention."""
    return jnp.sum(p * jnp.log(p / (q + eps) + eps), axis=axis)


def jsd(p, q, eps: float = 1e-13, axis: int = -1):
    """Jensen-Shannon divergence between P and Q."""
    m = 0.5 * (p + q)
    return 0.5 * (kld(p, m, eps=eps, axis=axis) + kld(q, m, eps=eps, axis=axis))
