"""SSIM dissimilarity map (monodepth2 convention).

Parity: depth/monodepth2/layers.py:217-247 -- reflection-padded k x k
average pools, C1 = 0.01^2, C2 = 0.03^2, output ``clamp((1 - SSIM)/2, 0, 1)``.
Used by the render loss (super/deform_mesh.py:115) with kernel=11 and by the
stereo depth-confidence path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _avgpool_valid(x, kernel: int):
    """k x k mean pool, stride 1, VALID padding, over the last two dims."""
    window = (1,) * (x.ndim - 2) + (kernel, kernel)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1,) * x.ndim, "VALID")
    return s / float(kernel * kernel)


def _reflect_pad(x, pad: int):
    cfg = [(0, 0)] * (x.ndim - 2) + [(pad, pad)] * 2
    return jnp.pad(x, cfg, mode="reflect")


def ssim(x, y, kernel: int = 3):
    """SSIM dissimilarity of two (..., H, W) images, same spatial shape out.

    Returns ``clip((1 - SSIM_map) / 2, 0, 1)`` like the reference."""
    pad = kernel // 2
    xp, yp = _reflect_pad(x, pad), _reflect_pad(y, pad)
    mu_x = _avgpool_valid(xp, kernel)
    mu_y = _avgpool_valid(yp, kernel)
    sig_x = _avgpool_valid(xp * xp, kernel) - mu_x * mu_x
    sig_y = _avgpool_valid(yp * yp, kernel) - mu_y * mu_y
    sig_xy = _avgpool_valid(xp * yp, kernel) - mu_x * mu_y
    num = (2 * mu_x * mu_y + _C1) * (2 * sig_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sig_x + sig_y + _C2)
    return jnp.clip((1 - num / den) / 2, 0.0, 1.0)
