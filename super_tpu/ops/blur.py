"""Gaussian blur (separable), torchvision-compatible.

The reference smooths disparity maps with ``T.GaussianBlur(kernel)``
(``blur_image``, utils/utils.py:96-141; applied when
--depth_filter_kernel_size > 0, data_loader.py:292-298).  torchvision's
default sigma for kernel k is 0.3*((k-1)*0.5 - 1) + 0.8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_kernel1d(kernel: int, sigma: float | None = None):
    if sigma is None:
        sigma = 0.3 * ((kernel - 1) * 0.5 - 1) + 0.8
    x = jnp.arange(kernel, dtype=jnp.float32) - (kernel - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img, kernel: int = 15, sigma: float | None = None):
    """Blur the last two (spatial) dims of an array of any leading shape."""
    k = gaussian_kernel1d(kernel, sigma).astype(img.dtype)
    pad = kernel // 2
    lead = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, 1, h, w))
    kh = k.reshape(1, 1, kernel, 1)
    kw = k.reshape(1, 1, 1, kernel)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1),
                                     [(pad, pad), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1),
                                     [(0, 0), (pad, pad)], dimension_numbers=dn)
    return x.reshape(lead + (h, w))
