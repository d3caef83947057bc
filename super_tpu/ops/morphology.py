"""Binary morphology + semantic edge-region extraction (XLA reduce_window).

Replaces the reference's conv/maxpool-based morphology:
- ``torch_dilate`` (utils/utils.py:152-157): ones-kernel conv > 0 == max-pool.
- ``pyt_erode`` / ``pyt_dilate`` (utils/utils.py:256-264): k x k max-pool
  with same padding.
- ``find_edge_region`` (utils/utils.py:276-301): per-class boundary band =
  dilate(complement) AND class mask, with the image border zeroed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _maxpool_same(x, kernel: int):
    """k x k max pool, stride 1, same padding, over the last two dims."""
    pad = kernel // 2
    lo_hi = [(0, 0)] * (x.ndim - 2) + [(pad, kernel - 1 - pad)] * 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
        if jnp.issubdtype(x.dtype, jnp.integer)
        else False,
        jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (kernel, kernel),
        window_strides=(1,) * x.ndim,
        padding=lo_hi,
    )


def dilate(mask, kernel: int = 11):
    """Binary dilation of a (..., H, W) bool mask."""
    return _maxpool_same(mask, kernel)


def erode(mask, kernel: int = 11):
    """Binary erosion of a (..., H, W) bool mask."""
    return ~_maxpool_same(~mask, kernel)


def find_edge_region(seg, num_classes: int, class_list=None, kernel: int = 11,
                     ignore_img_edge: bool = True):
    """Boundary band of semantic regions.

    Args:
      seg: (H, W) int class labels.
      class_list: classes to consider (default: all in [0, num_classes)).
    Returns: (H, W) bool -- pixels of a listed class whose k-neighborhood
      contains another class.  Parity: utils/utils.py:276-301 (the reference
      operates on one-hot stacks; the per-class formulation is identical).
    """
    if class_list is None:
        class_list = list(range(num_classes))
    h, w = seg.shape
    edge = jnp.zeros((h, w), dtype=bool)
    for cid in class_list:
        cmask = seg == cid
        band = dilate(~cmask, kernel) & cmask
        edge = edge | band
    if ignore_img_edge:
        border = jnp.zeros((h, w), dtype=bool)
        border = border.at[:kernel, :].set(True)
        border = border.at[-kernel:, :].set(True)
        border = border.at[:, :kernel].set(True)
        border = border.at[:, -kernel:].set(True)
        edge = edge & ~border
    return edge


def erode_dilate_valid_seg(seg, num_classes: int, kernel: int = 31):
    """Pixels whose label survives an open (erode-then-dilate) per class.

    Parity: utils/utils.py:266-274 (``erode_dilate_seg``)."""
    valid = jnp.ones(seg.shape, dtype=bool)
    for cid in range(num_classes):
        cmask = seg == cid
        opened = dilate(erode(cmask, kernel), kernel)
        valid = valid & (cmask == opened)
    return valid
