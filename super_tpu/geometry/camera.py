"""Pinhole camera projection / backprojection (pure jnp).

Parity targets:
- ``pcd2depth`` (utils/utils.py:161-184): 3D points -> screen coords
  ``coord = round(v) * W + round(u)`` with a validity margin test.
- ``depth2pcd`` / monodepth2 ``BackprojectDepth`` (utils/utils.py:186-208,
  depth/monodepth2/layers.py:139-167): depth map -> camera-frame point cloud.

All functions are shape-static and mask-based; invalid entries are flagged,
never compacted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole intrinsics; fields are scalar arrays so the struct is a pytree
    and can be traced (one set per stream under vmap)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def from_matrix(cls, k, dtype=jnp.float32):
        """Build from a (4,4) or (3,3) K matrix (reference K layout,
        utils/data_loader.py:202-211).  Forces f32 by default so enabling
        x64 in a host process doesn't promote the whole compute path."""
        k = jnp.asarray(k, dtype=dtype)
        return cls(fx=k[0, 0], fy=k[1, 1], cx=k[0, 2], cy=k[1, 2])

    @classmethod
    def superv1(cls):
        """Hard-wired SuPer-V1 intrinsics (utils/data_loader.py:202-206)."""
        return cls.from_matrix(
            jnp.array([[883.0, 0.0, 445.06], [0.0, 883.0, 190.24], [0.0, 0.0, 1.0]])
        )

    @classmethod
    def superv2(cls):
        """Hard-wired SuPer-V2 intrinsics (utils/data_loader.py:207-211)."""
        return cls.from_matrix(
            jnp.array(
                [
                    [768.98551924, 0.0, 292.8861567],
                    [0.0, 768.98551924, 291.61479526],
                    [0.0, 0.0, 1.0],
                ]
            )
        )


def project_points(points, intr: Intrinsics, height: int, width: int,
                   valid_margin: int = 0):
    """Project camera-frame points onto the image plane.

    Args:
      points: (3, ...) camera-frame XYZ, feature-major (axis 0 = x, y, z).
    Returns:
      (v, u, coords, valid):
        v, u: (...,) float screen coordinates (row, col).
        coords: (...,) int32 flattened ``round(v) * width + round(u)``.
        valid: (...,) bool, margin test on the *rounded* coordinates.
    Parity: utils/utils.py:161-184 (including the ``Z + 1e-8`` guard and the
    asymmetric ``< dim - 1 - margin`` upper bound).
    """
    x, y, z = points[0], points[1], points[2] + 1e-8
    u = x * intr.fx / z + intr.cx
    v = y * intr.fy / z + intr.cy
    # Match torch.round / rint semantics (round-half-to-even).
    ui = jnp.rint(u).astype(jnp.int32)
    vi = jnp.rint(v).astype(jnp.int32)
    coords = vi * width + ui
    valid = (
        (vi >= valid_margin)
        & (vi < height - 1 - valid_margin)
        & (ui >= valid_margin)
        & (ui < width - 1 - valid_margin)
    )
    return v, u, coords, valid


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """(u, v) meshgrid of pixel coordinates, each (H, W).

    Parity: utils/utils.py:22-37 (``get_grid_coords`` with indexing='xy')."""
    u = jnp.arange(width, dtype=dtype)
    v = jnp.arange(height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return uu, vv


def backproject_depth(depth, intr: Intrinsics):
    """Depth map (H, W) -> camera-frame point cloud (3, H, W), feature-major.

    X = (u - cx) Z / fx, Y = (v - cy) Z / fy.
    Parity: utils/utils.py:186-208 and depth/monodepth2/layers.py:139-167
    (BackprojectDepth uses inv_K @ [u,v,1] * depth, identical for a pinhole K).
    """
    h, w = depth.shape[-2], depth.shape[-1]
    uu, vv = pixel_grid(h, w, dtype=depth.dtype)
    x = (uu - intr.cx) * depth / intr.fx
    y = (vv - intr.cy) * depth / intr.fy
    return jnp.stack([x, y, depth], axis=0)


def warp_stereo_coords(points_h, intr: Intrinsics, baseline_tx, height: int,
                       width: int, eps: float = 1e-7):
    """Project right-camera-shifted points to normalized [-1,1] grid coords.

    Used by the SSIM depth-confidence path (data_loader.py:359-372 via
    monodepth2 ``Project3D``, layers.py:170-192): P = K @ T with T a pure
    x-translation of the stereo baseline.

    Args:
      points_h: (3, H, W) camera points, feature-major.
      baseline_tx: scalar translation along x (stereo_T[0, 3]).
    Returns: (H, W, 2) normalized sampling grid (x, y) in [-1, 1].
    """
    x = points_h[0] + baseline_tx
    y = points_h[1]
    z = points_h[2] + eps
    u = x * intr.fx / z + intr.cx
    v = y * intr.fy / z + intr.cy
    gx = u / (width - 1) * 2.0 - 1.0
    gy = v / (height - 1) * 2.0 - 1.0
    return jnp.stack([gx, gy], axis=-1)
