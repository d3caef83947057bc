"""Bilinear sampling of sparse per-surfel features through an index map.

The reference samples target-frame surfel attributes (points / normals /
seg-confidences) at float projection coordinates by looking up an
``index_map`` (pixel -> surfel id, -1 invalid) at the 4 surrounding integer
corners and bilinearly blending the gathered features, propagating NaN for
any invalid corner (super/loss.py:106-157 ``bilinear_intrpl_block`` and
:9-100 ``bilinear_sample``).

This masked re-implementation returns an explicit validity mask instead of
NaNs (mask-carried arithmetic is the TPU-native equivalent of the NaN
plumbing; the valid sets are identical).  It also returns the analytic
gradient of the sampled value w.r.t. the sampling coordinates (Spatial
Transformer eq. 6-7), needed by the derived-gradient LM path.

This sits in the residual hot loop -- it is pure gather + VPU math and fuses
into the surrounding jit; a Pallas fused version is a later optimization.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_indexed(features, index_map, v, u, *, compute_grad=False):
    """Sample ``features`` through ``index_map`` at float coords (v, u).

    Args:
      features: (M, C) per-surfel feature rows.
      index_map: (H, W) int32; >=0 is a row of ``features``, -1 invalid.
      v, u: (N,) float row / col coordinates.
      compute_grad: also return d(value)/d(u,v).
    Returns:
      values: (N, C) blended features (zeros where invalid).
      valid:  (N,) bool -- all four corners mapped to valid surfels and lay
        in-bounds (parity with the reference's NaN-propagation + U_nm_valid).
      grad:   (N, C, 2) with [..., 0] = d/du and [..., 1] = d/dv, or None.
        (Note the reference stacks [d/du, d/dv] in this order too, despite
        its comment saying otherwise -- see the dPi chain in
        super/loss.py:257-259.)
    """
    h, w = index_map.shape
    # Corners (floor, floor+1) rather than the reference's (floor, ceil):
    # identical for non-integer coordinates, but correct at exact integers
    # where floor == ceil makes the reference double-count corners (its f64
    # +1e-8 projection guard hides this; in f32 the guard underflows).
    fl_v, cl_v = jnp.floor(v), jnp.floor(v) + 1.0
    fl_u, cl_u = jnp.floor(u), jnp.floor(u) + 1.0

    n_blk = jnp.stack([fl_v, fl_v, cl_v, cl_v], axis=1)  # (N, 4) row coords
    m_blk = jnp.stack([fl_u, cl_u, fl_u, cl_u], axis=1)  # (N, 4) col coords

    ni = n_blk.astype(jnp.int32)
    mi = m_blk.astype(jnp.int32)
    ni_c = jnp.clip(ni, 0, h - 1)
    mi_c = jnp.clip(mi, 0, w - 1)
    sf_idx = index_map[ni_c, mi_c]  # (N, 4)
    corner_valid = (sf_idx >= 0) & (ni >= 0) & (ni < h) & (mi >= 0) & (mi < w)

    gathered = features[jnp.clip(sf_idx, 0, features.shape[0] - 1)]  # (N, 4, C)
    gathered = jnp.where(corner_valid[..., None], gathered, 0.0)

    dn = n_blk - v[:, None]
    dm = m_blk - u[:, None]
    wn = jnp.maximum(1.0 - jnp.abs(dn), 0.0)  # (N, 4)
    wm = jnp.maximum(1.0 - jnp.abs(dm), 0.0)

    values = jnp.sum(gathered * (wn * wm)[..., None], axis=1)  # (N, C)
    valid = jnp.all(corner_valid, axis=1)

    if not compute_grad:
        return values, valid, None

    # d(1 - |x|)/dx = -sign(x); the reference uses where(x >= 0, 1, -1),
    # i.e. sign(+0) = +1 -- keep that convention exactly.
    sgn_n = jnp.where(dn >= 0, 1.0, -1.0)
    sgn_m = jnp.where(dm >= 0, 1.0, -1.0)
    d_du = jnp.sum(gathered * (wn * sgn_m)[..., None], axis=1)
    d_dv = jnp.sum(gathered * (wm * sgn_n)[..., None], axis=1)
    grad = jnp.stack([d_du, d_dv], axis=2)  # (N, C, 2)
    return values, valid, grad


def bilinear_sample_image(image, v, u):
    """Plain bilinear sampling of a dense (H, W, C) image at float (v, u).

    Equivalent of ``F.grid_sample(..., align_corners=False?)`` usage in the
    autograd losses when no index_map is involved.  Out-of-bounds corners are
    clamped; returns (values, in_bounds_mask).
    """
    h, w = image.shape[0], image.shape[1]
    fl_v, cl_v = jnp.floor(v), jnp.floor(v) + 1.0
    fl_u, cl_u = jnp.floor(u), jnp.floor(u) + 1.0
    n_blk = jnp.stack([fl_v, fl_v, cl_v, cl_v], axis=1)
    m_blk = jnp.stack([fl_u, cl_u, fl_u, cl_u], axis=1)
    ni = jnp.clip(n_blk.astype(jnp.int32), 0, h - 1)
    mi = jnp.clip(m_blk.astype(jnp.int32), 0, w - 1)
    gathered = image[ni, mi]  # (N, 4, C)
    wn = jnp.maximum(1.0 - jnp.abs(n_blk - v[:, None]), 0.0)
    wm = jnp.maximum(1.0 - jnp.abs(m_blk - u[:, None]), 0.0)
    values = jnp.sum(gathered * (wn * wm)[..., None], axis=1)
    in_bounds = (v >= 0) & (v <= h - 1) & (u >= 0) & (u <= w - 1)
    return values, in_bounds
