"""Surfel splatting renderers (TPU-native replacement for pytorch3d pulsar).

The reference renders the surfel map with the pulsar CUDA sphere-splatting
kernel (renderer/renderer.py:12-78; gamma=1e-5, radius 2e-4 m -- sub-pixel
at SuPer's intrinsics, i.e. effectively point splats) for:
- per-frame visualization (nodes.py:630-650),
- the SSIM render loss (deform_mesh.py:112-123),
- optical-flow correspondence on rendered images (deform_mesh.py:292-311).

Two faces:
- :func:`render_zbuffer`: hard nearest-depth splat (viz; parity with the
  legacy direct Projector, renderer/renderer.py:82-113).
- :func:`render_soft`: differentiable bilinear splat with exponential
  depth weighting -- the pulsar-style volumetric blend with gamma -> 0.
  Gradients flow to colors and to screen positions (via the bilinear
  footprint), which is what the render loss needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from super_tpu.geometry.camera import Intrinsics, project_points


def render_zbuffer(points, colors, mask, intr: Intrinsics, height: int,
                   width: int, bg_color=0.0):
    """Hard z-buffer point splat.

    Args:
      points: (3, N) camera-frame surfels; colors: (3, N); mask: (N,).
    Returns: (3, H, W) image.
    """
    p = height * width
    _, _, coords, valid = project_points(points, intr, height, width)
    valid = valid & mask
    z = jnp.where(valid, points[2], jnp.inf)
    coords_c = jnp.where(valid, coords, p)

    zbuf = jnp.full((p + 1,), jnp.inf, dtype=points.dtype).at[coords_c].min(z)
    # Winners: surfels whose depth equals the buffer minimum at their pixel.
    win = valid & (z <= zbuf[jnp.clip(coords_c, 0, p)])
    img = jnp.full((3, p), bg_color, dtype=colors.dtype)
    tgt = jnp.where(win, coords_c, p + 0)
    rows = []
    for c in range(3):
        rows.append(jnp.full((p + 1,), bg_color, dtype=colors.dtype)
                    .at[tgt].set(colors[c], mode="drop")[:p])
    return jnp.stack(rows).reshape(3, height, width)


def render_soft(points, colors, mask, intr: Intrinsics, height: int,
                width: int, gamma: float = 1e-2, bg_color=0.0):
    """Differentiable bilinear splat with exponential depth blending.

    Each surfel deposits ``w = bilinear(u, v) * exp(-(z - z_min(pixel)) /
    (gamma * z_scale))`` into its 4 neighboring pixels; the image is the
    weight-normalized color blend over the background.  ``z_min`` is
    stop-gradiented (as is pulsar's internal sorting).

    gamma ~ 1e-2 gives a nearly-hard surface blend like pulsar's 1e-5 with
    its depth normalization; larger values soften occlusion edges.
    """
    p = height * width
    v, u, _, _ = project_points(points, intr, height, width)
    z = points[2]

    fl_v = jnp.floor(v)
    fl_u = jnp.floor(u)
    n_blk = jnp.stack([fl_v, fl_v, fl_v + 1, fl_v + 1], axis=0)  # (4, N)
    m_blk = jnp.stack([fl_u, fl_u + 1, fl_u, fl_u + 1], axis=0)
    wn = jnp.maximum(1.0 - jnp.abs(n_blk - v[None]), 0.0)
    wm = jnp.maximum(1.0 - jnp.abs(m_blk - u[None]), 0.0)
    wbil = wn * wm                                               # (4, N)
    ni = n_blk.astype(jnp.int32)
    mi = m_blk.astype(jnp.int32)
    in_b = (ni >= 0) & (ni < height) & (mi >= 0) & (mi < width) & mask[None]
    cpix = jnp.where(in_b, ni * width + mi, p)                   # (4, N)

    # Per-pixel nearest depth (hard, stop-grad) for the exponential weights.
    zh = jax.lax.stop_gradient(z)
    zbuf = jnp.full((p + 1,), jnp.inf, dtype=points.dtype)
    for k in range(4):
        zbuf = zbuf.at[cpix[k]].min(jnp.where(in_b[k], zh, jnp.inf))
    zmin = zbuf[jnp.clip(cpix, 0, p)]                            # (4, N)

    scale = gamma * jnp.maximum(jnp.abs(zmin), 1e-6)
    wdepth = jnp.exp(-jnp.maximum(z[None] - zmin, 0.0) / scale)
    # colors dtype: the weights accumulate into color-typed buffers below
    # (mixed f64 points / f32 colors must not promote the scatter).
    wfull = jnp.where(in_b, wbil * wdepth, 0.0).astype(colors.dtype)  # (4, N)

    den = jnp.zeros((p + 1,), dtype=colors.dtype)
    for k in range(4):
        den = den.at[cpix[k]].add(wfull[k])
    rows = []
    for c in range(3):
        num = jnp.zeros((p + 1,), dtype=colors.dtype)
        for k in range(4):
            num = num.at[cpix[k]].add(wfull[k] * colors[c])
        rows.append(num[:p])
    den = den[:p]
    img = jnp.stack(rows) / jnp.maximum(den[None], 1e-8)
    alpha = jnp.clip(den, 0.0, 1.0)
    img = img * alpha[None] + bg_color * (1.0 - alpha[None])
    return img.reshape(3, height, width)
