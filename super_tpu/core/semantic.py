"""Semantic-SuPer and appearance losses (autograd faces).

- ``bn_morph_loss``: surfels whose warped projection lands in a *different*
  semantic class are pulled toward their own class's segmentation boundary
  (reference deform_mesh.py:126-194).  The reference gathers boundary pixels
  and takes the mean squared distance to their 2 nearest; here the pull is
  the squared per-class *distance transform* sampled differentiably at the
  projection -- same minimizer (the boundary), no ragged KNN, and the
  gradient flows through the projection into the warp.
- ``render_loss``: squared SSIM between the softly-splatted surfel render
  and the frame (deform_mesh.py:112-123), masked to rendered pixels and
  clipped at 0.1.
- ``corr_loss``: optical-flow-guided correspondence loss
  (DataLoss.autograd_forward with flow, loss.py:313-366): flow maps source
  projections to target coordinates; point-point or point-plane residuals
  against the bilinearly sampled target.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.preprocess import chamfer_distance_transform
from super_tpu.geometry.camera import Intrinsics, project_points
from super_tpu.ops.bilinear import (
    bilinear_sample_image,
    bilinear_sample_indexed,
    bilinear_sample_two,
)
from super_tpu.ops.morphology import find_edge_region
from super_tpu.ops.ssim import ssim


class SemanticExtras(NamedTuple):
    """Per-frame dense inputs for the semantic/appearance losses."""

    seg_conf_image: jnp.ndarray   # (C, H, W) frame class confidences
    edge_dt: jnp.ndarray          # (C, H, W) per-class boundary DT (pixels)
    color_image: jnp.ndarray      # (3, H, W)
    flow: Optional[jnp.ndarray]   # (2, H, W) optical flow (u, v) or None
    # (2, Np) source (pre-deformation) projections anchoring the corr-loss
    # flow match, or None to anchor at the current warped projection (the
    # sf_corr_match_renderimg mode, where the flow tracks the render).
    src_uv: Optional[jnp.ndarray] = None
    # (4*2C, H*W) corner bank of [seg_conf_image; edge_dt]
    # (ops/bilinear.py:build_corner_bank_image): bn_morph samples both
    # fields with ONE 1-index-per-query gather instead of two
    # (N, 4)-minor-axis image gathers (whose 4 -> 128 tile padding made
    # the bn_morph grad the semantic iteration's dominant 43 ms).
    morph_bank: Optional[jnp.ndarray] = None


def build_semantic_extras(cfg: SuPerConfig, frame_seg, frame_seg_conf,
                          color_image, flow=None,
                          src_uv=None) -> SemanticExtras:
    """Precompute the per-class boundary distance transforms (pixel metric,
    kernel-3 edges as in deform_mesh.py:146-152)."""
    from super_tpu.ops.bilinear import build_corner_bank_image

    c = cfg.num_classes
    dts = []
    for cid in range(c):
        edge = find_edge_region(frame_seg, c, class_list=[cid], kernel=3)
        dts.append(chamfer_distance_transform(edge, 1.0, 1.0, iterations=64))
    edge_dt = jnp.stack(dts)
    return SemanticExtras(
        seg_conf_image=frame_seg_conf,
        edge_dt=edge_dt,
        color_image=color_image,
        flow=flow,
        src_uv=src_uv,
        morph_bank=build_corner_bank_image(
            jnp.concatenate([frame_seg_conf, edge_dt], axis=0)),
    )


def bn_morph_loss(cfg: SuPerConfig, extras: SemanticExtras, warped_points,
                  sf_seg, sf_mask, intr: Intrinsics):
    """Boundary-morph pull for misclassified surfels.

    Args:
      warped_points: (3, Np) warped surfels; sf_seg: (Np,); sf_mask: (Np,).
    """
    from super_tpu.ops.bilinear import bilinear_sample_bank_image

    h, w = cfg.height, cfg.width
    v, u, _, _ = project_points(warped_points, intr, h, w)
    inb = (u > -1) & (u < w) & (v > -1) & (v < h)

    # ONE corner-bank gather samples the class gate AND the per-class DT:
    # conf rows combine with stop-grad weights (grid_sample-at-detached-
    # coords parity, deform_mesh.py:136-139 -- the gate doesn't pull), dt
    # rows differentiably (the pull flows through the projection).
    c = extras.edge_dt.shape[0]
    vals_fm, _ = bilinear_sample_bank_image(
        extras.morph_bank, 2 * c, h, w, v, u, stop_grad_rows=(0, c))
    conf = vals_fm[:c].T                                      # (Np, C)
    new_seg = jnp.argmax(conf, axis=-1)
    morph = sf_mask & inb & (new_seg != sf_seg)

    dt_all = vals_fm[c:].T                                    # (Np, C)
    dt_own = jnp.take_along_axis(dt_all, sf_seg[:, None], axis=1)[:, 0]

    # Filter: ignore surfels closer to the image border than to the
    # boundary (deform_mesh.py:173-178), and the reference's > 15 px^2
    # threshold (deform_mesh.py:186).
    dist_img_edge = jnp.minimum(jnp.minimum(u, w - u), jnp.minimum(v, h - v))
    valid_match = dt_own <= jax.lax.stop_gradient(dist_img_edge)
    sq = dt_own * dt_own
    keep = morph & valid_match & (jax.lax.stop_gradient(sq) > 15.0)
    cnt = jnp.maximum(jnp.sum(keep), 1)
    return jnp.sum(jnp.where(keep, sq, 0.0)) / cnt


def render_loss(cfg: SuPerConfig, extras: SemanticExtras, rendered):
    """Squared-SSIM appearance loss on the soft render
    (deform_mesh.py:112-123)."""
    m = ssim(rendered, extras.color_image, kernel=11)
    m = jnp.mean(m, axis=0) ** 2                       # (H, W)
    # Valid pixels: every channel positive in an 11x11 window (the
    # reference's maxpool(-min) < 0 trick).
    min_c = jnp.min(rendered, axis=0)
    neg = -min_c
    pad = 5
    win = jax.lax.reduce_window(neg, -jnp.inf, jax.lax.max, (11, 11), (1, 1),
                                [(pad, pad), (pad, pad)])
    valid = win < 0
    keep = valid & (m < 0.1)
    return jnp.sum(jnp.where(keep, m, 0.0))


def corr_loss(cfg: SuPerConfig, extras: SemanticExtras, warped_points,
              trg_points, trg_norms, trg_index_map, sf_mask,
              intr: Intrinsics, loss_type: str = "point-point"):
    """Optical-flow correspondence loss (loss.py:313-366).

    Source surfels project to (u, v); the flow sampled there displaces the
    coordinates into the target frame; the target map is sampled at the
    displaced coordinates.

    Deviations (documented, both fix degeneracies of the reference's
    formulation rather than change its intent):

    1. The target sampling coordinates (u2, v2) are stop-gradiented, so
       each evaluation pulls the warped point toward a FIXED matched
       target.  The reference backprops through the bilinear-interpolation
       weights of the target sample (loss.py:9-70 keeps grads on v,u); on
       locally planar geometry that target-chasing term exactly cancels
       the data pull (d target/d point = I along the surface), leaving the
       loss unable to correct the very lateral drift it exists to fix.

    2. With a per-frame flow (inferred once from the previous frame's
       color, deform_mesh.py:305-307) the match is anchored at the SOURCE
       projection (``extras.src_uv``): the flow field describes where the
       pre-deformation pixel content went, so re-sampling it at the
       current warped projection (the reference's formulation) keeps
       displacing the target as the points move — the fit overshoots the
       true correspondence without bound.  Anchoring at the source gives a
       single fixed match per frame, the loss's published intent.  In
       sf_corr_match_renderimg mode (flow re-inferred from the current
       render each iteration) ``src_uv`` is None and the current warped
       projection is the correct anchor: the flow is relative to the
       render, and vanishes at convergence.
    """
    if extras.flow is None:
        return jnp.asarray(0.0, warped_points.dtype)
    h, w = cfg.height, cfg.width
    if extras.src_uv is not None:
        u = jax.lax.stop_gradient(extras.src_uv[0])
        v = jax.lax.stop_gradient(extras.src_uv[1])
    else:
        v, u, _, _ = project_points(warped_points, intr, h, w)
        v = jax.lax.stop_gradient(v)
        u = jax.lax.stop_gradient(u)
    fl, _ = bilinear_sample_image(extras.flow, v, u)  # (Np, 2)
    u2 = u + fl[:, 0]
    v2 = v + fl[:, 1]
    margin = 1
    valid = sf_mask & (v2 >= margin) & (v2 < h - 1 - margin) & \
        (u2 >= margin) & (u2 < w - 1 - margin)

    if loss_type == "point-plane":
        o, n, svalid, _, _ = bilinear_sample_two(
            trg_points, trg_norms, trg_index_map, v2, u2)
        r = jnp.sum(n * (warped_points.T - o), axis=-1)
        sq = r * r
    else:
        o, svalid, _ = bilinear_sample_indexed(trg_points, trg_index_map,
                                               v2, u2)
        sq = jnp.sum((warped_points.T - o) ** 2, axis=-1)
    return jnp.sum(jnp.where(valid & svalid, sq, 0.0))
