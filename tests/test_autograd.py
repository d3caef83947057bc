"""Autograd (GraphFit) path tests: SGD/Adam fit of the warp field."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config, tiny_scene

from super_tpu.core.optimizer import (
    _warp_all,
    autograd_total,
    graph_fit,
    prepare_autograd,
)
from super_tpu.core.preprocess import preprocess_frame
from super_tpu.core.tracker import init_tracker
from super_tpu.data.synthetic import default_intrinsics, generate
from super_tpu.pipeline import SuPerPipeline


@pytest.fixture(scope="module")
def scene():
    return tiny_scene(num_frames=6)


def _ag_cfg(cfg, optimizer="Adam", lr=5e-4):
    return cfg.replace(solver=dataclasses.replace(
        cfg.solver, use_derived_gradient=False, optimizer=optimizer,
        learning_rate=lr, num_iterations=10))


def test_autograd_loss_decreases(scene):
    """Adam at a scene-appropriate lr must reduce the autograd objective.

    (The reference's default SGD lr=5e-5 is tuned for SuPer-scale residual
    sums; this synthetic scene is ~100x smaller, so the test uses Adam.)"""
    cfg, intr, seq, frames = scene
    cfg = _ag_cfg(cfg, optimizer="Adam", lr=1e-4)
    st = init_tracker(cfg, frames[0])
    ctx = prepare_autograd(cfg, st.surfels, st.graph, frames[2])
    j_cap = st.graph.capacity
    deform0 = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0])[None],
                       (j_cap + 1, 1)).astype(jnp.float32)
    loss0, parts = autograd_total(cfg, ctx, st.graph, deform0, intr)
    assert np.isfinite(float(loss0)) and float(loss0) > 0
    assert set(parts) >= {"point_plane", "arap", "rot"}

    deform, _ = jax.jit(
        lambda s, f: graph_fit(cfg, s.surfels, s.graph, f, intr))(st, frames[2])
    loss_final, _ = autograd_total(cfg, ctx, st.graph, deform, intr)
    assert float(loss_final) < float(loss0), (float(loss_final), float(loss0))
    assert np.isfinite(np.asarray(deform)).all()


def test_autograd_pipeline_tracks(scene):
    """Full pipeline on the autograd path tracks the deforming surface."""
    cfg, intr, seq, frames = scene
    cfg = _ag_cfg(cfg, optimizer="Adam", lr=2e-4)
    seq2 = generate(6, 48, 64, intr=intr, seed=2)
    pipe = SuPerPipeline(cfg, intr)
    m = pipe.run(seq2.depths, seq2.colors, gt_xy=seq2.gt_xy,
                 gt_valid=seq2.gt_valid)
    static_err = np.mean([
        np.linalg.norm(seq2.gt_xy[t] - seq2.gt_xy[0], axis=1).mean()
        for t in range(1, len(seq2.gt_xy))])
    assert m["reproj_mean"] < static_err, (m, static_err)


class _ConstFlow:
    """Oracle flow-model stub: every pixel flows by (du, dv)."""

    def __init__(self, du, dv=0.0):
        self.du, self.dv = du, dv

    def apply(self, params, im1, im2):
        n, h, w, _ = im1.shape
        return jnp.broadcast_to(
            jnp.array([self.du, self.dv], jnp.float32), (n, h, w, 2))


def _lateral_scene(du_pix=2.0, h=48, w=64):
    """Flat plane whose texture shifts laterally: geometry-only ICP cannot
    observe the motion (aperture problem); flow correspondence can.

    ``c1[:, u] = base[:, u + du]``: the content at frame-0 pixel u appears
    at frame-1 pixel ``u - du``, so the f0->f1 optical flow is ``-du`` and
    the tracked scene points move ``-du / fx`` in world x (at z=1)."""
    cfg = tiny_config(h=h, w=w)
    intr = default_intrinsics(h, w)
    rng = np.random.RandomState(7)
    base = rng.rand(h, w + 8, 3).astype(np.float32)
    depth = np.full((h, w), 1.0, np.float32)
    c0 = base[:, :w]
    c1 = base[:, int(du_pix):w + int(du_pix)]
    return cfg, intr, depth, c0, c1


def test_sf_corr_recovers_lateral_motion():
    """End-to-end sf_corr plumbing (VERDICT item 5): with an oracle flow the
    autograd fit recovers lateral motion that is invisible to the
    geometry-only objective, and the trajectory changes when sf_corr is on.
    """
    du = 2.0
    cfg, intr, depth, c0, c1 = _lateral_scene(du_pix=du)
    # SGD, not Adam: at the (noise-level) geometry-only optimum Adam
    # normalizes the ~1e-4 float-noise gradient into full-lr drift; SGD
    # steps proportionally to the gradient so the null direction stays put.
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver, use_derived_gradient=False, optimizer="SGD",
        learning_rate=2e-4, num_iterations=40))
    cfg = cfg.replace(losses=dataclasses.replace(
        cfg.losses, sf_corr=True, sf_corr_weight=1.0,
        sf_corr_loss_type="point-point"))

    f0 = preprocess_frame(cfg, intr, jnp.asarray(depth),
                          jnp.asarray(c0.transpose(2, 0, 1)), 0.0)
    f1 = preprocess_frame(cfg, intr, jnp.asarray(depth),
                          jnp.asarray(c1.transpose(2, 0, 1)), 1.0)
    st = init_tracker(cfg, f0)

    from super_tpu.factory import Models

    models = Models(None, None, None, None, _ConstFlow(-du), None)

    def fit(use_models):
        m = models if use_models else None
        deform, _ = jax.jit(lambda s, f: graph_fit(
            cfg, s.surfels, s.graph, f, intr, models=m,
            prev_color=f0.color_image))(st, f1)
        ctx = prepare_autograd(cfg, st.surfels, st.graph, f1)
        warped = _warp_all(cfg, ctx.base, deform)
        mask = np.asarray(ctx.base.sf_mask)
        # ctx.base.sf_points is in the ctx's (tuple-permuted) surfel
        # order, same as warped.
        dx = np.asarray(warped[0] - ctx.base.sf_points[0])[mask]
        return np.asarray(deform), float(np.mean(dx))

    deform_corr, dx_corr = fit(True)
    deform_icp, dx_icp = fit(False)

    # World-space lateral displacement of a -du-pixel shift at z=1.
    dx_gt = -du / float(intr.fx)
    assert abs(dx_icp) < 0.25 * abs(dx_gt), (dx_icp, dx_gt)  # unobservable
    assert abs(dx_corr - dx_gt) < 0.5 * abs(dx_gt), (dx_corr, dx_gt)
    assert not np.allclose(deform_corr, deform_icp)      # trajectory changed


def test_sf_corr_match_renderimg_runs():
    """sf_corr_match_renderimg re-infers flow from the soft render each
    iteration; the fit must run and the corr part must be live."""
    du = 2.0
    cfg, intr, depth, c0, c1 = _lateral_scene(du_pix=du)
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver, use_derived_gradient=False, optimizer="Adam",
        learning_rate=2e-3, num_iterations=5))
    cfg = cfg.replace(losses=dataclasses.replace(
        cfg.losses, sf_corr=True, sf_corr_weight=1.0,
        sf_corr_match_renderimg=True, sf_corr_loss_type="point-point"))
    f0 = preprocess_frame(cfg, intr, jnp.asarray(depth),
                          jnp.asarray(c0.transpose(2, 0, 1)), 0.0)
    f1 = preprocess_frame(cfg, intr, jnp.asarray(depth),
                          jnp.asarray(c1.transpose(2, 0, 1)), 1.0)
    st = init_tracker(cfg, f0)

    from super_tpu.factory import Models

    models = Models(None, None, None, None, _ConstFlow(-du), None)
    deform, loss = jax.jit(lambda s, f: graph_fit(
        cfg, s.surfels, s.graph, f, intr, models=models))(st, f1)
    assert np.isfinite(np.asarray(deform)).all()
    assert np.isfinite(float(loss))
