"""Autograd (GraphFit) path tests: SGD/Adam fit of the warp field."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config, tiny_scene

from super_tpu.core.optimizer import autograd_total, graph_fit, prepare_autograd
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
