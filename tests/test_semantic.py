"""Semantic-SuPer end-to-end: soft-seg ICP + face + bn_morph + render losses."""

import dataclasses

import numpy as np
import pytest

from helpers import tiny_config

from super_tpu.config import CapacityConfig, LossConfig, SolverConfig
from super_tpu.data.synthetic import default_intrinsics, generate
from super_tpu.pipeline import SuPerPipeline


@pytest.fixture(scope="module")
def semantic_result():
    h, w = 48, 64
    base = tiny_config(h=h, w=w, step=8)
    cfg = base.replace(
        method="semantic-super",
        data="superv2",
        num_classes=2,
        load_seg=True,
        losses=LossConfig(
            sf_point_plane=False,
            sf_soft_seg_point_plane=True,
            mesh_arap=False,
            mesh_rot=True,
            mesh_face=True,
            sf_bn_morph=True,
            render_loss=True,
        ),
        solver=dataclasses.replace(
            base.solver, use_derived_gradient=False, optimizer="Adam",
            learning_rate=2e-4, num_iterations=10),
    )
    intr = default_intrinsics(h, w)
    seq = generate(6, h, w, intr=intr, seed=3, num_classes=2)
    pipe = SuPerPipeline(cfg, intr)
    metrics = pipe.run(seq.depths, seq.colors, gt_xy=seq.gt_xy,
                       gt_valid=seq.gt_valid, segs=seq.segs,
                       seg_confs=seq.seg_confs)
    return cfg, pipe, seq, metrics


def test_semantic_pipeline_runs(semantic_result):
    cfg, pipe, seq, metrics = semantic_result
    st = pipe.state
    pts = np.asarray(st.surfels.points).T[np.asarray(st.surfels.active)]
    assert np.isfinite(pts).all()
    # Surfel semantic labels populated and plausible.
    seg = np.asarray(st.surfels.seg)[np.asarray(st.surfels.active)]
    assert set(np.unique(seg)).issubset({0, 1})
    conf = np.asarray(st.surfels.seg_conf).T[np.asarray(st.surfels.active)]
    np.testing.assert_allclose(conf.sum(-1), 1.0, atol=1e-3)


def test_semantic_pipeline_tracks(semantic_result):
    cfg, pipe, seq, metrics = semantic_result
    static_err = np.mean([
        np.linalg.norm(seq.gt_xy[t] - seq.gt_xy[0], axis=1).mean()
        for t in range(1, len(seq.gt_xy))])
    assert metrics["reproj_mean"] < static_err, (metrics, static_err)


def test_semantic_graph_carries_classes(semantic_result):
    cfg, pipe, seq, metrics = semantic_result
    g = pipe.state.graph
    act = np.asarray(g.active)
    assert set(np.unique(np.asarray(g.seg)[act])).issubset({0, 1})
