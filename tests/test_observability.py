"""Viz/TensorBoard logging + checkpoint/resume + renderer tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config, tiny_scene

from super_tpu.core.tracker import init_tracker
from super_tpu.pipeline import SuPerPipeline
from super_tpu.render.splat import render_soft, render_zbuffer
from super_tpu.utils.checkpoint import latest_checkpoint, restore_state, save_state
from super_tpu.data.synthetic import default_intrinsics, generate


@pytest.fixture(scope="module")
def scene():
    return tiny_scene(num_frames=3)


def test_zbuffer_render_occlusion(scene):
    cfg, intr, seq, frames = scene
    # Two points on the same pixel: nearer one must win.
    pts = jnp.array([[0.0, 0.0], [0.0, 0.0], [0.5, 0.4]])  # (3, 2) fm
    cols = jnp.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    mask = jnp.array([True, True])
    img = render_zbuffer(pts, cols, mask, intr, 48, 64)
    assert img.shape == (3, 48, 64)
    v, u = int(intr.cy + 0.21 // 1), int(intr.cx)  # same projected pixel
    # The nearer (z=0.4) point is green.
    px = np.asarray(img[:, round(float(intr.cy)), round(float(intr.cx))])
    assert px[1] > px[0]


def test_soft_render_differentiable(scene):
    cfg, intr, seq, frames = scene
    st = init_tracker(cfg, frames[0])
    sf = st.surfels

    def brightness(points):
        img = render_soft(points, sf.colors, sf.active, intr, 48, 64)
        return jnp.sum(img)

    g = jax.grad(brightness)(sf.points)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_checkpoint_roundtrip(tmp_path, scene):
    cfg, intr, seq, frames = scene
    st = init_tracker(cfg, frames[0])
    path = save_state(str(tmp_path / "ckpt"), st, step=3)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path
    restored = restore_state(path, st)
    np.testing.assert_array_equal(np.asarray(st.surfels.points),
                                  np.asarray(restored.surfels.points))
    np.testing.assert_array_equal(np.asarray(st.track.track_id),
                                  np.asarray(restored.track.track_id))


def test_pipeline_logging_writes_events(tmp_path):
    cfg = tiny_config()
    intr = default_intrinsics(48, 64)
    seq = generate(3, 48, 64, intr=intr, seed=1)
    cfg = cfg.replace(save_sample_freq=1)
    pipe = SuPerPipeline(cfg, intr, logdir=str(tmp_path / "tb"),
                         checkpoint_dir=str(tmp_path / "ck"))
    pipe.run(seq.depths, seq.colors, gt_xy=seq.gt_xy, gt_valid=seq.gt_valid)
    pipe.logger.close()
    events = [f for f in os.listdir(tmp_path / "tb")
              if "tfevents" in f]
    assert events, "no TensorBoard event files written"
    assert latest_checkpoint(str(tmp_path / "ck")) is not None
