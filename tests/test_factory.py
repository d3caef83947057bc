"""Model factory + model-in-the-loop pipeline test."""

import numpy as np
import pytest

from helpers import tiny_config

from super_tpu.data.synthetic import default_intrinsics, generate
from super_tpu.factory import Models, build_models, predict_frame_inputs
from super_tpu.pipeline import SuPerPipeline


def test_factory_builds_monodepth(tmp_path):
    cfg = tiny_config().replace(depth_model="monodepth2_stereo",
                                load_depth=False)
    models = build_models(cfg)
    assert models.depth_model is not None
    out = predict_frame_inputs(cfg, models,
                               np.zeros((3, 48, 64), np.float32) + 0.5)
    assert out["depth"].shape == (48, 64)


def test_factory_builds_seg():
    cfg = tiny_config().replace(seg_model="deeplabv3plus", num_classes=2)
    models = build_models(cfg)
    out = predict_frame_inputs(cfg, models,
                               np.zeros((3, 48, 64), np.float32) + 0.5)
    assert out["seg"].shape == (48, 64)
    assert out["seg_conf"].shape == (2, 48, 64)


def test_pipeline_with_model_depth():
    """Depth inferred by the (untrained) net still drives the full tracking
    machinery end to end (the reference's no---load_depth path)."""
    cfg = tiny_config().replace(depth_model="monodepth2_stereo",
                                load_depth=False)
    intr = default_intrinsics(48, 64)
    seq = generate(3, 48, 64, intr=intr, seed=0)
    models = build_models(cfg)
    pipe = SuPerPipeline(cfg, intr)
    m = pipe.run(None, seq.colors, models=models)
    assert m["num_surfels"] > 100
    assert np.isfinite(
        np.asarray(pipe.state.surfels.points)[:, np.asarray(
            pipe.state.surfels.active)]).all()
