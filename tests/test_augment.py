"""Augmentation + profiling harness tests."""

import numpy as np

from super_tpu.data.augment import (AugmentConfig, augment_stereo_frame,
                                    color_jitter)


def test_color_jitter_bounds(rng):
    img = rng.uniform(size=(16, 24, 3)).astype(np.float32)
    out = color_jitter(rng, img)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, img)


def test_augment_stereo_identical_jitter(rng):
    cfg = AugmentConfig(p_color=1.0, p_hflip=0.0, p_vflip=0.0,
                        p_side_swap=0.0)
    img = rng.uniform(size=(16, 24, 3)).astype(np.float32)
    l, r, d = augment_stereo_frame(rng, img.copy(), img.copy(),
                                   np.ones((16, 24), np.float32), cfg)
    np.testing.assert_allclose(l, r, atol=1e-6)  # same jitter both views


def test_augment_flips_depth(rng):
    cfg = AugmentConfig(p_color=0.0, p_hflip=1.0, p_vflip=0.0,
                        p_side_swap=0.0)
    depth = np.arange(12, dtype=np.float32).reshape(3, 4)
    img = np.zeros((3, 4, 3), np.float32)
    _, _, d = augment_stereo_frame(rng, img, None, depth, cfg)
    np.testing.assert_array_equal(d, depth[:, ::-1])
