"""Native C++ frame-loader tests: build, decode round-trips, prefetch order."""

import os

import numpy as np
import pytest

from super_tpu.runtime import NativeSequenceLoader, native_available


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    h, w, n = 24, 32, 5
    disps, rgbs = [], []
    for i in range(n):
        disp = rng.uniform(0.1, 0.9, size=(h, w)).astype(np.float32)
        np.save(d / f"{i:06d}.npy", disp)
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(d / f"{i:06d}-left.png")
        disps.append(disp)
        rgbs.append(rgb)
    return d, h, w, n, disps, rgbs


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_loader_roundtrip(seq_dir):
    d, h, w, n, disps, rgbs = seq_dir
    depth_paths = [str(d / f"{i:06d}.npy") for i in range(n)]
    rgb_paths = [str(d / f"{i:06d}-left.png") for i in range(n)]
    got = []
    with NativeSequenceLoader(depth_paths, rgb_paths, h, w,
                              min_depth=0.1, max_depth=80.0) as ld:
        for idx, depth, rgb in ld:
            got.append(idx)
            # disp -> depth transform parity (monodepth2 layers.py:16-25).
            min_d, max_d = 1 / 80.0, 1 / 0.1
            expect = 1.0 / (min_d + (max_d - min_d) * disps[idx])
            np.testing.assert_allclose(depth, expect, rtol=1e-5)
            np.testing.assert_allclose(
                rgb, rgbs[idx].transpose(2, 0, 1) / 255.0, atol=1e-6)
    assert got == list(range(n))  # strictly in order


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_loader_handles_missing_file(seq_dir):
    d, h, w, n, disps, rgbs = seq_dir
    depth_paths = [str(d / f"{i:06d}.npy") for i in range(2)]
    rgb_paths = [str(d / "nope.png"), str(d / "000001-left.png")]
    with NativeSequenceLoader(depth_paths, rgb_paths, h, w) as ld:
        idxs = [i for i, _, _ in ld]
    assert idxs == [1]  # frame 0 skipped (decode failure), order preserved
