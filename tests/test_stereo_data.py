"""Stereo-training dataset index + batcher (data/stereo.py).

Builds miniature on-disk dataset trees in tmp_path and checks index
construction, PFM round-trip, and fixed-shape batch emission -- the
counterpart of the reference's stereo_datasets.py readers."""

import numpy as np
import pytest

from super_tpu.data.stereo import (
    StereoIndex,
    build_index,
    fetch_training_index,
    iter_batches,
    read_disparity,
    read_pfm,
)


def _write_pfm(path, arr):
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        f.write(arr[::-1].astype("<f4").tobytes())


def _write_png(path, arr_u8):
    from PIL import Image

    Image.fromarray(arr_u8).save(path)


@pytest.fixture()
def sceneflow_root(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "FlyingThings3D" / "frames_cleanpass"
    for scene in ("A/0001", "A/0002"):
        for side in ("left", "right"):
            d = root / scene / side
            d.mkdir(parents=True)
            for t in range(2):
                img = rng.integers(0, 255, (40, 64, 3), dtype=np.uint8)
                _write_png(d / f"{t:04d}.png", img)
        dd = tmp_path / "FlyingThings3D" / "disparity" / scene / "left"
        dd.mkdir(parents=True)
        for t in range(2):
            disp = rng.uniform(1.0, 30.0, (40, 64)).astype(np.float32)
            _write_pfm(dd / f"{t:04d}.pfm", disp)
    return str(root)


def test_pfm_roundtrip(tmp_path):
    arr = np.arange(12, dtype=np.float32).reshape(3, 4) * 0.5
    _write_pfm(tmp_path / "x.pfm", arr)
    got = read_pfm(str(tmp_path / "x.pfm"))
    np.testing.assert_array_equal(got, arr)
    d, valid = read_disparity(str(tmp_path / "x.pfm"))
    assert valid.all()
    np.testing.assert_array_equal(d, arr)


def test_build_index_sceneflow(sceneflow_root):
    idx = build_index("sceneflow", sceneflow_root)
    assert len(idx) == 4
    assert all("/left/" in p for p in idx.left)
    assert all("/right/" in p for p in idx.right)
    assert all(p.endswith(".pfm") for p in idx.disp)
    assert not idx.sparse


def test_fetch_training_index_mixes_and_repeats(sceneflow_root):
    idx = fetch_training_index([("sceneflow", sceneflow_root, 3)])
    assert len(idx) == 12
    with pytest.raises(ValueError):
        fetch_training_index([("kitti", "/nonexistent", 1)])


def test_iter_batches_fixed_shapes(sceneflow_root):
    idx = build_index("sceneflow", sceneflow_root)
    batches = list(iter_batches(idx, batch_size=2, crop=(48, 48),
                                rng=np.random.default_rng(1), steps=3))
    assert len(batches) == 3
    for b in batches:
        assert b.img1.shape == (2, 3, 48, 48)
        assert b.img2.shape == (2, 3, 48, 48)
        assert b.flow.shape == (2, 1, 48, 48)
        assert b.valid.shape == (2, 48, 48)
        # Reference convention: flow = -disparity, so flow <= 0 where valid.
        assert (b.flow[b.valid[:, None] > 0] <= 0).all()
        assert b.img1.dtype == np.float32
        # Crop 48 > image height 40: bottom rows are zero-padded + invalid.
        assert (b.valid[:, -1, :] == 0).all()


def test_disp_png16(tmp_path):
    from PIL import Image

    raw = np.zeros((8, 8), np.uint16)
    raw[2, 3] = 512   # disparity 2.0
    Image.fromarray(raw).save(tmp_path / "d.png")
    d, valid = read_disparity(str(tmp_path / "d.png"))
    assert d[2, 3] == pytest.approx(2.0)
    assert valid.sum() == 1


def test_index_add():
    a = StereoIndex(["l1"], ["r1"], ["d1"], sparse=False)
    b = StereoIndex(["l2"], ["r2"], ["d2"], sparse=True)
    c = a + b
    assert len(c) == 2 and c.sparse
