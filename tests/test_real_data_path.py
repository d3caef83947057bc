"""End-to-end smoke of the real-data (SuPer-V1 layout) path.

No trial data ships in this environment, so these tests synthesize a tiny
V1-layout directory -- rgb/%06d-left.png + depth/%06d.npy sigmoid
disparities + a GT bundle with 'gt' and 'super_cpp' trajectories
(utils/utils.py:360-392 format) -- and drive run_super.main() over it,
proving the loader, GT evaluation, and the C++-SuPer baseline co-report
(super/nodes.py:754-802) all execute before real data ever shows up.
"""

import json
import os

import numpy as np
import pytest

H, W = 64, 80
START, END = 4, 8  # frame ids 000004..000007


def _write_v1_dir(root, with_png_seg=False):
    from PIL import Image

    from super_tpu.data.synthetic import default_intrinsics, generate

    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "depth"))
    if with_png_seg:
        os.makedirs(os.path.join(root, "seg"))

    intr = default_intrinsics(H, W)
    seq = generate(END, H, W, intr=intr)

    min_disp, max_disp = 1.0 / 80.0, 1.0 / 0.1
    gt, cpp = {}, {}
    for fid in range(START, END):
        name = f"{fid:06d}"
        rgb = (np.clip(seq.colors[fid], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(root, "rgb", f"{name}-left.png"))
        # Invert disp_to_depth (core/preprocess.py:37-42): store the raw
        # sigmoid disparity the reference's depth/ dir holds.
        scaled_disp = 1.0 / np.maximum(seq.depths[fid], 1e-6)
        disp = (scaled_disp - min_disp) / (max_disp - min_disp)
        np.save(os.path.join(root, "depth", f"{name}.npy"),
                disp.astype(np.float32))
        if with_png_seg:
            lab = (np.arange(H)[:, None] * 2 > H).astype(np.uint8) + \
                np.zeros((H, W), np.uint8)
            Image.fromarray(lab, mode="L").save(
                os.path.join(root, "seg", f"{name}-left.png"))
        # (P, 3) rows: x, y, valid -- reference GT bundle layout.
        p3 = np.concatenate(
            [seq.gt_xy[fid], seq.gt_valid[fid][:, None].astype(np.float32)],
            axis=1)
        gt[name] = p3
        est = p3.copy()
        est[:, 0:2] += 1.5  # a deliberately-off baseline trajectory
        cpp[name] = est

    bundle = {"gt": gt, "super_cpp": cpp}
    np.save(os.path.join(root, "left_pts.npy"),
            np.array(bundle, dtype=object))
    return seq


def test_run_super_on_v1_layout_dir(tmp_path):
    """run_super.main() over a synthesized V1-layout dir must produce GT
    metrics AND the super_cpp baseline co-report."""
    # Import by explicit path: the torch-parity tests put /root/reference
    # on sys.path, whose own run_super.py would shadow ours in a full
    # suite run.
    import importlib.util

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_repo_run_super", os.path.join(repo_root, "run_super.py"))
    run_super = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_super)

    _write_v1_dir(str(tmp_path))
    out = str(tmp_path / "metrics.json")
    rc = run_super.main([
        "--data_dir", str(tmp_path), "--cpu",
        "--height", str(H), "--width", str(W), "--mesh_step_size", "10",
        "--start_id", str(START), "--end_id", str(END),
        "--num_optimize_iterations", "4",
        "--tracking_gt_file", "left_pts.npy",
        "--output_json", out,
    ])
    assert rc == 0
    metrics = json.load(open(out))
    assert np.isfinite(metrics["reproj_mean"])
    # The baseline trajectory is offset 1.5 px in x and y.
    assert metrics["super_cpp_mean"] == pytest.approx(np.hypot(1.5, 1.5),
                                                      rel=1e-5)
    assert metrics["num_eval_frames"] == END - START


def test_load_sequence_png_seg_labels(tmp_path):
    """.png seg-label branch: one-hot confidences + int labels
    (get_seg, utils/data_loader.py:238-244)."""
    from types import SimpleNamespace

    from super_tpu.config import SuPerConfig
    from super_tpu.data.superv1 import load_sequence

    _write_v1_dir(str(tmp_path), with_png_seg=True)
    cfg = SuPerConfig(height=H, width=W, load_seg=True, num_classes=2)
    args = SimpleNamespace(
        data_dir=str(tmp_path), rgb_dir="rgb", depth_dir="depth",
        seg_dir="seg", start_id=START, end_id=END, depth_ext=".npy",
        img_ext=".png", tracking_gt_file=None)
    _, loaded = load_sequence(cfg, args)
    assert loaded.segs.shape == (END - START, H, W)
    assert loaded.seg_confs.shape == (END - START, 2, H, W)
    np.testing.assert_array_equal(loaded.seg_confs.argmax(1), loaded.segs)
    np.testing.assert_allclose(loaded.seg_confs.sum(1), 1.0)  # one-hot
    assert set(np.unique(loaded.segs)) == {0, 1}


def test_depth_filter_kernel_wiring():
    """depth_filter_kernel_size must actually smooth the predicted
    disparity (blur_image application, utils/data_loader.py:292-298)."""
    import jax

    from super_tpu.config import SuPerConfig
    from super_tpu.factory import Models, predict_frame_inputs

    from super_tpu.models.monodepth2 import Monodepth2

    cfg = SuPerConfig(height=64, width=64,
                      depth_model="monodepth2_stereo",
                      depth_filter_kernel_size=9)
    model = Monodepth2(num_layers=18)
    key = jax.random.PRNGKey(0)
    params = model.init(key, np.zeros((1, 64, 64, 3), np.float32))
    models = Models(model, params, None, None, None, None)
    color = np.asarray(
        jax.random.uniform(key, (3, 64, 64)), np.float32)

    depth_f = np.asarray(predict_frame_inputs(cfg, models, color)["depth"])
    cfg0 = cfg.replace(depth_filter_kernel_size=-1)
    depth_0 = np.asarray(predict_frame_inputs(cfg0, models, color)["depth"])

    assert depth_f.shape == depth_0.shape == (64, 64)
    assert not np.allclose(depth_f, depth_0)
    # Blur reduces high-frequency energy in the disparity (1/depth).
    def hf(d):
        disp = 1.0 / d
        return float(np.abs(np.diff(disp, axis=-1)).mean())
    assert hf(depth_f) < hf(depth_0)
