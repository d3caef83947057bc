"""SuPer / Semantic-SuPer trial data loading (host-side numpy).

Mirrors SuPerDataset (utils/data_loader.py:174-271): per-frame left RGB,
precomputed disparity (.npy/.png -> disp_to_depth), optional precomputed
segmentation (.npy confidences or .png labels), and the tracking-GT bundle
(utils/utils.py:360-392: dict with 'gt' / 'super_cpp' / 'SURF' trajectories,
keys '000010', ...).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np

from super_tpu.config import SuPerConfig
from super_tpu.core.preprocess import disp_to_depth
from super_tpu.geometry.camera import Intrinsics


class LoadedSequence(NamedTuple):
    depths: np.ndarray
    colors: np.ndarray
    gt_xy: Optional[np.ndarray]
    gt_valid: Optional[np.ndarray]
    segs: Optional[np.ndarray]
    seg_confs: Optional[np.ndarray]
    frame_ids: np.ndarray


def load_gt(data_dir: str, gt_file: str):
    """Load the tracking GT bundle; returns ({frame_id: (P,3)}, full dict)."""
    path = os.path.join(os.path.expanduser(data_dir), gt_file)
    bundle = np.array(np.load(path, allow_pickle=True)).tolist()
    gt = {int(k): np.asarray(v) for k, v in bundle["gt"].items()}
    return gt, bundle


def _load_image(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def _load_disp(path, ext):
    if ext == ".png":
        from PIL import Image

        return np.asarray(Image.open(path), dtype=np.float32)
    return np.load(path).astype(np.float32)


def load_sequence(cfg: SuPerConfig, args) -> tuple:
    """Load frames [start_id, end_id) of a SuPer-layout directory.

    Uses the native C++ prefetching loader (super_tpu/runtime) for the
    depth+RGB pairs when available; falls back to PIL/numpy."""
    data_dir = os.path.expanduser(args.data_dir)
    pairs = []
    for fid in range(args.start_id, args.end_id):
        name = f"{fid:06d}"
        rgb_path = os.path.join(data_dir, args.rgb_dir,
                                f"{name}-left{args.img_ext}")
        dep_path = os.path.join(data_dir, args.depth_dir,
                                f"{name}{args.depth_ext}")
        if os.path.exists(rgb_path) and os.path.exists(dep_path):
            pairs.append((fid, dep_path, rgb_path))

    depths, colors, segs, seg_confs, ids = [], [], [], [], []
    native = None
    if pairs and args.depth_ext == ".npy" and args.img_ext == ".png" \
            and not cfg.load_seg:
        try:
            from super_tpu.runtime import NativeSequenceLoader, native_available
            if native_available():
                native = NativeSequenceLoader(
                    [p[1] for p in pairs], [p[2] for p in pairs],
                    cfg.height, cfg.width, min_depth=cfg.min_depth,
                    max_depth=cfg.max_depth)
        except Exception:
            native = None
    if native is not None:
        with native as ld:
            for i, depth, rgb in ld:
                depths.append(depth)
                colors.append(rgb.transpose(1, 2, 0))
                ids.append(pairs[i][0])
        return _finish(cfg, args, data_dir, depths, colors, segs, seg_confs,
                       ids)

    for fid, dep_path, rgb_path in pairs:
        name = f"{fid:06d}"
        colors.append(_load_image(rgb_path))
        disp = _load_disp(dep_path, args.depth_ext)
        _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        depths.append(np.asarray(depth).squeeze())
        ids.append(fid)
        if cfg.load_seg:
            base = os.path.join(data_dir, args.seg_dir, f"{name}-left")
            if os.path.exists(base + ".npy"):
                # Per-class confidences; label = argmax
                # (get_seg, data_loader.py:228-236).
                conf = np.load(base + ".npy").astype(np.float32)  # (C, H, W)
                seg_confs.append(conf)
                segs.append(conf.argmax(0).astype(np.int32))
            elif os.path.exists(base + ".png"):
                # Integer label image; confidences = one-hot
                # (get_seg, data_loader.py:238-244).
                from PIL import Image

                lab = np.asarray(Image.open(base + ".png"))
                if lab.ndim == 3:
                    lab = lab[..., 0]
                lab = lab.astype(np.int32)
                conf = np.zeros((cfg.num_classes,) + lab.shape, np.float32)
                np.put_along_axis(conf, lab[None], 1.0, axis=0)
                seg_confs.append(conf)
                segs.append(lab)
    return _finish(cfg, args, data_dir, depths, colors, segs, seg_confs, ids)


def _finish(cfg, args, data_dir, depths, colors, segs, seg_confs, ids):
    if not depths:
        raise FileNotFoundError(f"no frames found under {data_dir}")

    gt_xy = gt_valid = None
    if args.tracking_gt_file:
        gt, _ = load_gt(data_dir, args.tracking_gt_file)
        num_track = next(iter(gt.values())).shape[0]
        gt_xy = np.zeros((len(ids), num_track, 2), dtype=np.float32)
        gt_valid = np.zeros((len(ids), num_track), dtype=bool)
        for i, fid in enumerate(ids):
            if fid in gt:
                gt_xy[i] = gt[fid][:, 0:2]
                gt_valid[i] = gt[fid][:, 2] == 1

    intr = Intrinsics.superv1() if cfg.data == "superv1" else Intrinsics.superv2()
    return intr, LoadedSequence(
        depths=np.stack(depths),
        colors=np.stack(colors),
        gt_xy=gt_xy,
        gt_valid=gt_valid,
        segs=np.stack(segs) if segs else None,
        seg_confs=np.stack(seg_confs) if seg_confs else None,
        frame_ids=np.asarray(ids),
    )
