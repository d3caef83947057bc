"""TensorBoard visualization / logging suite (host-side).

Behavioral counterpart of the reference's logging (SURVEY.md sections 2.6 &
5): per-frame scalars (graph stats, surfel counts, solve cost/time),
reprojection-error plot suites (per-point bars, error-over-time,
trajectories -- utils/utils.py:406-513), and the image suites
(raw / disparity colormap / render with tracked keypoints / ED-mesh
overlay / segmentation renders -- super/nodes.py:652-752).

Everything here consumes host numpy copies of the state; it never touches
the jit path.
"""

from __future__ import annotations

import io
import os
from typing import Dict, Optional, Sequence

import numpy as np


class TrackingLogger:
    """TensorBoard sink for the tracking pipeline."""

    def __init__(self, logdir: str):
        from torch.utils.tensorboard import SummaryWriter

        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self.writer = SummaryWriter(log_dir=logdir)

    # -- scalars ----------------------------------------------------------

    def log_step(self, time: int, outs, frame_ms: Optional[float] = None):
        w = self.writer
        w.add_scalar("graph_info/num_surfels", int(outs.num_surfels), time)
        w.add_scalar("graph_info/num_ED_nodes", int(outs.num_nodes), time)
        w.add_scalar("optimization_record/final_cost", float(outs.lm_cost),
                     time)
        w.add_scalar("optimization_record/damping", float(outs.lm_damping),
                     time)
        if frame_ms is not None:
            w.add_scalar("optimization_record/optim_time_per_frame",
                         frame_ms / 1e3, time)
        for name in ("tuple_overflow", "pair_overflow", "proj_overflow", "add_overflow",
                     "free_exhausted", "dup_skipped"):
            if hasattr(outs, name):
                w.add_scalar(f"capacity/{name}", int(getattr(outs, name)),
                             time)

    def log_reproj(self, time: int, err_frames: Dict[int, np.ndarray],
                   edge_ids: Sequence[int] = ()):
        if not err_frames:
            return
        arr = np.stack([err_frames[k] for k in sorted(err_frames)], axis=0)
        valid = arr >= 0
        if valid.any():
            self.writer.add_scalar("reprojerr/mean", arr[valid].mean(), time)
            self.writer.add_scalar("reprojerr/std", arr[valid].std(), time)
        if len(edge_ids) > 0:
            sel = np.zeros(arr.shape[1], dtype=bool)
            sel[np.asarray(edge_ids) - 1] = True
            sub = arr[:, sel]
            sv = sub >= 0
            if sv.any():
                self.writer.add_scalar("reprojerr/edge_pts_mean",
                                       sub[sv].mean(), time)
                self.writer.add_scalar("reprojerr/edge_pts_std",
                                       sub[sv].std(), time)

    # -- plot suites (utils/utils.py:406-513 behavior) --------------------

    def log_trackpts_plots(self, time: int, err_frames: Dict[int, np.ndarray],
                           results: Dict[int, np.ndarray],
                           gt_xy: np.ndarray):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = sorted(err_frames)
        if not keys:
            return
        arr = np.stack([err_frames[k] for k in keys], axis=0)   # (T, P)
        npts = arr.shape[1]

        # Plot 1: per-point mean +/- std.
        fig = plt.figure(figsize=(12, 3))
        valid = arr >= 0
        means = [arr[:, i][valid[:, i]].mean() if valid[:, i].any() else 0
                 for i in range(npts)]
        stds = [arr[:, i][valid[:, i]].std() if valid[:, i].any() else 0
                for i in range(npts)]
        plt.errorbar(np.arange(npts), means, stds, fmt="o", capsize=3)
        plt.xlabel("Tracked point ID")
        plt.ylabel("Error (px)")
        plt.grid(True)
        self._add_fig("plots/reproj_per_point", fig, time)

        # Plot 2: error over time.
        fig = plt.figure(figsize=(10, 3))
        per_t = np.where(valid, arr, np.nan)
        plt.plot(keys, np.nanmean(per_t, axis=1), ".-")
        plt.xlabel("Frame")
        plt.ylabel("Error (px)")
        plt.grid(True)
        self._add_fig("plots/reproj_over_time", fig, time)

        # Plot 3: trajectories (predicted vs GT) for the first points.
        fig = plt.figure(figsize=(8, 8))
        show = min(npts, 8)
        for i in range(show):
            gx = gt_xy[:, i, 0]
            gy = gt_xy[:, i, 1]
            plt.plot(gx, gy, "-", alpha=0.6,
                     label="gt" if i == 0 else None)
            est = np.stack([results[k][i, :2] for k in keys])
            plt.plot(est[:, 0], est[:, 1], "--", alpha=0.6,
                     label="pred" if i == 0 else None)
        plt.legend()
        plt.gca().invert_yaxis()
        plt.grid(True, linestyle="--", alpha=0.4)
        self._add_fig("plots/trajectories", fig, time)

    # -- image suites (super/nodes.py:652-752 behavior) -------------------

    def log_images(self, time: int, color_chw: np.ndarray,
                   depth: Optional[np.ndarray] = None,
                   render_chw: Optional[np.ndarray] = None,
                   keypoints_xy: Optional[np.ndarray] = None,
                   mesh_points_xy: Optional[np.ndarray] = None,
                   mesh_edges: Optional[np.ndarray] = None,
                   seg: Optional[np.ndarray] = None):
        w = self.writer
        w.add_image("visualization/raw", np.clip(color_chw, 0, 1), time)
        if depth is not None:
            disp = 1.0 / np.maximum(depth, 1e-6)
            disp = np.nan_to_num(disp)
            disp = disp / max(disp.max(), 1e-6)
            w.add_image("visualization/disparity",
                        _colormap(disp), time)
        if render_chw is not None:
            img = np.clip(render_chw.copy(), 0, 1)
            if keypoints_xy is not None:
                img = _draw_points(img, keypoints_xy, (1.0, 0.1, 0.1))
            if mesh_points_xy is not None and mesh_edges is not None:
                img = _draw_edges(img, mesh_points_xy, mesh_edges,
                                  (1.0, 1.0, 1.0))
            w.add_image("visualization/render", img, time)
        if seg is not None:
            from super_tpu.utils.labels import seg_to_color

            w.add_image("visualization/seg_pred", seg_to_color(seg), time)

    def log_pointcloud(self, time: int, points: np.ndarray,
                       colors: np.ndarray):
        """3D scatter of the surfel map (plot_pcd, utils/utils.py:327-358)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
        ax.scatter(points[:, 0], points[:, 1], -points[:, 2],
                   c=np.clip(colors, 0, 1), s=1)
        ax.axis("off")
        self._add_fig("visualization/pcd", fig, time)

    def _add_fig(self, tag, fig, time):
        import matplotlib.pyplot as plt

        fig.canvas.draw()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        wpx, hpx = fig.canvas.get_width_height()
        img = buf.reshape(hpx, wpx, 4)[..., :3].transpose(2, 0, 1)
        self.writer.add_image(tag, img, time)
        plt.close(fig)

    def close(self):
        self.writer.close()


def _colormap(x):
    import matplotlib.cm as cm

    return cm.magma(np.clip(x, 0, 1))[..., :3].transpose(2, 0, 1)


def _draw_points(img_chw, xy, color, radius=2):
    _, h, w = img_chw.shape
    for x, y in np.asarray(xy).reshape(-1, 2):
        xi, yi = int(round(x)), int(round(y))
        x0, x1 = max(0, xi - radius), min(w, xi + radius + 1)
        y0, y1 = max(0, yi - radius), min(h, yi + radius + 1)
        for c in range(3):
            img_chw[c, y0:y1, x0:x1] = color[c]
    return img_chw


def _draw_edges(img_chw, pts_xy, edges, color):
    _, h, w = img_chw.shape
    for a, b in np.asarray(edges).reshape(-1, 2):
        x0, y0 = pts_xy[a]
        x1, y1 = pts_xy[b]
        n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
        xs = np.linspace(x0, x1, n).round().astype(int)
        ys = np.linspace(y0, y1, n).round().astype(int)
        ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        for c in range(3):
            img_chw[c, ys[ok], xs[ok]] = color[c]
    return img_chw
