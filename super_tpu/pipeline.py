"""Host-side frame loop: the equivalent of run_super.py's main loop
(reference run_super.py:13-24) around the jitted per-frame step.

The sequence has a serial dependency (frame t feeds t+1), so the loop lives
on the host; everything per-frame is one compiled XLA program.  Multi-stream
batching lives in super_tpu.parallel.
"""

from __future__ import annotations

import functools
import time as _time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from super_tpu.config import SuPerConfig
from super_tpu.core.preprocess import preprocess_frame
from super_tpu.core.state import TrackerState
from super_tpu.core.track_points import assign_track_points, record_track_coords
from super_tpu.core.tracker import init_tracker, track_step
from super_tpu.geometry.camera import Intrinsics
from super_tpu.utils import evaluation


class SuPerPipeline:
    """Single-stream tracking pipeline."""

    def __init__(self, cfg: SuPerConfig, intr: Intrinsics,
                 logdir: Optional[str] = None,
                 checkpoint_dir: Optional[str] = None):
        self.cfg = cfg
        self.intr = intr
        self._preprocess = jax.jit(
            functools.partial(preprocess_frame, cfg, intr))
        self._init = jax.jit(functools.partial(init_tracker, cfg))
        self._step = jax.jit(functools.partial(track_step, cfg, intr))
        self._assign = jax.jit(functools.partial(assign_track_points, cfg))
        self._record = jax.jit(record_track_coords)
        self.state: Optional[TrackerState] = None
        self._step_flow = None       # sf_corr variant (jitted lazily)
        self._prev_color = None      # (3, H, W) previous frame, src of flow
        self.track_results: Dict[int, np.ndarray] = {}
        self.errors: Dict[int, np.ndarray] = {}
        self.frame_times = []
        self.overflow_totals: Dict[str, int] = {}
        self.logger = None
        if logdir is not None:
            from super_tpu.utils.viz import TrackingLogger

            self.logger = TrackingLogger(logdir)
        self.checkpoint_dir = checkpoint_dir
        from super_tpu.render.splat import render_zbuffer

        self._render = jax.jit(functools.partial(
            render_zbuffer, intr=intr, height=cfg.height, width=cfg.width))

    def run(self, depths, colors, gt_xy=None, gt_valid=None,
            segs=None, seg_confs=None, right_colors=None, models=None,
            verbose: bool = False):
        """Track a whole sequence.

        Args:
          depths: (T, H, W) numpy, or None to infer depth with ``models``
            (the reference's pred_depth path, super/super.py:36-38).
          colors: (T, H, W, 3) or (T, 3, H, W) numpy arrays.
          gt_xy: optional (T, P, 2) GT screen coords; gt_valid: (T, P) bool.
          right_colors: right stereo images (for raft_stereo depth).
          models: super_tpu.factory.Models for in-the-loop perception.
        Returns: summary metrics dict.
        """
        num_frames = len(colors)
        for t in range(num_frames):
            tic = _time.perf_counter()
            kw = {}
            if segs is not None:
                kw["seg"] = jnp.asarray(segs[t])
            if seg_confs is not None:
                kw["seg_conf"] = jnp.asarray(seg_confs[t])
            color = np.asarray(colors[t])
            if color.shape[-1] == 3:  # HWC -> CHW
                color = color.transpose(2, 0, 1)
            color = jnp.asarray(color)
            if depths is not None:
                depth_t = jnp.asarray(depths[t])
            else:
                from super_tpu.factory import predict_frame_inputs

                right = None
                if right_colors is not None:
                    right = np.asarray(right_colors[t])
                    if right.shape[-1] == 3:
                        right = right.transpose(2, 0, 1)
                    right = jnp.asarray(right)
                pred = predict_frame_inputs(self.cfg, models, color,
                                            right_color_chw=right)
                depth_t = pred["depth"]
                if "seg" in pred and "seg" not in kw:
                    kw["seg"] = pred["seg"]
                    kw["seg_conf"] = pred["seg_conf"]
            frame = self._preprocess(depth_t, color, jnp.float32(t), **kw)
            # sf_corr optical-flow plumbing: flow from the previous frame's
            # color to this frame feeds the corr loss (deform_mesh.py:294-311,
            # via optimizer.graph_fit).
            sf_corr_flow = (models is not None and self.cfg.losses.sf_corr
                            and models.flow_model is not None)
            if sf_corr_flow and self._step_flow is None:
                step = functools.partial(track_step, self.cfg, self.intr,
                                         models=models)
                self._step_flow = jax.jit(
                    lambda st, fr, prev: step(st, fr, prev_color=prev))
            outs = None
            if self.state is None:
                self.state = self._init(frame)
            elif sf_corr_flow:
                self.state, outs = self._step_flow(self.state, frame,
                                                   self._prev_color)
            else:
                self.state, outs = self._step(self.state, frame)
            self._prev_color = frame.color_image

            if gt_xy is not None:
                self._eval_frame(t, frame, gt_xy[t], gt_valid[t])
            jax.block_until_ready(self.state.surfels.points)
            self.frame_times.append(_time.perf_counter() - tic)
            if outs is not None:
                names = ("tuple_overflow", "pair_overflow", "proj_overflow", "add_overflow",
                         "free_exhausted", "dup_skipped")
                # One host fetch for all counters (the run loop already
                # syncs per frame for timing).
                vals = jax.device_get([getattr(outs, n) for n in names])
                for name, c in zip(names, vals):
                    if int(c) > 0:
                        self.overflow_totals[name] = \
                            self.overflow_totals.get(name, 0) + int(c)
                        if verbose:
                            print(f"frame {t}: capacity overflow "
                                  f"{name}={int(c)} (accuracy degraded; "
                                  f"see StepOutputs docs)")
            if verbose and t % 10 == 0:
                n = int(self.state.surfels.num_active)
                print(f"frame {t}: {n} surfels, "
                      f"{self.frame_times[-1]*1e3:.1f} ms")
            if t % self.cfg.save_sample_freq == 0:
                self._observe(t, frame, depth_t, outs, gt_xy)
        if self.logger is not None and self.errors:
            last_t = max(self.errors)
            self.logger.log_trackpts_plots(last_t, self.errors,
                                           self.track_results,
                                           np.asarray(gt_xy))
        return self.summary()

    def _observe(self, t, frame, depth, outs, gt_xy):
        """Periodic logging + checkpointing (reference save_sample_freq
        behavior, nodes.py:591-627)."""
        if self.logger is not None:
            if outs is not None:
                self.logger.log_step(t, outs, self.frame_times[-1] * 1e3)
            self.logger.log_reproj(t, self.errors, self.cfg.edge_ids)
            sf = self.state.surfels
            render = np.asarray(self._render(sf.points, sf.colors, sf.active))
            kp = None
            if self.track_results.get(t) is not None:
                est = self.track_results[t]
                kp = est[est[:, 2] > 0][:, :2]
            g = self.state.graph
            from super_tpu.geometry.camera import project_points

            gv, gu, _, _ = project_points(g.points.T, self.intr,
                                          self.cfg.height, self.cfg.width)
            mesh_xy = np.stack([np.asarray(gu), np.asarray(gv)], axis=1)
            edges = np.asarray(g.edges)[np.asarray(g.edge_active)]
            self.logger.log_images(
                t, np.asarray(frame.color_image), depth=np.asarray(depth),
                render_chw=render, keypoints_xy=kp,
                mesh_points_xy=mesh_xy, mesh_edges=edges)
            # Confidence heat map render (renderImg_conf_heat parity,
            # nodes.py:640-642): surfel confidences through magma.
            import matplotlib.cm as cm

            confs = np.clip(np.asarray(sf.confs), 0, 1)
            heat = np.ascontiguousarray(
                cm.magma(confs)[:, :3].T.astype(np.float32))
            heat_img = np.asarray(self._render(
                sf.points, jnp.asarray(heat), sf.active))
            self.logger.writer.add_image("visualization/uncertainty",
                                         np.clip(heat_img, 0, 1), t)
        if self.checkpoint_dir is not None:
            from super_tpu.utils.checkpoint import save_state

            save_state(self.checkpoint_dir, self.state, step=t)

    def _eval_frame(self, t, frame, gt_xy_t, gt_valid_t):
        track = self._assign(self.state.surfels, frame, self.state.track,
                             jnp.asarray(gt_xy_t), jnp.asarray(gt_valid_t))
        track = self._record(self.state.surfels, track)
        self.state = self.state._replace(track=track)
        est = np.concatenate(
            [np.asarray(track.coords),
             np.asarray(track.coord_valid, dtype=np.float32)[:, None]], axis=1)
        gt = np.concatenate(
            [np.asarray(gt_xy_t),
             np.asarray(gt_valid_t, dtype=np.float32)[:, None]], axis=1)
        self.track_results[t] = est
        # Errors only count points that are both GT-visible and tracked.
        err = evaluation.reprojection_errors(gt, est)
        err[~np.asarray(track.coord_valid)] = -1.0
        self.errors[t] = err

    def summary(self) -> Dict[str, float]:
        out = evaluation.summarize(self.errors, edge_ids=self.cfg.edge_ids)
        if self.frame_times:
            steady = self.frame_times[2:] or self.frame_times
            out["mean_frame_ms"] = float(np.mean(steady) * 1e3)
            out["p50_frame_ms"] = float(np.percentile(steady, 50) * 1e3)
            out["fps"] = 1e3 / out["p50_frame_ms"]
        if self.state is not None:
            out["num_surfels"] = float(self.state.surfels.num_active)
            out["num_nodes"] = float(self.state.graph.num_active)
        for name, total in self.overflow_totals.items():
            out[f"overflow_{name}"] = float(total)
        return out
