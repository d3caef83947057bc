"""Multi-stream host pipeline: track many sequences concurrently.

The north-star deployment is thousands of concurrent surgical streams
(SURVEY.md 2.7): per-stream state is independent, so streams batch with
``vmap`` and shard over the 'stream' mesh axis.  This host loop drives the
batched step over per-stream frame sources, with per-stream tracking
evaluation -- the multi-sequence analogue of super_tpu.pipeline.
"""

from __future__ import annotations

import functools
import time as _time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from super_tpu.config import SuPerConfig
from super_tpu.core.preprocess import preprocess_frame
from super_tpu.core.track_points import assign_track_points, record_track_coords
from super_tpu.core.tracker import init_tracker
from super_tpu.geometry.camera import Intrinsics
from super_tpu.parallel.sharded import make_batched_step, make_multichip_step
from super_tpu.utils import evaluation


class MultiStreamPipeline:
    """Batched tracking over B concurrent streams.

    All streams share one config/intrinsics (one compiled program); per
    stream, supply (depths, colors) sequences of equal length.  With a mesh,
    the batch is partitioned over the 'stream' axis.
    """

    def __init__(self, cfg: SuPerConfig, intr: Intrinsics, mesh=None):
        self.cfg = cfg
        self.intr = intr
        self.mesh = mesh
        self._preprocess = jax.jit(jax.vmap(
            functools.partial(preprocess_frame, cfg, intr)))
        self._init = jax.jit(jax.vmap(functools.partial(init_tracker, cfg)))
        if mesh is None:
            self._step = make_batched_step(cfg, intr)
        else:
            self._step = make_multichip_step(cfg, intr, mesh)
        self._assign = jax.jit(jax.vmap(
            functools.partial(assign_track_points, cfg)))
        self._record = jax.jit(jax.vmap(record_track_coords))
        self.states = None
        self.errors: List[Dict[int, np.ndarray]] = []
        self.frame_times: List[float] = []

    def _place(self, tree):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("stream"))
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def run(self, depths, colors, gt_xy=None, gt_valid=None,
            verbose: bool = False):
        """Args: depths (B, T, H, W); colors (B, T, H, W, 3) or channel-first.
        gt_xy: optional (B, T, P, 2); gt_valid: (B, T, P)."""
        b, t_total = np.shape(depths)[0], np.shape(depths)[1]
        self.errors = [dict() for _ in range(b)]
        for t in range(t_total):
            tic = _time.perf_counter()
            color = np.asarray([np.asarray(colors[s][t]) for s in range(b)])
            if color.shape[-1] == 3:
                color = color.transpose(0, 3, 1, 2)
            depth = jnp.asarray(
                np.asarray([np.asarray(depths[s][t]) for s in range(b)]))
            times = jnp.full((b,), float(t), jnp.float32)
            frames = self._place(self._preprocess(depth, jnp.asarray(color),
                                                  times))
            if self.states is None:
                self.states = self._place(self._init(frames))
            else:
                self.states, outs = self._step(self.states, frames)
            if gt_xy is not None:
                track = self._assign(self.states.surfels, frames,
                                     self.states.track,
                                     jnp.asarray(gt_xy[:, t]),
                                     jnp.asarray(gt_valid[:, t]))
                track = self._record(self.states.surfels, track)
                self.states = self.states._replace(track=track)
                est_xy = np.asarray(track.coords)
                est_v = np.asarray(track.coord_valid)
                for s in range(b):
                    gtv = np.concatenate(
                        [gt_xy[s, t], gt_valid[s, t][:, None]], axis=1)
                    est = np.concatenate(
                        [est_xy[s], est_v[s][:, None].astype(np.float32)],
                        axis=1)
                    err = evaluation.reprojection_errors(gtv, est)
                    err[~est_v[s]] = -1.0
                    self.errors[s][t] = err
            jax.block_until_ready(self.states.surfels.points)
            self.frame_times.append(_time.perf_counter() - tic)
            if verbose:
                print(f"t={t}: {self.frame_times[-1]*1e3:.0f} ms "
                      f"({b} streams)")
        return self.summary(b)

    def summary(self, b) -> Dict[str, float]:
        per_stream = [evaluation.summarize(e) for e in self.errors]
        out = {}
        means = [s.get("reproj_mean", np.nan) for s in per_stream]
        if means and np.isfinite(means).any():
            out["reproj_mean"] = float(np.nanmean(means))
            out["reproj_mean_worst_stream"] = float(np.nanmax(means))
        if self.frame_times:
            steady = self.frame_times[2:] or self.frame_times
            ms = float(np.median(steady) * 1e3)
            out["p50_batch_ms"] = ms
            out["aggregate_fps"] = b * 1e3 / ms
        return out
