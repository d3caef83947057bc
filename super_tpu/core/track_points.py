"""Tracked control-point bookkeeping (20-point GT evaluation).

Parity: Surfels.init_track_pts / update_track_pts (super/nodes.py:225-265).
Slot ids are stable in this design, so a tracked id stays valid until its
surfel is pruned or merged away (fusion returns a remap for merges).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.state import FrameData, SurfelState, TrackState


def assign_track_points(cfg: SuPerConfig, surfels: SurfelState,
                        frame: FrameData, track: TrackState,
                        gt_xy, gt_valid, th: float = 0.2) -> TrackState:
    """Bind untracked GT points (track_id == -1) to the nearest surfel.

    Args:
      gt_xy: (P, 2) int GT screen coords (x, y) for this frame.
      gt_valid: (P,) bool GT visibility.
    A GT point binds to the closest *stable, not already tracked* surfel to
    the frame candidate at its pixel, if closer than ``th``
    (nodes.py:237-247).  Sequential over points (earlier bindings exclude
    their surfel), via lax.scan.
    """
    w = cfg.width
    n = surfels.capacity
    used0 = jnp.zeros((n,), dtype=bool)
    tid0 = jnp.clip(track.track_id, 0, n - 1)
    used0 = used0.at[tid0].set(track.track_id >= 0)

    def body(used, inp):
        tid, xy, gv = inp
        pix = jnp.clip(xy[1] * w + xy[0], 0, frame.valid.shape[0] - 1)
        cand_ok = frame.valid[pix] & (pix > 0)
        target = frame.points[:, pix]  # (3,)
        d = jnp.sqrt(sum((surfels.points[c] - target[c]) ** 2
                         for c in range(3)))
        d = jnp.where(surfels.active & ~used, d, jnp.inf)
        best = jnp.argmin(d)
        assign = (tid == -1) & gv & cand_ok & (d[best] < th)
        new_tid = jnp.where(assign, best.astype(jnp.int32), tid)
        used = used.at[best].set(used[best] | assign)
        return used, new_tid

    _, new_ids = jax.lax.scan(
        body, used0, (track.track_id, gt_xy.astype(jnp.int32), gt_valid))
    return track._replace(track_id=new_ids)


def record_track_coords(surfels: SurfelState, track: TrackState) -> TrackState:
    """Store current screen coords of tracked surfels (nodes.py:251-265)."""
    tid = jnp.clip(track.track_id, 0, surfels.capacity - 1)
    coords = surfels.proj_uv[:, tid].T  # (P, 2)
    valid = track.track_id >= 0
    return track._replace(coords=coords, coord_valid=valid)
