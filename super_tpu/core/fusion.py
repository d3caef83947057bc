"""Surfel fusion: merge per-frame observations into the fixed-capacity map.

Re-implements Surfels.fuseInputData + prepareStableIndexNSwapAllModel
(super/nodes.py:270-627) without any dynamic shapes:

1. *Projection maps*: every active surfel is projected to a pixel; per pixel
   up to ``proj_map_depth`` (16) surfels ordered by confidence occupy layers
   (nodes.py:363-400).  Layer assignment = position within the run of equal
   pixel ids after a stable (confidence, pixel) sort.  Overflow surfels are
   deleted, as in the reference (nodes.py:402-403).
2. *Merge new candidates* (nodes.py:409-422): walk the layers; a still
   unmerged valid candidate merges into the layer surfel at its pixel when
   close in position and normal; merged attributes are confidence-weighted
   (merge_data, nodes.py:301-355; new colors triple-weighted).
3. *Merge duplicate surfels* (nodes.py:425-460): for each layer pair (i, j)
   sharing a pixel, surfel j merges into i under the same gates; j is
   deleted and tracked ids are remapped i <- j.
4. *Add unmatched candidates* (nodes.py:486-538): anchored to the ED graph,
   stability-gated, written into free slots (slot allocation by prefix sums
   -- the fixed-capacity replacement for torch.cat growth).
5. *Prune* (nodes.py:543-589): surfels stale for ``th_time_steps`` are
   deactivated (tracked ones are kept); slot ids are stable so no index
   remapping is needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.anchoring import anchor_points, recompute_surfel_weights
from super_tpu.core.state import FrameData, GraphState, SurfelState, TrackState
from super_tpu.geometry.camera import Intrinsics, project_points


def build_projection_maps(cfg: SuPerConfig, intr: Intrinsics,
                          surfels: SurfelState):
    """Per-pixel surfel layers.

    Returns:
      proj_id: (L, P) int32 surfel slot per (layer, pixel), -1 empty.
      overflow: (N,) bool surfels beyond layer L at their pixel (deleted).
    """
    h, w = cfg.height, cfg.width
    p = h * w
    depth_l = cfg.capacity.proj_map_depth
    n = surfels.capacity

    _, _, coords, in_bounds = project_points(surfels.points, intr, h, w)
    valid = in_bounds & surfels.active
    key_coords = jnp.where(valid, coords, p)  # invalid -> sentinel bucket

    # Stable sort by confidence desc, then stable sort by pixel: within a
    # pixel, higher confidence comes first (nodes.py:367-371).
    order_conf = jnp.argsort(-surfels.confs, stable=True)
    order_pix = jnp.argsort(key_coords[order_conf], stable=True)
    order = order_conf[order_pix]
    sorted_coords = key_coords[order]

    first_idx = jnp.searchsorted(sorted_coords, sorted_coords, side="left")
    layer = jnp.arange(n) - first_idx

    in_map = (sorted_coords < p) & (layer < depth_l)
    flat_idx = jnp.where(in_map, layer * p + sorted_coords, depth_l * p)
    proj_id = jnp.full((depth_l * p,), -1, dtype=jnp.int32)
    proj_id = proj_id.at[flat_idx].set(order.astype(jnp.int32), mode="drop")
    proj_id = proj_id.reshape(depth_l, p)

    overflow_sorted = (sorted_coords < p) & (layer >= depth_l)
    overflow = jnp.zeros((n,), dtype=bool).at[order].set(overflow_sorted)
    return proj_id, overflow


def _merge_gate(cfg: SuPerConfig, p1, n1, seg1, p2, n2, seg2):
    """Close-enough test for merging (nodes.py:311-316)."""
    ok = (jnp.linalg.norm(p1 - p2, axis=-1) < cfg.th_dist) & \
        (jnp.sum(n1 * n2, axis=-1) > cfg.th_cosine_ang)
    if cfg.hard_seg or cfg.data == "superv1":
        ok = ok & (seg1 == seg2)
    return ok


def _merged_values(cfg: SuPerConfig, s: SurfelState, sl, frame_or_state,
                   src_idx, time, triple_new_color: bool):
    """Confidence-weighted merge of surfel slots ``sl`` with source rows
    ``src_idx`` of ``frame_or_state`` (merge_data, nodes.py:301-355).

    Returns a dict of merged per-row values (aligned with sl)."""
    o = frame_or_state
    w1 = s.confs[sl]
    w2 = o.confs[src_idx]
    w_sum = w1 + w2
    a1 = (w1 / jnp.maximum(w_sum, 1e-20))[:, None]
    a2 = (w2 / jnp.maximum(w_sum, 1e-20))[:, None]
    points = a1 * s.points[sl] + a2 * o.points[src_idx]
    norms = a1 * s.norms[sl] + a2 * o.norms[src_idx]
    norms = norms / jnp.maximum(jnp.linalg.norm(norms, axis=-1, keepdims=True), 1e-12)
    radii = a1[:, 0] * s.radii[sl] + a2[:, 0] * o.radii[src_idx]
    if triple_new_color:
        wc1, wc2 = a1, 3.0 * a2
        cs = wc1 + wc2
        colors = wc1 / cs * s.colors[sl] + wc2 / cs * o.colors[src_idx]
    else:
        colors = a1 * s.colors[sl] + a2 * o.colors[src_idx]
    out = dict(points=points, norms=norms, radii=radii, colors=colors,
               confs=w_sum, time_stamp=jnp.full_like(w_sum, time))
    if cfg.method == "semantic-super":
        sc = a1 * s.seg_conf[sl] + a2 * o.seg_conf[src_idx]
        sc = sc / jnp.maximum(jnp.sum(sc, axis=1, keepdims=True), 1e-20)
        out["seg_conf"] = sc
        out["seg"] = jnp.argmax(sc, axis=1).astype(jnp.int32)
    return out


def _scatter_merge(s: SurfelState, sl, do, vals) -> SurfelState:
    """Apply merged values at slots ``sl`` where ``do`` (unique slots)."""
    upd = {}
    for name, new in vals.items():
        cur = getattr(s, name)[sl]
        sel = jnp.where(do[:, None] if new.ndim == 2 else do, new, cur)
        upd[name] = getattr(s, name).at[sl].set(sel, mode="drop")
    return s._replace(**upd)


def fuse_frame(cfg: SuPerConfig, intr: Intrinsics, surfels: SurfelState,
               graph: GraphState, frame: FrameData
               ) -> Tuple[SurfelState, jnp.ndarray]:
    """Stages 1-4 of the fusion (everything except pruning).

    Returns (surfels, remap) where ``remap[j] = i`` records surfel j merged
    into i (identity elsewhere) for tracked-id fixup."""
    p = cfg.image_pixels
    time = frame.time
    proj_id, overflow = build_projection_maps(cfg, intr, surfels)
    surfels = surfels._replace(active=surfels.active & ~overflow)
    layer_occupied = proj_id >= 0  # (L, P)

    # --- stage 2: merge candidates into layer surfels ---------------------
    cand_left = frame.valid & layer_occupied[0]  # candidates that may merge
    add_mask = frame.valid & ~layer_occupied[0]  # pixels with no surfel
    if not cfg.disable_merging_new_surfels:
        for i in range(cfg.capacity.proj_map_depth):
            sl = jnp.clip(proj_id[i], 0, surfels.capacity - 1)
            try_merge = cand_left & layer_occupied[i]
            cand_idx = jnp.arange(p)
            gate = _merge_gate(cfg,
                               surfels.points[sl], surfels.norms[sl],
                               surfels.seg[sl],
                               frame.points, frame.norms, frame.seg)
            do = try_merge & gate
            vals = _merged_values(cfg, surfels, sl, frame, cand_idx, time,
                                  triple_new_color=True)
            surfels = _scatter_merge(surfels, sl, do, vals)
            cand_left = cand_left & ~do
        add_mask = add_mask | cand_left
    else:
        add_mask = frame.valid

    # --- stage 3: merge duplicate surfels across layers -------------------
    remap = jnp.arange(surfels.capacity, dtype=jnp.int32)
    if not cfg.disable_merging_exist_surfels:
        alive_layer = layer_occupied
        depth_l = cfg.capacity.proj_map_depth
        active = surfels.active
        for i in range(depth_l):
            sl_i = jnp.clip(proj_id[i], 0, surfels.capacity - 1)
            for j in range(i + 1, depth_l):
                sl_j = jnp.clip(proj_id[j], 0, surfels.capacity - 1)
                both = alive_layer[i] & alive_layer[j]
                gate = _merge_gate(cfg,
                                   surfels.points[sl_i], surfels.norms[sl_i],
                                   surfels.seg[sl_i],
                                   surfels.points[sl_j], surfels.norms[sl_j],
                                   surfels.seg[sl_j])
                do = both & gate
                vals = _merged_values(cfg, surfels, sl_i, surfels, sl_j,
                                      time, triple_new_color=False)
                surfels = _scatter_merge(surfels, sl_i, do, vals)
                # Delete j, remap tracked ids j -> i.
                active = active.at[sl_j].set(
                    jnp.where(do, False, active[sl_j]), mode="drop")
                remap = remap.at[sl_j].set(
                    jnp.where(do, sl_i.astype(jnp.int32), remap[sl_j]),
                    mode="drop")
                alive_layer = alive_layer.at[j].set(alive_layer[j] & ~do)
        surfels = surfels._replace(active=active)

    # --- stage 3.5: refresh anchor weights (nodes.py:466-484) -------------
    surfels = recompute_surfel_weights(cfg, surfels, graph)

    # --- stage 4: add unmatched candidates into free slots ----------------
    if not cfg.disable_adding_new_surfels:
        knn_idx, knn_w, stable = anchor_points(
            cfg, graph, frame.points, add_mask,
            seg=frame.seg, seg_conf=frame.seg_conf)
        add = add_mask & stable

        n = surfels.capacity
        free = ~surfels.active
        free_rank = jnp.cumsum(free) - 1  # rank of each free slot
        slot_by_rank = jnp.full((n,), n, dtype=jnp.int32).at[
            jnp.where(free, free_rank, n)].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")
        cand_rank = jnp.cumsum(add) - 1
        target = jnp.where(add, slot_by_rank[jnp.clip(cand_rank, 0, n - 1)], n)

        def scat(dst, src):
            return dst.at[target].set(src, mode="drop")

        surfels = surfels._replace(
            points=scat(surfels.points, frame.points),
            norms=scat(surfels.norms, frame.norms),
            colors=scat(surfels.colors, frame.colors),
            radii=scat(surfels.radii, frame.radii),
            confs=scat(surfels.confs, frame.confs),
            time_stamp=scat(surfels.time_stamp,
                            jnp.full((p,), time, dtype=jnp.float32)),
            knn_idx=scat(surfels.knn_idx, knn_idx),
            knn_w=scat(surfels.knn_w, knn_w),
            seg=scat(surfels.seg, frame.seg),
            seg_conf=scat(surfels.seg_conf, frame.seg_conf),
            dist2edge=scat(surfels.dist2edge, frame.dist2edge),
            active=surfels.active.at[target].set(True, mode="drop"),
        )

    return surfels, remap


def prune_surfels(cfg: SuPerConfig, surfels: SurfelState, track: TrackState,
                  time) -> Tuple[SurfelState, TrackState]:
    """Deactivate stale surfels; keep tracked ones; mark lost tracks.

    Parity: prepareStableIndexNSwapAllModel (nodes.py:543-589).  Slot ids are
    stable, so the reference's id-remapping (nodes.py:577-580) vanishes.
    """
    if not cfg.disable_removing_unstable_surfels:
        fresh = (time - surfels.time_stamp) < cfg.th_time_steps
        active = surfels.active & fresh
        tracked = jnp.clip(track.track_id, 0, surfels.capacity - 1)
        keep = track.track_id >= 0
        active = active.at[tracked].set(
            jnp.where(keep, True, active[tracked]), mode="drop")
        surfels = surfels._replace(active=active)
    # Tracks whose surfel is gone -> lost (-2).
    tid = jnp.clip(track.track_id, 0, surfels.capacity - 1)
    lost = (track.track_id >= 0) & ~surfels.active[tid]
    track = track._replace(
        track_id=jnp.where(lost, -2, track.track_id))
    return surfels, track
