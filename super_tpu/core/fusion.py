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

All surfel/candidate arrays are feature-major ((3, N) etc.); per-pixel
work uses channel-wise rank-1 gathers/scatters.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.anchoring import anchor_points, recompute_surfel_weights
from super_tpu.core.state import (
    FrameData,
    GraphState,
    SurfelState,
    TrackState,
    gather_rows,
)
from super_tpu.geometry.camera import Intrinsics, project_points


def _proj_sort_products(p, confs, valid, coords):
    """The sort half of the projection maps: surfels ordered by (pixel,
    conf desc, slot id) plus each sorted position's run layer.  No
    scatters -- the (L, P) map and the per-slot layer array are built
    lazily (only when a multi-layer pixel exists, fuse_frame).

    Returns (sorted_coords, layer, order), all (N,)."""
    n = confs.shape[0]
    key_coords = jnp.where(valid, coords, p)  # invalid -> sentinel bucket

    # Sort by (pixel, conf desc, slot id): within a pixel, higher
    # confidence comes first (nodes.py:367-371), ties by slot id -- the
    # exact order of the stable two-pass argsort, in one non-stable sort.
    ids = jnp.arange(n, dtype=jnp.int32)
    sorted_coords, _, order = jax.lax.sort(
        (key_coords, -confs, ids), num_keys=3, is_stable=False)

    # Layer = position within the pixel's run.
    iota = jnp.arange(n, dtype=jnp.int32)
    new_run = jnp.concatenate([
        jnp.ones((1,), bool), sorted_coords[1:] != sorted_coords[:-1]])
    first_idx = jax.lax.cummax(jnp.where(new_run, iota, 0))
    layer = iota - first_idx
    return sorted_coords, layer, order


def build_projection_maps(cfg: SuPerConfig, intr: Intrinsics,
                          surfels: SurfelState):
    """Per-pixel surfel layers.

    Layer semantics (nodes.py:363-400): within a pixel, surfels are ordered
    by confidence descending (ties: slot id ascending -- the stable-sort
    order); surfels beyond ``proj_map_depth`` layers are deleted
    (nodes.py:402-403).

    Implementation: ``proj_map_mode="sort"`` (default) runs ONE non-stable
    3-key lax.sort (pixel, -conf, slot id) -- the id key makes the order
    total, so it equals the chained stable argsorts exactly, and on TPU the
    non-stable variadic sort is ~20x cheaper than stable argsorts (8 ms vs
    80 ms each at N=393k); layers fall out of a run-length cummax and one
    combiner-free set-scatter.  ``"scatter"`` peels the top-confidence
    surfel per pixel once per layer with scatter-max/min (combiner scatters
    are ~80 ms each on TPU -- kept for the exact-equality cross-check).
    Both produce identical maps (test_fusion_proj_map_modes_agree).

    Returns:
      proj_id: (L, P) int32 surfel slot per (layer, pixel), -1 empty.
      overflow: (N,) bool surfels beyond layer L at their pixel (deleted).
      pix: (N,) int32 flat pixel of each surfel (0 where invalid).
      sf_layer: (N,) int32 layer of each surfel -- [0, L) in the map, L if
        overflow, -1 where the surfel is inactive / projects out of frame.
    """
    h, w = cfg.height, cfg.width
    p = h * w
    depth_l = cfg.capacity.proj_map_depth
    n = surfels.capacity

    _, _, coords, in_bounds = project_points(surfels.points, intr, h, w)
    valid = in_bounds & surfels.active
    pix = jnp.where(valid, coords, 0).astype(jnp.int32)

    if cfg.proj_map_mode == "scatter":
        ids = jnp.arange(n, dtype=jnp.int32)
        safe_coords = pix
        alive = valid
        neg_inf = jnp.asarray(-jnp.inf, surfels.confs.dtype)
        layers = []
        sf_layer = jnp.where(valid, depth_l, -1).astype(jnp.int32)
        for li in range(depth_l):
            key = jnp.where(alive, surfels.confs, neg_inf)
            best = jnp.full((p,), neg_inf, surfels.confs.dtype).at[
                safe_coords].max(key)
            # Tie-break exactly like the stable sort: among equal-conf
            # surfels the lowest slot id wins the layer.
            cand = alive & (key == best[safe_coords]) & (key > neg_inf)
            wid = jnp.full((p,), n, jnp.int32).at[safe_coords].min(
                jnp.where(cand, ids, n))
            winner = cand & (ids == wid[safe_coords])
            layers.append(jnp.where(wid < n, wid, -1))
            sf_layer = jnp.where(winner, li, sf_layer)
            alive = alive & ~winner
        proj_id = jnp.stack(layers, axis=0)
        overflow = alive  # valid coords but never won a layer
        return proj_id, overflow, pix, sf_layer

    sorted_coords, layer, order = _proj_sort_products(
        p, surfels.confs, valid, coords)

    in_map = (sorted_coords < p) & (layer < depth_l)
    flat_idx = jnp.where(in_map, layer * p + sorted_coords, depth_l * p)
    proj_id = jnp.full((depth_l * p,), -1, dtype=jnp.int32)
    proj_id = proj_id.at[flat_idx].set(order.astype(jnp.int32), mode="drop")
    proj_id = proj_id.reshape(depth_l, p)

    layer_sorted = jnp.where(sorted_coords < p,
                             jnp.minimum(layer, depth_l), -1)
    sf_layer = jnp.zeros((n,), jnp.int32).at[order].set(
        layer_sorted.astype(jnp.int32))
    overflow = sf_layer == depth_l
    return proj_id, overflow, pix, sf_layer


def _pack_bank(points, norms, colors, radii, confs, seg, seg_conf,
               time_stamp=None):
    """Pack the merge-relevant fields into one (F, N) bank so a merge stage
    costs ONE minor-axis gather (and one 2D scatter) instead of ~12 each.

    ``seg_conf`` may be a zero-row (0, N) array: outside semantic mode the
    merge stages never change class confidences, so the bank (and every
    gather over it) carries 13 rows instead of 13 + C."""
    if time_stamp is None:
        time_stamp = jnp.zeros_like(radii)
    return jnp.concatenate([
        points, norms, colors,
        radii[None], confs[None], seg.astype(points.dtype)[None],
        time_stamp[None], seg_conf,
    ], axis=0)


def _unpack_bank(bank):
    c = bank.shape[0] - 13
    return dict(
        points=bank[0:3], norms=bank[3:6], colors=bank[6:9],
        radii=bank[9], confs=bank[10],
        seg=bank[11].astype(jnp.int32), time_stamp=bank[12],
        seg_conf=bank[13:13 + c],
    )


def _pack_vals(vals: Dict) -> jnp.ndarray:
    """Merge-values dict -> bank rows (same layout as _pack_bank)."""
    return _pack_bank(vals["points"], vals["norms"], vals["colors"],
                      vals["radii"], vals["confs"], vals["seg"],
                      vals["seg_conf"], vals["time_stamp"])


def _merge_gate(cfg: SuPerConfig, a: Dict, b: Dict):
    """Close-enough test for merging (nodes.py:311-316)."""
    d2 = jnp.sum((a["points"] - b["points"]) ** 2, axis=0)
    dot = jnp.sum(a["norms"] * b["norms"], axis=0)
    ok = (d2 < cfg.th_dist ** 2) & (dot > cfg.th_cosine_ang)
    if cfg.hard_seg or cfg.data == "superv1":
        ok = ok & (a["seg"] == b["seg"])
    return ok


def _merged_values(cfg: SuPerConfig, a: Dict, b: Dict, time,
                   triple_new_color: bool):
    """Confidence-weighted merge (merge_data, nodes.py:301-355)."""
    w1, w2 = a["confs"], b["confs"]
    w_sum = w1 + w2
    a1 = w1 / jnp.maximum(w_sum, 1e-20)
    a2 = w2 / jnp.maximum(w_sum, 1e-20)
    points = a1 * a["points"] + a2 * b["points"]
    norms = a1 * a["norms"] + a2 * b["norms"]
    norms = norms / jnp.maximum(jnp.linalg.norm(norms, axis=0, keepdims=True),
                                1e-12)
    radii = a1 * a["radii"] + a2 * b["radii"]
    if triple_new_color:
        wc1, wc2 = a1, 3.0 * a2
        cs = jnp.maximum(wc1 + wc2, 1e-20)
        colors = wc1 / cs * a["colors"] + wc2 / cs * b["colors"]
    else:
        colors = a1 * a["colors"] + a2 * b["colors"]
    out = dict(points=points, norms=norms, radii=radii, colors=colors,
               confs=w_sum,
               time_stamp=jnp.full_like(w_sum, time))
    if cfg.method == "semantic-super":
        sc = a1 * a["seg_conf"] + a2 * b["seg_conf"]
        sc = sc / jnp.maximum(jnp.sum(sc, axis=0, keepdims=True), 1e-20)
        out["seg_conf"] = sc
        out["seg"] = jnp.argmax(sc, axis=0).astype(jnp.int32)
    else:
        out["seg_conf"] = a["seg_conf"]  # unchanged outside semantic mode
        out["seg"] = a["seg"]
    return out


def _candidate_view(cfg: SuPerConfig, intr: Intrinsics, frame: FrameData,
                    sf_pix):
    """Stage-2 per-surfel view of the frame candidate at its pixel.

    Gathers only the IRREDUCIBLE candidate rows -- [z, normal(3),
    color(3)] (+ seg / seg_conf per mode) -- and reconstructs the rest
    from the pixel coordinate with the same formulas, same op order, as
    preprocess_frame (exact in eager mode; within 1 ULP under jit, where
    XLA's FMA contraction may fuse the two programs differently).
    Gathers cost per index x row; this is the ~400k-index hot gather of
    the merge stage:
      - points: x = (u - cx) z / fx (same ops/order as backproject_depth);
      - radii:  |z| / (sqrt(2) fx clip(|n_z|, 0.26, 1)) (preprocess_frame);
      - confs:  center-weighted exp(-d^2 DIVTERM) of the pixel
        (preprocess_frame; gathered instead when SSIM confidence blending
        is enabled, which makes confs depth-dependent);
      - validity: preprocess zeroes normals at invalid pixels and invalid
        depth is NaN, so every merge gate already fails without a valid
        row (|n| = 0 fails the cosine test, NaN fails every comparison) --
        no validity row is gathered.

    Returns the fview dict.
    """
    from super_tpu.core.preprocess import DIVTERM

    h, w = cfg.height, cfg.width
    fdt = frame.points.dtype
    need_seg = cfg.hard_seg or cfg.data == "superv1"
    semantic = cfg.method == "semantic-super"
    gather_conf = not cfg.disable_ssim_conf
    rows = [frame.points[2:3], frame.norms, frame.colors]
    if gather_conf:
        rows.append(frame.confs[None])
    if need_seg:
        rows.append(frame.seg.astype(fdt)[None])
    if semantic:
        rows.append(frame.seg_conf)
    fv = gather_rows(jnp.concatenate(rows, axis=0), sf_pix)
    z, n, colors = fv[0], fv[1:4], fv[4:7]
    off = 7
    if gather_conf:
        confs = fv[off]
        off += 1
    if need_seg:
        seg = fv[off].astype(jnp.int32)
        off += 1
    nseg = frame.seg_conf.shape[0] if semantic else 0
    seg_conf = fv[off:off + nseg]

    # Pixel coordinates as f32 (exact: < 2^24), matching preprocess's
    # meshgrid values.
    vf = (sf_pix // w).astype(fdt)
    uf = (sf_pix - (sf_pix // w) * w).astype(fdt)
    x = (uf - intr.cx) * z / intr.fx
    y = (vf - intr.cy) * z / intr.fy
    nz = jnp.clip(jnp.abs(n[2]), 0.26, 1.0)
    radii = jnp.abs(z) / (jnp.sqrt(2.0) * intr.fx * nz)
    if not gather_conf:
        dc2 = (2.0 * uf / w - 1.0) ** 2 + (2.0 * vf / h - 1.0) ** 2
        confs = jnp.exp(-dc2 * DIVTERM)
    zseg = jnp.zeros(z.shape, fdt)
    fview = dict(
        points=jnp.stack([x, y, z]), norms=n, colors=colors,
        radii=radii, confs=confs,
        seg=seg if need_seg else zseg.astype(jnp.int32),
        time_stamp=zseg,  # merged time_stamp = full(time): never read
        seg_conf=seg_conf,  # (0, N) outside semantic mode
    )
    return fview


class FusionDiag(NamedTuple):
    """Capacity-overflow counters of one fusion step (all () int32).

    The fixed-capacity design degrades gracefully on overflow (deletes /
    defers instead of corrupting), but silently -- these counters make an
    undersized config visible (StepOutputs / run_super --verbose)."""

    proj_overflow: jnp.ndarray   # surfels deleted beyond proj_map_depth
    add_overflow: jnp.ndarray    # add candidates beyond new_surfel_capacity
    #   (deferred to later frames)
    free_exhausted: jnp.ndarray  # stability-gated adds with no free slot
    dup_skipped: jnp.ndarray     # deeper-layer pixels beyond the compact
    #   duplicate-merge list (their duplicate merges wait for a later frame)


def add_candidates(cfg: SuPerConfig, intr: Intrinsics, surfels: SurfelState,
                   graph: GraphState, frame: FrameData, add_mask, time):
    """Fusion stage 4: anchor + stability-gate the unmatched candidates and
    write them into free slots (nodes.py:486-538).

    Returns (surfels, add_overflow, free_exhausted).  Factored out of
    fuse_frame so the profiling harness can time it with a REAL add mask.
    """
    p = cfg.image_pixels
    # Compact the add candidates to new_surfel_capacity rows before the
    # ED-anchoring KNN: after frame 1 only a few thousand pixels are
    # unmatched, so anchoring all H*W pixel slots (the dense-masked
    # equivalent of nodes.py:486-500) would waste a full-image KNN.
    a_cap = cfg.capacity.new_surfel_capacity
    # r-th unmatched candidate by searchsorted over the cumsum (see the
    # stage-3 compact list -- same scatter-free compaction).
    cand_cs = jnp.cumsum(add_mask).astype(jnp.int32)
    add_overflow = jnp.maximum(cand_cs[-1] - a_cap, 0)
    cand_r1 = jnp.arange(1, a_cap + 1, dtype=jnp.int32)
    comp_src = jnp.searchsorted(cand_cs, cand_r1).astype(jnp.int32)
    comp_valid = cand_r1 <= cand_cs[-1]
    comp_src = jnp.where(comp_valid, jnp.clip(comp_src, 0, p - 1), 0)

    # One gather fetches every candidate field (frame rows packed once).
    fdt = frame.points.dtype
    fbank2 = jnp.concatenate([
        frame.points, frame.norms, frame.colors, frame.radii[None],
        frame.confs[None], frame.dist2edge[None],
        frame.seg.astype(fdt)[None], frame.seg_conf], axis=0)
    cvals = gather_rows(fbank2, comp_src)          # (13 + C, a_cap)
    c_points = cvals[0:3]
    c_seg = cvals[12].astype(jnp.int32)
    c_seg_conf = cvals[13:]
    knn_idx, knn_w, stable = anchor_points(
        cfg, graph, c_points, comp_valid, seg=c_seg,
        seg_conf=c_seg_conf)
    add = comp_valid & stable

    n = surfels.capacity
    free = ~surfels.active
    # The add's slot = position of its rank-th free slot: searchsorted
    # over the free-mask cumsum replaces the N-element rank scatter.
    free_cs = jnp.cumsum(free).astype(jnp.int32)
    add_rank1 = jnp.cumsum(add).astype(jnp.int32)     # 1-based rank
    fits = add & (add_rank1 <= free_cs[-1])
    target = jnp.where(fits, jnp.searchsorted(
        free_cs, add_rank1).astype(jnp.int32), n)
    free_exhausted = jnp.sum(add & ~fits).astype(jnp.int32)

    # ONE packed 2D column scatter writes every field (ints carried as
    # f32 -- node ids and labels are far below 2^24): per-row scatters
    # pay a fixed ~1 ms each on TPU, and there are 23+C rows.
    src_bank = jnp.concatenate([
        cvals,                  # pts/nrm/col/radii/confs/d2e/seg/segconf
        jnp.full((1, a_cap), time, dtype=fdt),      # time_stamp
        knn_idx.astype(fdt), knn_w,
        jnp.ones((1, a_cap), fdt),                  # active
    ], axis=0)
    dst_bank = jnp.concatenate([
        surfels.points, surfels.norms, surfels.colors,
        surfels.radii[None], surfels.confs[None],
        surfels.dist2edge[None], surfels.seg.astype(fdt)[None],
        surfels.seg_conf, surfels.time_stamp[None],
        surfels.knn_idx.astype(fdt), surfels.knn_w,
        surfels.active.astype(fdt)[None],
    ], axis=0)
    new_bank = dst_bank.at[:, target].set(src_bank, mode="drop")
    nc_seg = frame.seg_conf.shape[0]
    surfels = surfels._replace(
        points=new_bank[0:3],
        norms=new_bank[3:6],
        colors=new_bank[6:9],
        radii=new_bank[9],
        confs=new_bank[10],
        dist2edge=new_bank[11],
        seg=new_bank[12].astype(jnp.int32),
        seg_conf=new_bank[13:13 + nc_seg],
        time_stamp=new_bank[13 + nc_seg],
        knn_idx=new_bank[14 + nc_seg:18 + nc_seg].astype(
            surfels.knn_idx.dtype),
        knn_w=new_bank[18 + nc_seg:22 + nc_seg],
        active=new_bank[22 + nc_seg] > 0.5,
    )
    return surfels, add_overflow, free_exhausted


def fuse_frame(cfg: SuPerConfig, intr: Intrinsics, surfels: SurfelState,
               graph: GraphState, frame: FrameData,
               stop_after: str = None
               ) -> Tuple[SurfelState, jnp.ndarray, FusionDiag]:
    """Stages 1-4 of the fusion (everything except pruning).

    Returns (surfels, remap, diag) where ``remap[j] = i`` records surfel j
    merged into i (identity elsewhere) for tracked-id fixup.

    ``stop_after`` ("proj" | "merge23" | "unpack" | "reweight") truncates the program after that stage and returns the live
    intermediates instead -- a profiling probe (scripts/
    microbench_fuse_bisect.py times cumulative prefixes of the REAL
    program, so consecutive differences attribute in-situ stage costs that
    stage-disabling deltas misattribute through DCE/fusion interactions).
    Production callers leave it None."""
    h, w = cfg.height, cfg.width
    p = cfg.image_pixels
    time = frame.time
    depth_l = cfg.capacity.proj_map_depth
    n_cap = surfels.capacity
    p8 = cfg.capacity.dup_pixel_cap or max(p // 128, 1024)
    semantic = cfg.method == "semantic-super"
    merge_new = not cfg.disable_merging_new_surfels
    merge_dup = not cfg.disable_merging_exist_surfels and depth_l > 1
    lazy = cfg.proj_map_mode == "sort"

    # --- stage 1: projection ordering -------------------------------------
    # The converged map has (almost) no pixel with more than one projected
    # surfel, and then the WHOLE layer machinery is unnecessary: no surfel
    # overflows, every gating surfel is the sole candidate-consumer at its
    # pixel, and no duplicate pair exists.  So the sort path defers every
    # layer-indexed structure -- the (L, P) map scatter, the per-slot layer
    # scatter, the min-layer winner scatter/gather, the duplicate cliques
    # (~9 ms of element-bound scatters at 480p) -- into a lax.cond branch
    # taken only when a multi-layer pixel exists (detected from the sorted
    # runs for free); TPU executes only the taken branch.  The "scatter"
    # debug mode keeps the eager layer maps.
    if lazy:
        _, _, coords, in_bounds = project_points(surfels.points, intr, h, w)
        valid = in_bounds & surfels.active
        sf_pix = jnp.where(valid, coords, 0).astype(jnp.int32)
        sorted_coords, layer, order = _proj_sort_products(
            p, surfels.confs, valid, coords)
        # Any pixel with >= 2 in-map surfels shows up as a layer-1 run
        # position (and any overflow implies such a pixel).
        n_multi = jnp.sum((layer == 1) & (sorted_coords < p)).astype(
            jnp.int32)
        if stop_after == "proj":
            return sorted_coords, layer, order, sf_pix, n_multi
    else:
        proj_id_e, overflow_e, sf_pix, sf_layer_e = build_projection_maps(
            cfg, intr, surfels)
        if stop_after == "proj":
            return proj_id_e, overflow_e, sf_pix, sf_layer_e

    # --- stage 2 (shared half): candidate gather + gate + merge values ----
    # The surfel fields live in ONE (F, N) bank across stages 2-3.  Stage 2
    # runs SURFEL-side in one pass: every surfel gates against the candidate
    # at its own pixel (one minor-axis gather); the bank updates by SELECT,
    # not scatter (scatters cost ~5 ns/element on TPU; the full-pixel
    # layer-0 bank scatter alone was ~25 ms at 480p).  Winner selection
    # (nodes.py:409-422 layer-walk order) is branch-dependent below.
    bank_segc = surfels.seg_conf if semantic else \
        jnp.zeros((0,) + surfels.radii.shape, surfels.radii.dtype)
    bank = _pack_bank(surfels.points, surfels.norms, surfels.colors,
                      surfels.radii, surfels.confs, surfels.seg,
                      bank_segc, time_stamp=surfels.time_stamp)
    gate_raw = vals_packed = None
    if merge_new:
        fview = _candidate_view(cfg, intr, frame, sf_pix)
        sview = _unpack_bank(bank)                     # no gather: own column
        gate_raw = _merge_gate(cfg, sview, fview)
        vals_packed = _pack_vals(_merged_values(cfg, sview, fview, time,
                                                triple_new_color=True))

    def _stage23_slow(bank, active0, proj_id, sf_layer):
        """Full layer semantics: overflow deletion, min-layer candidate
        winners (the sequential layer-walk consumption order of
        nodes.py:409-422: a candidate merges into the first layer that
        accepts it; surfels occupy distinct (pixel, layer) slots so no
        later stage observes an earlier merge), then the duplicate-merge
        cliques (stage 3)."""
        remap = jnp.arange(n_cap, dtype=jnp.int32)
        consumed = jnp.zeros((p,), bool)
        overflow = sf_layer == depth_l
        active0 = active0 & ~overflow
        if merge_new:
            in_map = (sf_layer >= 0) & (sf_layer < depth_l)
            gate_n = in_map & gate_raw
            min_layer = jnp.full((p,), depth_l, jnp.int32).at[sf_pix].min(
                jnp.where(gate_n, sf_layer, depth_l))
            do = gate_n & (sf_layer == min_layer[sf_pix])
            bank = jnp.where(do[None], vals_packed, bank)
            consumed = min_layer < depth_l             # (P,)
        dup_skipped = jnp.asarray(0, jnp.int32)
        if merge_dup:
            # --- stage 3: merge duplicate surfels across layers -----------
            # One CLIQUE pass over the multi-layer pixel list: gather all L
            # layer surfels of each pixel once, run the (i, j) pair merges
            # in registers in the reference's exact sequential order
            # (nodes.py:425-460; merged values of layer i feed later
            # pairs), then write every surviving column back with ONE
            # drop-scatter.  r-th multi-layer pixel by searchsorted over
            # the occupancy cumsum (a P-element rank scatter costs
            # ~5 ns/elem; this is ~free).
            occ1 = proj_id[1] >= 0
            cs = jnp.cumsum(occ1).astype(jnp.int32)
            dup_skipped = jnp.maximum(cs[-1] - p8, 0)
            ranks1 = jnp.arange(1, p8 + 1, dtype=jnp.int32)
            compact_pix = jnp.searchsorted(cs, ranks1).astype(jnp.int32)
            compact_valid = ranks1 <= cs[-1]
            compact_pix = jnp.where(compact_valid,
                                    jnp.clip(compact_pix, 0, p - 1), 0)
            # ONE axis-1 take for all L layers (L separate row gathers
            # each pay the ~1 ms fixed gather cost).
            pid_all = jnp.take(proj_id, compact_pix, axis=1)       # (L, p8)
            pid_c = [pid_all[l] for l in range(depth_l)]
            sls = [jnp.clip(x, 0, n_cap - 1) for x in pid_c]
            occ_c = [compact_valid & (x >= 0) for x in pid_c]
            gath = gather_rows(bank, jnp.concatenate(sls))  # (F, L*p8)
            vals = [_unpack_bank(v)
                    for v in jnp.split(gath, depth_l, axis=1)]
            alive = list(occ_c)
            merged_into = [jnp.zeros((p8,), jnp.int32)
                           for _ in range(depth_l)]
            changed = [jnp.zeros((p8,), bool) for _ in range(depth_l)]
            for i in range(depth_l):
                for j in range(i + 1, depth_l):
                    both = alive[i] & alive[j]
                    do = both & _merge_gate(cfg, vals[i], vals[j])
                    mv = _merged_values(cfg, vals[i], vals[j], time,
                                        triple_new_color=False)
                    vals[i] = {k: jnp.where(do, mv[k], vals[i][k])
                               for k in vals[i]}
                    changed[i] = changed[i] | do
                    alive[j] = alive[j] & ~do
                    merged_into[j] = jnp.where(do, sls[i], merged_into[j])
                    changed[j] = changed[j] | do
            # Write back changed columns (unique targets: each surfel
            # occupies one (pixel, layer) slot; untouched/invalid columns
            # are dropped).
            wcols = jnp.concatenate([
                jnp.where(ch & oc, sl, n_cap)
                for ch, oc, sl in zip(changed, occ_c, sls)])
            wvals = jnp.concatenate([_pack_vals(v) for v in vals], axis=1)
            bank = bank.at[:, wcols].set(wvals, mode="drop")
            dead = jnp.concatenate([
                jnp.where(oc & ~al, sl, n_cap)
                for oc, al, sl in zip(occ_c, alive, sls)])
            active0 = active0.at[dead].set(False, mode="drop")
            remap = remap.at[dead].set(jnp.concatenate(merged_into),
                                       mode="drop")
        return (bank, active0, remap, consumed,
                jnp.sum(overflow).astype(jnp.int32), dup_skipped)

    zero_i = jnp.asarray(0, jnp.int32)
    if lazy:
        def _slow_lazy(bank, active0):
            # Materialize the layer structures only here (two ~N-element
            # scatters), from the already-sorted runs.
            in_map_s = (sorted_coords < p) & (layer < depth_l)
            flat_idx = jnp.where(in_map_s, layer * p + sorted_coords,
                                 depth_l * p)
            proj_id = jnp.full((depth_l * p,), -1, dtype=jnp.int32).at[
                flat_idx].set(order.astype(jnp.int32), mode="drop")
            proj_id = proj_id.reshape(depth_l, p)
            layer_sorted = jnp.where(sorted_coords < p,
                                     jnp.minimum(layer, depth_l), -1)
            sf_layer = jnp.zeros((n_cap,), jnp.int32).at[order].set(
                layer_sorted.astype(jnp.int32))
            return _stage23_slow(bank, active0, proj_id, sf_layer)

        def _fast(bank, active0):
            # Single-layer world: nobody overflows, every gating surfel is
            # the unique in-map surfel at its pixel (winner by default),
            # no duplicate pairs.
            remap = jnp.arange(n_cap, dtype=jnp.int32)
            consumed = jnp.zeros((p,), bool)
            if merge_new:
                do = valid & gate_raw
                bank = jnp.where(do[None], vals_packed, bank)
                # Unique targets (<= 1 in-map surfel per pixel).
                consumed = consumed.at[jnp.where(do, sf_pix, p)].set(
                    True, mode="drop")
            return bank, active0, remap, consumed, zero_i, zero_i

        (bank, active, remap, consumed, n_overflow,
         dup_skipped) = jax.lax.cond(n_multi > 0, _slow_lazy, _fast,
                                     bank, surfels.active)
    else:
        (bank, active, remap, consumed, n_overflow,
         dup_skipped) = _stage23_slow(bank, surfels.active, proj_id_e,
                                      sf_layer_e)
    surfels = surfels._replace(active=active)
    add_mask = (frame.valid & ~consumed) if merge_new else frame.valid
    if stop_after == "merge23":
        return bank, remap, surfels.active, add_mask

    # Unpack the merged bank back into the state once.  Outside semantic
    # mode the bank carries no seg_conf rows (the merges never change
    # them); the original array passes through.
    merged = _unpack_bank(bank)
    surfels = surfels._replace(
        points=merged["points"], norms=merged["norms"],
        colors=merged["colors"], radii=merged["radii"],
        confs=merged["confs"], seg=merged["seg"],
        seg_conf=merged["seg_conf"] if semantic else surfels.seg_conf,
        time_stamp=merged["time_stamp"])
    if stop_after == "unpack":
        return surfels, remap, add_mask

    # --- stage 3.5: refresh anchor weights (nodes.py:466-484) -------------
    surfels = recompute_surfel_weights(cfg, surfels, graph)
    if stop_after == "reweight":
        return surfels, remap, add_mask
    if not cfg.disable_adding_new_surfels:
        # The reweighted state has TWO consumers (the output state and
        # stage 4's packed dst bank): without a barrier XLA duplicates the
        # producing fusions -- incl. the pair-packed reweight gather --
        # into each consumer (measured: stage 4 in-situ 13.3 ms vs 6.0
        # standalone; the CLAUDE.md gather-duplication hazard).
        surfels = jax.lax.optimization_barrier(surfels)

    # --- stage 4: add unmatched candidates into free slots ----------------
    add_overflow = jnp.asarray(0, jnp.int32)
    free_exhausted = jnp.asarray(0, jnp.int32)
    if not cfg.disable_adding_new_surfels:
        surfels, add_overflow, free_exhausted = add_candidates(
            cfg, intr, surfels, graph, frame, add_mask, time)

    diag = FusionDiag(
        proj_overflow=n_overflow,
        add_overflow=add_overflow,
        free_exhausted=free_exhausted,
        dup_skipped=dup_skipped,
    )
    return surfels, remap, diag


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
