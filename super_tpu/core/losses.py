"""Residual / Jacobian stack for the warp-field optimization.

Derived-gradient faces (LM path) re-implement super/loss.py:207-505:
- DataLoss: point-to-plane ICP through projection + index-map bilinear
  sampling, with the full analytic chain rule
  (warp Jacobian -> pinhole dPi -> bilinear sampling gradient).
- ARAPLoss: per (node, neighbor) rigidity residual with +/-I translation
  blocks.
- RotLoss: quaternion-norm residual.

Design differences from the reference (TPU-first):
- No ragged compaction: every residual row exists at fixed capacity and is
  multiplied by a validity mask (invalid rows contribute exact zeros to
  JTJ / JTr -- the same normal equations as the reference's filtering).
- Surfel-dimension context arrays are feature-major (small axis leading;
  see core/state.py layout rule), and all per-surfel work streams through
  row-major chunks inside ``lax.scan`` so no (N, small) buffer is ever
  materialized.
- JTJ is assembled as node-pair 7x7 blocks into a dense
  (7 J_cap, 7 J_cap) matrix, via the tuple-grouped MXU reduction
  (core/assembly.py) or a direct scatter (reference semantics; tests).
- f32 instead of the reference's f64 (TPU has no native f64); tests compare
  against autodiff in f64 and f32-vs-f64 assemblies.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core import assembly
from super_tpu.core.state import FrameData, GraphState, SurfelState, gather_rows
from super_tpu.geometry.camera import Intrinsics, project_points
from super_tpu.geometry.quaternion import (
    blend_warp_jac,
    skew,
    transform_quat_t,
    transform_quat_t_jac,
)
from super_tpu.ops.bilinear import (
    bilinear_sample_bank_z,
    bilinear_sample_bank_z_fm,
    build_corner_bank_z,
)


class LMContext(NamedTuple):
    """Per-frame constants of the LM solve (reference: each loss's
    ``prepare``, super/loss.py:212-220,408-426,480-485).

    Surfel-dimension fields are feature-major; with the "tuple" assembly
    mode they are additionally stored in the tuple-sorted padded order of
    core/assembly.py (masks cover the padding) and ``layout`` carries the
    grouping structure.
    """

    # --- data term (surfel dim last) ---
    # Tuple mode stores only the PER-SURFEL fields that genuinely vary per
    # surfel (mask, weights, points); the anchor ids/positions are
    # tuple-uniform and live in the tiny (.., T) tables below -- skipping
    # the ~2.6M-index sf_knn/sf_knn_idx gathers the scatter mode pays
    # (chunks rebuild knn/diff by tuple broadcast, _geom_of).
    sf_mask: jnp.ndarray       # (Np,) active surfels
    sf_knn_w: jnp.ndarray      # (K, Np)
    sf_points: jnp.ndarray     # (3, Np) surfel points (padded slot order)
    sf_knn_idx: Optional[jnp.ndarray]  # (K, Np), scatter mode only
    sf_knn: Optional[jnp.ndarray]      # (K*3, Np) anchor positions g_i
    #   (k-major pack), scatter mode only
    sf_diff: Optional[jnp.ndarray]     # (K*3, Np) p - g_i, scatter only
    tuple_knn: Optional[jnp.ndarray]   # (K*3, T) per-tuple anchor positions
    #   (k-major pack), tuple mode only
    # --- target frame ---
    trg_points: jnp.ndarray    # (3, P) candidate points (pixel-indexed)
    trg_norms: jnp.ndarray     # (3, P)
    trg_index_map: jnp.ndarray  # (H, W)
    trg_corner_bank: jnp.ndarray  # (16, P) 4-corner [z, norm] blocks
    #   (ops/bilinear.py:build_corner_bank_z) -- the data-term sampler
    #   reads THIS at 1 gather index per query instead of 12, and
    #   reconstructs x/y bit-exactly from the corner pixel coordinate
    # --- ARAP term (graph-sized, row-major) ---
    ed_mask: jnp.ndarray       # (J,) active nodes
    ed_knn_idx: jnp.ndarray    # (J, K_ed)
    ed_pair_mask: jnp.ndarray  # (J, K_ed) both endpoints active
    d_eds: jnp.ndarray         # (J, K_ed, 3) g_i - g_j
    ed_skew: jnp.ndarray       # (J, K_ed, 3, 3)
    layout: Optional[assembly.TupleLayout]


class DataChunk(NamedTuple):
    """Row-major slice of the data-term inputs (chunk-sized)."""

    mask: jnp.ndarray     # (C,)
    knn_idx: jnp.ndarray  # (C, K)
    knn_w: jnp.ndarray    # (C, K)
    knn: jnp.ndarray      # (C, K, 3)
    diff: jnp.ndarray     # (C, K, 3)


def prepare_lm(cfg: SuPerConfig, surfels: SurfelState, graph: GraphState,
               frame: FrameData) -> LMContext:
    sol = cfg.solver
    sf_mask = surfels.active
    sf_knn_idx = surfels.knn_idx       # (K, N)
    sf_knn_w = surfels.knn_w
    sf_points = surfels.points         # (3, N)

    layout = None
    if sol.assembly_mode == "tuple" and cfg.num_neighbors == 4:
        pairs_fused = sol.linear_solver == "pairs_fused"
        extra_pairs = None
        if pairs_fused:
            # The sparse solve keeps the normal equations in distinct-pair
            # form, so the graph terms' pairs (ED edges + every node's
            # diagonal) must exist in the table even when no data tuple
            # produces them.
            j_cap = graph.capacity
            self_idx = jnp.arange(j_cap, dtype=jnp.int32)
            edges = jnp.stack([
                jnp.broadcast_to(self_idx[:, None],
                                 graph.knn_idx.shape).reshape(-1),
                graph.knn_idx.reshape(-1).astype(jnp.int32)], axis=1)
            diags = jnp.stack([self_idx, self_idx], axis=1)
            extra_pairs = jnp.concatenate([edges, diags], axis=0)
        layout = assembly.build_tuple_layout(
            surfels.knn_idx, surfels.active, graph.capacity,
            tuple_cap=sol.assembly_tuple_cap,
            pad_group=sol.assembly_pad_group,
            chunk=sol.assembly_chunk,
            pair_cap=(sol.assembly_pair_cap
                      if sol.assembly_expand == "pairs" or pairs_fused
                      else 0),
            extra_pairs=extra_pairs)
        if pairs_fused:
            j_cap = graph.capacity
            self_idx = jnp.arange(j_cap, dtype=jnp.int32)
            nb = graph.knn_idx.astype(jnp.int32)            # (J, K_ed)
            self_b = jnp.broadcast_to(self_idx[:, None], nb.shape)
            pk = layout.pair_key
            layout = layout._replace(
                diag_rank=assembly.pair_rank_lookup(
                    pk, j_cap, jnp.stack([self_idx, self_idx], -1)),
                arap_rank=jnp.stack([
                    assembly.pair_rank_lookup(
                        pk, j_cap, jnp.stack([nb, nb], -1)),
                    assembly.pair_rank_lookup(
                        pk, j_cap, jnp.stack([self_b, self_b], -1)),
                    assembly.pair_rank_lookup(
                        pk, j_cap, jnp.stack([nb, self_b], -1)),
                ], axis=-1),
                arap_swap=self_b < nb)
        # ONE packed bank for [active, knn_w(K), points(3)], permuted to
        # sorted order then sliced to padded slots: composing two packed
        # gathers replaces the old dedicated 1-row src_of gather + packed
        # gather (gathers pay ~1 ms fixed per op at this index count, and
        # a 1-row gather costs nearly as much as an 8-row one).
        bank = jnp.concatenate([
            surfels.active[None].astype(surfels.points.dtype),
            surfels.knn_w, surfels.points])
        packed = gather_rows(gather_rows(bank, layout.sort_perm),
                             layout.src_pos)
        k_anchors = surfels.knn_w.shape[0]
        sf_mask = layout.slot_valid & (packed[0] > 0.5)
        sf_knn_w = packed[1:1 + k_anchors]
        sf_points = packed[1 + k_anchors:4 + k_anchors]

    gp_t = graph.points.T              # (3, J)
    k = sf_knn_idx.shape[0]
    if layout is not None:
        # Anchor ids/positions are tuple-uniform: a (K*3, T) table replaces
        # the (K*3, Np)/(K, Np) per-surfel gathers (~2.6M gather indices at
        # 480p, ~7 ms of prepare); chunks broadcast per G-block (_geom_of).
        tk = jnp.take(gp_t, layout.tuple_nodes.T, axis=-1)  # (3, K, T)
        tuple_knn = jnp.moveaxis(tk, 0, 1).reshape(
            3 * k, layout.tuple_nodes.shape[0])
        sf_knn_idx = None
        sf_knn = None
        sf_diff = None
    else:
        tuple_knn = None
        # Packed anchors: row k*3+d of sf_knn is coordinate d of anchor k.
        npts = sf_knn_idx.shape[-1]
        sf_knn = jnp.take(gp_t, sf_knn_idx, axis=-1)  # (3, K, Np), 1 gather
        sf_knn = jnp.moveaxis(sf_knn, 0, 1).reshape(3 * k, npts)  # k-major
        sf_diff = jnp.tile(sf_points, (k, 1)) - sf_knn

    ed_knn_idx = graph.knn_idx
    d_eds = graph.points[:, None, :] - graph.points[ed_knn_idx]
    ed_pair_mask = graph.active[:, None] & graph.active[ed_knn_idx]
    index_map = frame.index_map(cfg.height, cfg.width)
    return LMContext(
        sf_mask=sf_mask,
        sf_knn_idx=sf_knn_idx,
        sf_knn_w=sf_knn_w,
        sf_points=sf_points,
        sf_knn=sf_knn,
        sf_diff=sf_diff,
        tuple_knn=tuple_knn,
        trg_points=frame.points,
        trg_norms=frame.norms,
        trg_index_map=index_map,
        trg_corner_bank=build_corner_bank_z(frame.points, frame.norms,
                                            index_map),
        ed_mask=graph.active,
        ed_knn_idx=ed_knn_idx,
        ed_pair_mask=ed_pair_mask,
        d_eds=d_eds,
        ed_skew=skew(d_eds),
        layout=layout,
    )


def _chunk_xs(ctx: LMContext, chunk: int):
    """Reshape the surfel-dim context into scan inputs of row chunks.

    Returns xs pytree with leading dim num_chunks; bodies convert to
    row-major DataChunk views (conversions stay fusion-internal).  In tuple
    layout mode the per-chunk G-block tuple ids ride along (6th element) so
    bodies can fetch beta by tuple broadcast instead of a per-surfel gather.
    """
    np_cap = ctx.sf_mask.shape[0]
    assert np_cap % chunk == 0, (np_cap, chunk)
    nc = np_cap // chunk

    def split(a):  # (F, Np) -> (nc, F, C)
        return jnp.moveaxis(a.reshape(a.shape[0], nc, chunk), 1, 0)

    if ctx.layout is not None:
        bpc = chunk // ctx.layout.pad_group_of(np_cap)
        bt = ctx.layout.block_tuple.reshape(nc, bpc)
        # Tuple mode: anchors ride as per-block tuple ids (bt); chunks
        # rebuild knn/diff by broadcast from ctx.tuple_knn (_geom_of).
        return (
            ctx.sf_mask.reshape(nc, chunk),
            split(ctx.sf_knn_w),
            split(ctx.sf_points),
            bt,
        ), nc
    bt = jnp.zeros((nc, 1), jnp.int32)
    return (
        ctx.sf_mask.reshape(nc, chunk),
        split(ctx.sf_knn_idx),
        split(ctx.sf_knn_w),
        split(ctx.sf_knn),
        split(ctx.sf_diff),
        bt,
    ), nc


def _beta_k_of(ctx: LMContext, beta_t, xs_elem):
    """Per-anchor parameters (C, K, 7) for one chunk.

    Tuple layout: G-blocks are tuple-pure, so beta is fetched once per
    tuple ((T, K, 7) ``beta_t``) and broadcast per block -- ~20x fewer
    gather indices than the per-surfel ``beta[knn_idx]`` (which costs
    ~7 ms/iteration at 480p).  Scatter mode falls back to the row gather.
    """
    c = xs_elem[0].shape[-1]
    if beta_t is None:
        return None  # caller gathers from beta via chunk.knn_idx
    bt_c = xs_elem[-1]                     # (C / G,)
    bb = beta_t[bt_c]                      # (C/G, K, 7)
    k = bb.shape[-2]
    g = c // bt_c.shape[-1]
    return jnp.broadcast_to(bb[:, None], (bb.shape[0], g, k, 7)
                            ).reshape(c, k, 7)


def _chunk_view(xs_elem) -> DataChunk:
    mask, idx_fm, w_fm, knn_fm, diff_fm = xs_elem[:5]
    c = mask.shape[-1]
    # Packed (K*3, C) rows are k-major, so (C, K*3) -> (C, K, 3) is exact.
    return DataChunk(
        mask=mask,
        knn_idx=idx_fm.T,                      # (C, K)
        knn_w=w_fm.T,
        knn=knn_fm.T.reshape(c, -1, 3),
        diff=diff_fm.T.reshape(c, -1, 3),
    )


def _project_and_sample(cfg: SuPerConfig, ctx: LMContext, chunk: DataChunk,
                        trans_points, intr: Intrinsics, grad: bool):
    """Project warped chunk surfels, gate on frame validity, bilinear-sample
    the target point/normal maps (loss.py:228-245)."""
    h, w = cfg.height, cfg.width
    v, u, _, proj_valid = project_points(trans_points.T, intr, h, w)
    # The reference's index-map-at-rounded-pixel check (loss.py:241) is
    # implied: the rounded pixel IS one of the 4 bilinear corners, and
    # ``svalid`` below already requires all 4 corners valid -- so the
    # 1-row index_map gather (~3.5 ms at 480p) is dropped, mask unchanged.
    new_points, new_norms, svalid, dpdpi, dndpi = bilinear_sample_bank_z(
        ctx.trg_corner_bank, intr, h, w, v, u, compute_grad=grad)
    mask = chunk.mask & proj_valid & svalid
    return new_points, new_norms, dpdpi, dndpi, mask


class Assoc(NamedTuple):
    """Frozen per-frame data association (association="per_frame").

    Classical projective ICP: the target point/normal each surfel pairs with
    is fixed for the frame's solve; LM iterations re-linearize only the warp.
    """

    o: jnp.ndarray      # (3, Np) associated target points
    n: jnp.ndarray      # (3, Np) associated target normals
    mask: jnp.ndarray   # (Np,) association validity


def _geom_of(ctx: LMContext, xs_elem):
    """Per-chunk geometry: (mask (C,), w_fm (K, C), knn_fm (3K, C),
    diff_fm (3K, C)).

    Tuple mode carries only (mask, w, points, block-tuple ids) per chunk;
    the anchor positions broadcast from the tiny per-tuple table
    (ctx.tuple_knn) -- G-blocks are tuple-pure -- and diff is recomputed
    in-chunk (fused elementwise, cheaper than the per-surfel gathers the
    scatter mode pays in prepare_lm)."""
    if len(xs_elem) == 4:
        mask, w_fm, pts, bt_c = xs_elem
        c = mask.shape[-1]
        b = bt_c.shape[-1]
        g = c // b
        kn_b = ctx.tuple_knn[:, bt_c]                   # (3K, B)
        knn_fm = jnp.broadcast_to(
            kn_b[:, :, None], (kn_b.shape[0], b, g)).reshape(
                kn_b.shape[0], c)
        k = w_fm.shape[0]
        diff_fm = jnp.tile(pts, (k, 1)) - knn_fm
        return mask, w_fm, knn_fm, diff_fm
    mask, _, w_fm, knn_fm, diff_fm = xs_elem[:5]
    return mask, w_fm, knn_fm, diff_fm


def _blend_warp_fm(geom, beta_kfm):
    """Feature-major blended warp of one chunk: (3, C) warped points.

    ``beta_kfm=None`` means the identity warp, where the blend collapses to
    ``sum_k w_k (diff_k + g_k)`` (the surfel point itself under normalized
    weights) -- no quaternion math at all.
    """
    _, w_fm, knn_fm, diff_fm = geom
    k = w_fm.shape[0]
    if beta_kfm is None:
        _, _, rep3, _ = _k_perms(k)
        s = w_fm[rep3] * (diff_fm + knn_fm)
        return jnp.sum(s.reshape(k, 3, s.shape[-1]), axis=0)
    return _warp_fm_batched(w_fm, knn_fm, diff_fm, beta_kfm)


def associate(cfg: SuPerConfig, ctx: LMContext, beta, intr: Intrinsics,
              identity: bool = False) -> Assoc:
    """One projective-association pass at the given beta (chunk-streamed,
    feature-major end to end).

    ``identity=True`` skips the warp math entirely: at the identity warp
    the blended transform returns the surfel point itself
    (sum_k w_k (diff_k + g_k) with normalized weights), so the pass is just
    projection + sampling."""
    # Chunked only to skip the sink/padding suffix (live_end): the pass is
    # gather-bound and its intermediates are (3, Np) slims, so the chunk
    # size is large (4x the assembly chunk) to keep loop glue negligible.
    np_cap = ctx.sf_mask.shape[0]
    chunk = _sampling_chunk_size(ctx)
    xs, nc = _chunk_xs(ctx, chunk)
    beta_t = (beta[ctx.layout.tuple_nodes] if ctx.layout is not None
              and not identity else None)
    h, w = cfg.height, cfg.width

    def one(xs_elem):
        if identity:
            tp = _blend_warp_fm(_geom_of(ctx, xs_elem), None)
        elif beta_t is not None:
            tp = _blend_warp_fm(_geom_of(ctx, xs_elem),
                                _beta_fm_of(beta_t, xs_elem))
        else:  # scatter-mode fallback: per-surfel gather, row-major math
            cv = _chunk_view(xs_elem)
            tpr = transform_quat_t(cv.diff, beta[cv.knn_idx])
            tp = jnp.sum(cv.knn_w[..., None] * (tpr + cv.knn), axis=-2).T
        v, u, _, proj_valid = project_points(tp, intr, h, w)
        # Center-pixel index-map check implied by the all-4-corner validity
        # of the bank sample (see _project_and_sample).
        o, n, svalid = bilinear_sample_bank_z_fm(ctx.trg_corner_bank, intr,
                                                 h, w, v, u)
        mask = xs_elem[0] & proj_valid & svalid
        return o, n, mask  # (3, C), (3, C), (C,)

    if nc == 1:
        o, n, m = one(jax.tree.map(lambda a: a[0], xs))
        return Assoc(o=o, n=n, mask=m)

    nc_live = _live_chunk_count(ctx, nc, chunk)
    if nc_live is not None:
        # Skipped sink/padding chunks stay zero => mask False, as the
        # full pass would compute for those slots.
        init = (jnp.zeros((nc, 3, chunk), ctx.sf_points.dtype),
                jnp.zeros((nc, 3, chunk), ctx.sf_points.dtype),
                jnp.zeros((nc, chunk), bool))

        def fbody(i, carry):
            os, ns, ms = carry
            o, n, m = one(_take_chunk(xs, i))
            upd = jax.lax.dynamic_update_index_in_dim
            return (upd(os, o, i, 0), upd(ns, n, i, 0), upd(ms, m, i, 0))

        os, ns, ms = jax.lax.fori_loop(0, nc_live, fbody, init)
    else:
        def body(_, xs_elem):
            return None, one(xs_elem)

        _, (os, ns, ms) = jax.lax.scan(body, None, xs)
    return Assoc(o=jnp.moveaxis(os, 0, 1).reshape(3, np_cap),
                 n=jnp.moveaxis(ns, 0, 1).reshape(3, np_cap),
                 mask=ms.reshape(-1))


def _assoc_chunk_xs(assoc: Assoc, chunk: int):
    nc = assoc.mask.shape[0] // chunk

    def split(a):
        return jnp.moveaxis(a.reshape(a.shape[0], nc, chunk), 1, 0)

    return (split(assoc.o), split(assoc.n), assoc.mask.reshape(nc, chunk))


def frozen_chunk_residual(chunk: DataChunk, o_fm, n_fm, amask, beta_k,
                          weight: float):
    """r = lambda n^T (T(p) - o) with frozen (o, n); beta_k: (C, K, 7)."""
    tp = transform_quat_t(chunk.diff, beta_k)
    tp = jnp.sum(chunk.knn_w[..., None] * (tp + chunk.knn), axis=-2)
    mask = chunk.mask & amask
    r = weight * jnp.sum(n_fm.T * (tp - o_fm.T), axis=-1)
    return jnp.where(mask, r, 0.0), mask


def _cross_fm(x, y):
    """Cross product of feature-major (3, N) vectors."""
    return jnp.stack([x[1] * y[2] - x[2] * y[1],
                      x[2] * y[0] - x[0] * y[2],
                      x[0] * y[1] - x[1] * y[0]])


def _k_perms(k: int):
    """Static index constants for the all-anchor batched row math.

    ``p1/p2`` make an anchor-blocked cross product out of one (3K, C)
    multiply pair; ``rep3`` repeats per-anchor scalars onto their 3 rows;
    ``hperm`` reorders the [hw (K); hv (3K); hn (3K)] stack into the
    anchor-major [ndqw, ndqv(3), n(3)] row convention of the Gram/assembly
    stages.
    """
    import numpy as np
    p1 = np.asarray([3 * a + (i + 1) % 3 for a in range(k) for i in range(3)])
    p2 = np.asarray([3 * a + (i + 2) % 3 for a in range(k) for i in range(3)])
    rep3 = np.asarray([a for a in range(k) for _ in range(3)])
    hperm = np.asarray([x for a in range(k)
                        for x in (a,
                                  k + 3 * a, k + 3 * a + 1, k + 3 * a + 2,
                                  4 * k + 3 * a, 4 * k + 3 * a + 1,
                                  4 * k + 3 * a + 2)])
    return p1, p2, rep3, hperm


def _cross_batched(x, y, p1, p2):
    """Anchor-blocked cross product on (3K, C) stacks (rows 3a..3a+2 of the
    result = x_a cross y_a)."""
    return x[p1] * y[p2] - x[p2] * y[p1]


def _gsum3(x, k):
    """(3K, C) -> (K, C): sum each anchor's 3 rows (a dot product whose
    operands were formed on the full (3K, C) stack)."""
    return jnp.sum(x.reshape(k, 3, x.shape[-1]), axis=1)


def _warp_fm_batched(w_fm, knn_fm, diff_fm, beta_kfm):
    """Blended dual-quaternion warp with all K anchors batched: one
    (3K, C) rotation instead of K unrolled (3, C) passes.

    Value-identical to the K-loop of :func:`_blend_warp_fm` modulo fp
    reassociation; the (3, C) per-anchor math uses 3 of 8 sublanes per
    vector register, the (3K, C) form 3K/8ceil (12/16 at K = 4).
    """
    k = w_fm.shape[0]
    p1, p2, rep3, _ = _k_perms(k)
    v = diff_fm                                        # (3K, C)
    qw = beta_kfm[:, 0][rep3]                          # (3K, C)
    qv = beta_kfm[:, 1:4].reshape(3 * k, -1)
    bb = beta_kfm[:, 4:7].reshape(3 * k, -1)
    c = _cross_batched(qv, v, p1, p2)
    tv = v + 2.0 * qw * c + 2.0 * _cross_batched(qv, c, p1, p2) + bb
    s = w_fm[rep3] * (tv + knn_fm)
    return jnp.sum(s.reshape(k, 3, s.shape[-1]), axis=0)


def _rows_fm_batched(m_fm, w_fm, diff_fm, beta_kfm):
    """Point-plane gradient rows with all K anchors batched.

    ``m_fm`` (3, C) is the effective row normal (frozen association: the
    sampled target normal; moving: see moving_chunk_partial_fm).  Returns
    the (7K, C) rows in the anchor-major [ndqw, ndqv(3), w m(3)] order the
    Gram stage consumes, weights already applied.

    Same identities as the K-unrolled loop this replaces (n^T dT/dq formed
    directly, frozen_chunk_jacobian docstring); batching the anchors into
    (3K, C) stacks raises VPU sublane utilization from 3/8 to 12/16 at
    K = 4 (~2x on the rows-only pass, scripts/microbench_jac.py fm/fm12).
    The warp's cross products are the same subexpressions as
    :func:`_warp_fm_batched`'s, so XLA CSE merges the two passes.
    """
    k = w_fm.shape[0]
    p1, p2, rep3, hperm = _k_perms(k)
    v = diff_fm                                        # (3K, C)
    qw = beta_kfm[:, 0][rep3]
    qv = beta_kfm[:, 1:4].reshape(3 * k, -1)
    m_b = jnp.tile(m_fm, (k, 1))                       # (3K, C)
    c = _cross_batched(qv, v, p1, p2)
    ndq_w = 2.0 * _gsum3(m_b * c, k)                   # (K, C)
    qv_v = _gsum3(qv * v, k)
    m_qv = _gsum3(m_b * qv, k)
    m_v = _gsum3(m_b * v, k)
    nxv = _cross_batched(m_b, v, p1, p2)
    ndq_v = 2.0 * (qv_v[rep3] * m_b + m_qv[rep3] * v
                   - 2.0 * m_v[rep3] * qv - qw * nxv)  # (3K, C)
    w12 = w_fm[rep3]
    return jnp.concatenate([w_fm * ndq_w, w12 * ndq_v, w12 * m_b],
                           axis=0)[hperm]              # (7K, C)


def _beta_fm_of(beta_t, xs_elem):
    """Tuple-broadcast anchor parameters, feature-major: (K, 7, C).

    Same values as :func:`_beta_k_of` (G-blocks are tuple-pure), laid out
    with the surfel dim LAST so the frozen-jacobian math stays lane-aligned.
    """
    bt_c = xs_elem[-1]                     # (C / G,)
    bb = beta_t[bt_c]                      # (B, K, 7)
    b_, k = bb.shape[0], bb.shape[1]
    g = xs_elem[0].shape[-1] // b_
    return jnp.broadcast_to(jnp.transpose(bb, (1, 2, 0))[..., None],
                            (k, 7, b_, g)).reshape(k, 7, b_ * g)


def frozen_chunk_partial_fm(geom, o_fm, n_fm, amask, beta_kfm,
                            weight: float, g_per: int,
                            jac_dtype=None):
    """Feature-major frozen jacobian -> per-G-block partial Grams.

    Value-identical (modulo fp reassociation) to frozen_chunk_jacobian +
    the (C, 28) gram einsum, but every buffer keeps the surfel dim LAST:
    the row-major (C, K, 3)/(C, K, 7) intermediates pad their trailing
    dims to (8, 128) TPU tiles at materialization boundaries (~85x), which
    costs ~40% of the pass (scripts/microbench_jac.py: 3.7 -> 2.2 ms at
    480p).  The K anchors are batched into (3K, C) stacks
    (_rows_fm_batched) rather than unrolled in Python.

    ``jac_dtype=jnp.bfloat16`` (solver.jac_dtype="bf16") runs the ROW math
    and the Gram einsum in bf16 (2x VPU lanes, 4x MXU) with f32
    accumulation; the residual r (and the warp it needs) stays f32, so the
    LM cost / accept-reject ladder keeps full precision -- only the
    normal-equation entries carry bf16 rounding, which the damped solve
    absorbs like the bf16 gram segment sums the headline config already
    uses.

    Returns (partial (C/G, 28*29) f32, sum(r^2)).
    """
    mask_c, w_fm, knn_fm, diff_fm = geom
    cdim = mask_c.shape[-1]
    tp = _warp_fm_batched(w_fm, knn_fm, diff_fm, beta_kfm)
    mask = mask_c & amask
    r = weight * jnp.sum(n_fm * (tp - o_fm), 0)
    r = jnp.where(mask, r, 0.0)
    nb = cdim // g_per
    if jac_dtype is not None and jac_dtype != w_fm.dtype:
        bf = jac_dtype
        rows = _rows_fm_batched(
            jnp.broadcast_to(n_fm, (3, cdim)).astype(bf),
            w_fm.astype(bf), diff_fm.astype(bf), beta_kfm.astype(bf))
        h = jnp.where(mask[None], jnp.asarray(weight, bf) * rows,
                      jnp.asarray(0.0, bf))
        hb = h.reshape(28, nb, g_per)
        ext = jnp.concatenate([hb, r.astype(bf).reshape(1, nb, g_per)],
                              axis=0)
        part = jnp.einsum("ing,jng->nij", hb, ext,
                          preferred_element_type=jnp.float32)
        return part.reshape(nb, 28 * 29).astype(r.dtype), jnp.sum(r * r)
    rows = _rows_fm_batched(jnp.broadcast_to(n_fm, (3, cdim)), w_fm,
                            diff_fm, beta_kfm)
    h = jnp.where(mask[None], weight * rows, 0.0)
    hb = h.reshape(28, nb, g_per)
    ext = jnp.concatenate([hb, r.reshape(1, nb, g_per)], axis=0)
    part = jnp.einsum("ing,jng->nij", hb, ext)         # (nb, 28, 29)
    return part.reshape(nb, 28 * 29), jnp.sum(r * r)


def _project_sample_fm(cfg, ctx, tp, mask_c, intr, grad: bool):
    """Project (3, C) warped points + sample the corner bank, feature-major.

    Returns (o, n, mask[, go_u, go_v, gn_u, gn_v]) -- all (3, C) / (C,).
    """
    h, w = cfg.height, cfg.width
    v, u, _, proj_valid = project_points(tp, intr, h, w)
    # Center-pixel index-map check implied by the all-4-corner validity of
    # the bank sample (see _project_and_sample).
    out = bilinear_sample_bank_z_fm(ctx.trg_corner_bank, intr, h, w, v, u,
                                    compute_grad=grad)
    mask = mask_c & proj_valid & out[2]
    return (out[0], out[1], mask) + out[3:]


def moving_chunk_partial_fm(cfg, ctx, geom, beta_kfm, intr,
                            weight: float, g_per: int):
    """Feature-major per-iteration (moving-target) jacobian -> partial
    Grams.

    The full chain of data_chunk_jacobian collapses algebraically: with
    dpdt = dpdpi dpi and dndt = dndpi dpi,

      g_k = n^T (jac_k - dpdt jac_k) + (tp-o)^T dndt jac_k  [+ b-columns]
          = m^T jac_k,   m := n + dpi^T [(tp-o)@dndpi - n@dpdpi]

    so the moving-target gradient rows are the FROZEN-association identity
    rows evaluated with the effective normal ``m`` (b-columns w_k m), and
    the whole pass stays lane-aligned feature-major.  Value-identical to
    data_chunk_jacobian + the gram einsum modulo fp reassociation
    (tests/test_lm.py autodiff cross-checks).

    Returns (partial (C/G, 28*29), sum(r^2)).
    """
    mask_c, w_fm, knn_fm, diff_fm = geom
    cdim = mask_c.shape[-1]
    tp = _blend_warp_fm(geom, beta_kfm)
    o, n, mask, go_u, go_v, gn_u, gn_v = _project_sample_fm(
        cfg, ctx, tp, mask_c, intr, grad=True)
    d = tp - o
    # dpi^T y for y = [(d . gn) - (n . go)] over the two image axes.
    y0 = jnp.sum(d * gn_u, 0) - jnp.sum(n * go_u, 0)
    y1 = jnp.sum(d * gn_v, 0) - jnp.sum(n * go_v, 0)
    z = tp[2] + 1e-8
    m = jnp.stack([
        n[0] + intr.fx / z * y0,
        n[1] + intr.fy / z * y1,
        n[2] - intr.fx * tp[0] / (z * z) * y0
            - intr.fy * tp[1] / (z * z) * y1,
    ])
    r = weight * jnp.sum(n * d, 0)
    r = jnp.where(mask, r, 0.0)

    h_rows = jnp.where(mask[None],
                       weight * _rows_fm_batched(m, w_fm, diff_fm,
                                                 beta_kfm), 0.0)
    nb = cdim // g_per
    hb = h_rows.reshape(28, nb, g_per)
    ext = jnp.concatenate([hb, r.reshape(1, nb, g_per)], axis=0)
    part = jnp.einsum("ing,jng->nij", hb, ext)
    return part.reshape(nb, 28 * 29), jnp.sum(r * r)


def moving_mix_pass(cfg, ctx, beta_t, intr, weight: float):
    """Big-chunk sampling pass of the per-iteration (moving-target) mode.

    Splitting the moving assembly in two fixes a fixed-cost pathology: the
    corner-bank gather pays ~1 ms per OP regardless of size, so running it
    inside every 64k assembly chunk costs nc x the fixed cost (6 x at
    480p).  This pass runs associate()-sized chunks (ONE gather per 256k
    surfels), computes the effective normal ``m`` and the weighted masked
    residual ``r`` (moving_chunk_partial_fm's algebra, same values), and
    the assembly then consumes (m, r, mask) exactly like a frozen
    association -- no per-chunk sampling at all.

    Returns (m (3, Np), r (Np,), mask (Np,)).
    """
    np_cap = ctx.sf_mask.shape[0]
    chunk = _sampling_chunk_size(ctx)
    xs, nc = _chunk_xs(ctx, chunk)

    def one(xs_elem):
        geom = _geom_of(ctx, xs_elem)
        beta_kfm = _beta_fm_of(beta_t, xs_elem)
        tp = _blend_warp_fm(geom, beta_kfm)
        o, n, mask, go_u, go_v, gn_u, gn_v = _project_sample_fm(
            cfg, ctx, tp, geom[0], intr, grad=True)
        d = tp - o
        y0 = jnp.sum(d * gn_u, 0) - jnp.sum(n * go_u, 0)
        y1 = jnp.sum(d * gn_v, 0) - jnp.sum(n * go_v, 0)
        z = tp[2] + 1e-8
        m = jnp.stack([
            n[0] + intr.fx / z * y0,
            n[1] + intr.fy / z * y1,
            n[2] - intr.fx * tp[0] / (z * z) * y0
                - intr.fy * tp[1] / (z * z) * y1,
        ])
        r = weight * jnp.sum(n * d, 0)
        return m, jnp.where(mask, r, 0.0), mask

    if nc == 1:
        m, r, mask = one(jax.tree.map(lambda a: a[0], xs))
        return m, r, mask

    nc_live = _live_chunk_count(ctx, nc, chunk)
    if nc_live is not None:
        init = (jnp.zeros((nc, 3, chunk), ctx.sf_points.dtype),
                jnp.zeros((nc, chunk), ctx.sf_points.dtype),
                jnp.zeros((nc, chunk), bool))

        def fbody(i, carry):
            ms, rs, ks = carry
            m, r, k = one(_take_chunk(xs, i))
            upd = jax.lax.dynamic_update_index_in_dim
            return (upd(ms, m, i, 0), upd(rs, r, i, 0), upd(ks, k, i, 0))

        ms, rs, ks = jax.lax.fori_loop(0, nc_live, fbody, init)
    else:
        _, (ms, rs, ks) = jax.lax.scan(
            lambda c, e: (c, one(e)), None, xs)
    return (jnp.moveaxis(ms, 0, 1).reshape(3, np_cap), rs.reshape(-1),
            ks.reshape(-1))


def premixed_chunk_partial_fm(geom, m_fm, r, mask, beta_kfm, weight: float,
                              g_per: int):
    """Assembly consumer of :func:`moving_mix_pass` chunks: identical
    row/Gram math to moving_chunk_partial_fm with (m, r, mask) streamed in
    instead of resampled.  Returns (partial (C/G, 28*29), sum(r^2))."""
    _, w_fm, _, diff_fm = geom
    cdim = mask.shape[-1]
    h = jnp.where(mask[None],
                  weight * _rows_fm_batched(m_fm, w_fm, diff_fm, beta_kfm),
                  0.0)
    nb = cdim // g_per
    hb = h.reshape(28, nb, g_per)
    ext = jnp.concatenate([hb, r.reshape(1, nb, g_per)], axis=0)
    part = jnp.einsum("ing,jng->nij", hb, ext)
    return part.reshape(nb, 28 * 29), jnp.sum(r * r)


def frozen_chunk_jacobian(chunk: DataChunk, o_fm, n_fm, amask, beta_k,
                          weight: float):
    """Frozen-association residual + gradient rows.

    dr/dq_k = n^T d(warp)/dq_k (the moving-target terms of the full chain
    vanish when the association is frozen); dr/db_k = w_k n.  The row
    n^T dT/dq is formed directly from vector identities instead of
    materializing the (C, K, 3, 4) Jacobian:
      n^T dT/dqw = 2 n.(qv x v)
      n^T dT/dqv = 2 [ (qv.v) n + (n.qv) v - 2 (n.v) qv - qw (n x v) ]
    (the transpose-contraction of super/utils.py:59-69's d_qv).
    beta_k: (C, K, 7) per-anchor parameters (gathered or tuple-broadcast).
    """
    qw = beta_k[..., 0:1]
    qv = beta_k[..., 1:4]
    v = chunk.diff                                      # (C, K, 3)
    c = jnp.cross(qv, v)
    tp = v + 2.0 * qw * c + 2.0 * jnp.cross(qv, c) + beta_k[..., 4:7]
    tp = jnp.sum(chunk.knn_w[..., None] * (tp + chunk.knn), axis=-2)

    n_rm = n_fm.T                                       # (C, 3)
    mask = chunk.mask & amask
    r = weight * jnp.sum(n_rm * (tp - o_fm.T), axis=-1)

    nk = n_rm[:, None, :]                               # (C, 1, 3)
    g_qw = 2.0 * jnp.sum(nk * c, axis=-1, keepdims=True)           # (C,K,1)
    qv_v = jnp.sum(qv * v, axis=-1, keepdims=True)
    n_qv = jnp.sum(nk * qv, axis=-1, keepdims=True)
    n_v = jnp.sum(nk * v, axis=-1, keepdims=True)
    g_qv = 2.0 * (qv_v * nk + n_qv * v - 2.0 * n_v * qv
                  - qw * jnp.cross(nk + 0.0 * v, v))               # (C,K,3)
    w4 = chunk.knn_w[..., None]
    g = jnp.concatenate([w4 * g_qw, w4 * g_qv, w4 * nk + 0.0 * v],
                        axis=-1)                                    # (C,K,7)
    r = jnp.where(mask, r, 0.0)
    g = jnp.where(mask[:, None, None], weight * g, 0.0)
    return r, g, mask


def data_chunk_residual(cfg: SuPerConfig, ctx: LMContext, chunk: DataChunk,
                        beta_k, intr: Intrinsics, weight: float):
    """Masked residual vector lambda * n^T (T(p) - o) for one chunk."""
    trans_points = transform_quat_t(chunk.diff, beta_k)
    trans_points = jnp.sum(chunk.knn_w[..., None] * (trans_points + chunk.knn),
                           axis=-2)
    new_points, new_norms, _, _, mask = _project_and_sample(
        cfg, ctx, chunk, trans_points, intr, grad=False)
    r = weight * jnp.sum(new_norms * (trans_points - new_points), axis=-1)
    return jnp.where(mask, r, 0.0), mask


def data_chunk_jacobian(cfg: SuPerConfig, ctx: LMContext, chunk: DataChunk,
                        beta_k, intr: Intrinsics, weight: float):
    """Residual + per-anchor 7-dim gradient rows for one chunk.

    Returns (r (C,), g (C, K, 7), mask (C,)); rows zeroed where masked.
    Parity: DataLoss.forward grad=True (loss.py:250-288).
    """
    skew_v = skew(chunk.diff)
    trans_points, jac = blend_warp_jac(
        chunk.diff, chunk.knn, beta_k, chunk.knn_w,
        skew_v=skew_v)  # jac: (C, K, 3, 4), knn_w-weighted
    new_points, new_norms, dpdpi, dndpi, mask = _project_and_sample(
        cfg, ctx, chunk, trans_points, intr, grad=True)

    pt_diff = trans_points - new_points

    # dPi: d(u, v)/d(xyz) of the pinhole projection (loss.py:160-173).
    z = trans_points[..., 2] + 1e-8
    zero = jnp.zeros_like(z)
    dpi = jnp.stack(
        [
            jnp.stack([intr.fx / z, zero,
                       -intr.fx * trans_points[..., 0] / (z * z)], axis=-1),
            jnp.stack([zero, intr.fy / z,
                       -intr.fy * trans_points[..., 1] / (z * z)], axis=-1),
        ],
        axis=-2,
    )  # (C, 2, 3)

    dpdt = dpdpi @ dpi  # (C, 3, 3): d(sampled target point)/d(warped point)
    dndt = dndpi @ dpi

    w4 = chunk.knn_w[..., None, None]  # (C, K, 1, 1)
    dndq = dndt[:, None] @ jac  # (C, K, 3, 4)
    dndq = jnp.concatenate(
        [dndq, w4 * jnp.broadcast_to(dndt[:, None], dndq.shape[:2] + (3, 3))],
        axis=-1)
    dpdq = jac - dpdt[:, None] @ jac
    eye3 = jnp.eye(3, dtype=beta_k.dtype)
    dpdq_b = w4 * (eye3 - dpdt[:, None])
    dpdq = jnp.concatenate([dpdq, dpdq_b], axis=-1)  # (C, K, 3, 7)

    g = (new_norms[:, None, None, :] @ dpdq)[..., 0, :] \
        + (pt_diff[:, None, None, :] @ dndq)[..., 0, :]  # (C, K, 7)

    r = jnp.where(mask, weight * jnp.sum(new_norms * pt_diff, axis=-1), 0.0)
    g = jnp.where(mask[:, None, None], weight * g, 0.0)
    return r, g, mask


def _residual_of(cfg, ctx, beta, beta_t, intr, weight, xs_elem, assoc_elem):
    if beta_t is not None:
        # Tuple layout: lane-aligned feature-major residual passes.
        geom = _geom_of(ctx, xs_elem)
        beta_kfm = _beta_fm_of(beta_t, xs_elem)
        tp = _blend_warp_fm(geom, beta_kfm)
        if assoc_elem is None:
            o, n, mask = _project_sample_fm(cfg, ctx, tp, geom[0], intr,
                                            grad=False)
        else:
            o, n, am = assoc_elem
            mask = geom[0] & am
        r = weight * jnp.sum(n * (tp - o), 0)
        return jnp.where(mask, r, 0.0), mask
    cv = _chunk_view(xs_elem)
    beta_k = beta[cv.knn_idx]
    if assoc_elem is None:
        return data_chunk_residual(cfg, ctx, cv, beta_k, intr, weight)
    o, n, am = assoc_elem
    return frozen_chunk_residual(cv, o, n, am, beta_k, weight)


def data_term_residual(cfg: SuPerConfig, ctx: LMContext, beta,
                       intr: Intrinsics, weight: float, assoc=None):
    """Full masked residual vector (Np,) -- streamed in chunks.  Used by the
    autodiff parity tests; the solver itself only consumes sums."""
    chunk = _cost_chunk_size(cfg, ctx)
    xs, nc = _chunk_xs(ctx, chunk)
    axs = None if assoc is None else _assoc_chunk_xs(assoc, chunk)
    beta_t = beta[ctx.layout.tuple_nodes] if ctx.layout is not None else None
    if nc == 1:
        take0 = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
        return _residual_of(cfg, ctx, beta, beta_t, intr, weight, take0(xs),
                            None if axs is None else take0(axs))

    def body(_, elems):
        xs_elem, assoc_elem = elems
        return None, _residual_of(cfg, ctx, beta, beta_t, intr, weight,
                                  xs_elem, assoc_elem)

    _, (rs, masks) = jax.lax.scan(body, None, (xs, axs))
    return rs.reshape(-1), masks.reshape(-1)


def data_term_cost(cfg: SuPerConfig, ctx: LMContext, beta, intr: Intrinsics,
                   weight: float, assoc=None):
    """Scalar cost sum((lambda * r)^2) of the point-plane term, streamed in
    chunks (loss.py:222-248,289-290 grad=False path).

    Without a frozen association the pass samples the corner bank, so it
    runs sampling-sized chunks (fewest ~1 ms fixed-cost gathers)."""
    chunk = (_cost_chunk_size(cfg, ctx) if assoc is not None
             else _sampling_chunk_size(ctx))
    xs, nc = _chunk_xs(ctx, chunk)
    axs = None if assoc is None else _assoc_chunk_xs(assoc, chunk)
    beta_t = beta[ctx.layout.tuple_nodes] if ctx.layout is not None else None
    if nc == 1:
        take0 = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
        r, _ = _residual_of(cfg, ctx, beta, beta_t, intr, weight, take0(xs),
                            None if axs is None else take0(axs))
        return jnp.sum(r * r)

    nc_live = _live_chunk_count(ctx, nc, chunk)
    if nc_live is not None:
        def fbody(i, acc):
            r, _ = _residual_of(cfg, ctx, beta, beta_t, intr, weight,
                                _take_chunk(xs, i), _take_chunk(axs, i))
            return acc + jnp.sum(r * r)

        return jax.lax.fori_loop(0, nc_live, fbody,
                                 jnp.asarray(0.0, beta.dtype))

    def body(acc, elems):
        xs_elem, assoc_elem = elems
        r, _ = _residual_of(cfg, ctx, beta, beta_t, intr, weight, xs_elem,
                            assoc_elem)
        return acc + jnp.sum(r * r), None

    total, _ = jax.lax.scan(body, jnp.asarray(0.0, beta.dtype), (xs, axs))
    return total


def _live_chunk_count(ctx: LMContext, nc: int, chunk: int):
    """Traced number of chunks carrying non-sink content (else static nc).

    Inactive surfels sort into the trailing sink tuple, so chunks past
    ``layout.live_end`` hold only masked slots whose contributions are
    exact zeros -- a fori_loop stops there instead of scanning the full
    static capacity (~15-30% of slots at 480p are sink/padding)."""
    if ctx.layout is None or ctx.layout.live_end is None:
        return None
    le = ctx.layout.live_end
    return jnp.minimum((le + chunk - 1) // chunk, nc).astype(jnp.int32)


def _take_chunk(tree, i):
    return None if tree is None else jax.tree.map(lambda a: a[i], tree)


def _cost_chunk_size(cfg, ctx):
    np_cap = ctx.sf_mask.shape[0]
    target = cfg.solver.assembly_chunk
    c = min(np_cap, target)
    while np_cap % c != 0:
        c //= 2
    return max(c, 1)


def _sampling_chunk_size(ctx):
    """Chunk size for gather-bearing (sampling) passes: 4x the assembly
    chunk.  The corner-bank gather pays ~1 ms per OP regardless of size,
    so sampling passes want the fewest chunks that still let live_end
    skip the sink tail; their intermediates are (3, C) slims, so big
    chunks are cheap."""
    np_cap = ctx.sf_mask.shape[0]
    if ctx.layout is None or ctx.layout.live_end is None:
        return np_cap
    c = min(np_cap, 4 * 65536)
    while np_cap % c != 0:
        c //= 2
    return max(c, 1)


# ---------------------------------------------------------------------------
# ARAP term (super/loss.py:403-455) -- graph-sized, row-major
# ---------------------------------------------------------------------------

def arap_term_residual(ctx: LMContext, beta, weight: float):
    """Masked ARAP residuals, (J, K_ed, 3)."""
    nb_beta = beta[ctx.ed_knn_idx]
    r = transform_quat_t(ctx.d_eds, nb_beta)
    r = r - ctx.d_eds - beta[:, None, 4:7]
    return jnp.where(ctx.ed_pair_mask[..., None], weight * r, 0.0)


def arap_term_cost(ctx: LMContext, beta, weight: float):
    r = arap_term_residual(ctx, beta, weight)
    return jnp.sum(r * r)


def arap_term_jacobian(ctx: LMContext, beta, weight: float):
    """ARAP residuals + Jacobian blocks.

    Each (i, j) pair yields a 3-vector residual
      r = R(q_j)(g_i - g_j) + b_j - (g_i - g_j) - b_i
    touching node j with [d/dq (3x4); +I] and node i with [0; -I].
    Returns (r (J, K, 3), g (J, K, 3, 2, 7), idx (J, K, 2), mask (J, K)).
    """
    nb_beta = beta[ctx.ed_knn_idx]
    tv, dq = transform_quat_t_jac(ctx.d_eds, nb_beta, skew_v=ctx.ed_skew)
    r = tv - ctx.d_eds - beta[:, None, 4:7]

    j_cap, k = ctx.ed_knn_idx.shape
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=beta.dtype), (j_cap, k, 3, 3))
    zeros34 = jnp.zeros((j_cap, k, 3, 4), dtype=beta.dtype)
    g_j = jnp.concatenate([dq, eye3], axis=-1)
    g_i = jnp.concatenate([zeros34, -eye3], axis=-1)
    g = jnp.stack([g_j, g_i], axis=-2)                  # (J, K, 3, 2, 7)

    self_idx = jnp.broadcast_to(
        jnp.arange(j_cap, dtype=ctx.ed_knn_idx.dtype)[:, None], (j_cap, k))
    idx = jnp.stack([ctx.ed_knn_idx, self_idx], axis=-1)

    mask = ctx.ed_pair_mask
    r = jnp.where(mask[..., None], weight * r, 0.0)
    g = jnp.where(mask[..., None, None, None], weight * g, 0.0)
    return r, g, idx, mask


# ---------------------------------------------------------------------------
# Rot term (super/loss.py:475-499)
# ---------------------------------------------------------------------------

def rot_term_residual(beta, active, weight: float):
    q = beta[:, 0:4]
    r = weight * (1.0 - jnp.sum(q * q, axis=-1))
    return jnp.where(active, r, 0.0)


def rot_term_cost(beta, active, weight: float):
    r = rot_term_residual(beta, active, weight)
    return jnp.sum(r * r)


def rot_term_jacobian(beta, active, weight: float):
    q = beta[:, 0:4]
    r = weight * (1.0 - jnp.sum(q * q, axis=-1))
    g = jnp.concatenate([-2.0 * weight * q, jnp.zeros_like(beta[:, 4:7])],
                        axis=-1)
    r = jnp.where(active, r, 0.0)
    g = jnp.where(active[:, None], g, 0.0)
    return r, g, active


# ---------------------------------------------------------------------------
# JTJ / JTr assembly
# ---------------------------------------------------------------------------

def _add_blocks(jtj, rows_nodes, cols_nodes, vals):
    """Scatter-add 7x7 blocks into the normal-matrix accumulator.

    Handles both layouts: (J, J, 7, 7) blocks (fast tile writes; ~1 GB of
    tile padding at J=512) and the dense (7J, 7J) matrix (padding-free,
    required for dense ED graphs where the block layout would cost 16 GB).
    rows_nodes/cols_nodes: broadcast-compatible node-id arrays; vals: their
    broadcast shape + (7, 7).
    """
    vals = vals.astype(jtj.dtype)  # bf16 accumulators (jtj_dtype="bf16")
    if jtj.ndim == 4:
        return jtj.at[rows_nodes, cols_nodes].add(vals)
    seven = jnp.arange(7)
    r = rows_nodes[..., None, None] * 7 + seven[:, None]
    c = cols_nodes[..., None, None] * 7 + seven[None, :]
    return jtj.at[r, c].add(vals)


def _jacobian_of(cfg, ctx, beta, beta_t, intr, weight, xs_elem, assoc_elem):
    if len(xs_elem) == 4:   # tuple mode: synthesize the row-major view
        mask, w_fm, knn_fm, diff_fm = _geom_of(ctx, xs_elem)
        c = mask.shape[-1]
        cv = DataChunk(mask=mask,
                       knn_idx=jnp.zeros((c, w_fm.shape[0]), jnp.int32),
                       knn_w=w_fm.T, knn=knn_fm.T.reshape(c, -1, 3),
                       diff=diff_fm.T.reshape(c, -1, 3))
    else:
        cv = _chunk_view(xs_elem)
    beta_k = _beta_k_of(ctx, beta_t, xs_elem)
    if beta_k is None:
        beta_k = beta[cv.knn_idx]
    if assoc_elem is None:
        return data_chunk_jacobian(cfg, ctx, cv, beta_k, intr, weight)
    o, n, am = assoc_elem
    return frozen_chunk_jacobian(cv, o, n, am, beta_k, weight)


def _data_normal_eq_tuple(cfg, ctx, beta, intr, weight, jtj, jtr,
                          assoc=None, acc_dtype=None):
    """Tuple-grouped MXU path: jacobian chunks -> G-block Grams -> expand.

    Returns (jtj, jtr, cost): the scalar sum of squared residuals falls out
    of the same pass (the "deferred acceptance" LM schedule consumes it, so
    no separate cost evaluation is needed per iteration).

    With ``assembly_expand == "pairs"`` the incoming (jtj, jtr) must be
    None: the dense (7J, 7J) matrix is *created* here (windowed set-scatter
    of the distinct node-pair blocks + symmetrization) and the graph terms
    scatter-add on top of it afterwards.
    """
    sol = cfg.solver
    chunk = _cost_chunk_size(cfg, ctx)
    xs, nc = _chunk_xs(ctx, chunk)
    axs = None if assoc is None else _assoc_chunk_xs(assoc, chunk)
    g_per = sol.assembly_pad_group
    zero = jnp.asarray(0.0, beta.dtype)
    layout = ctx.layout
    t_cap = layout.tuple_nodes.shape[0]
    j_cap = ctx.ed_mask.shape[0]
    pairs = layout.pair_rank is not None
    beta_t = beta[layout.tuple_nodes]      # (T, K, 7): per-tuple params

    pxs = None
    if assoc is None and nc > 1 and sol.moving_premix \
            and sol.assembly_backend != "pallas":
        # Moving-target mode: hoist the sampling into one big-chunk pass
        # (see moving_mix_pass) and stream (m, r, mask) into the assembly
        # chunks below like a frozen association.
        m_all, r_all_mv, mask_all = moving_mix_pass(cfg, ctx, beta_t, intr,
                                                    weight)

        def msplit(a):
            if a.ndim == 1:
                return a.reshape(nc, chunk)
            return jnp.moveaxis(a.reshape(a.shape[0], nc, chunk), 1, 0)

        pxs = (msplit(m_all), msplit(r_all_mv), msplit(mask_all))

    def finish(gram, jtr_t, cost):
        if sol.linear_solver == "pairs_fused":
            acc, jtr7 = assembly.reduce_pairs(layout, gram, jtr_t, j_cap,
                                              sum_dtype=sol.gram_sum_dtype
                                              if sol.gram_sum_dtype != "f32"
                                              else None)
            return acc, jtr7, cost
        if pairs:
            dense, jtr7 = assembly.expand_pairs(
                layout, gram, jtr_t, j_cap,
                acc_dtype=acc_dtype or beta.dtype,
                sum_dtype=sol.gram_sum_dtype
                if sol.gram_sum_dtype != "f32" else None)
            return dense, jtr7, cost
        jj, jr = assembly.expand_to_blocks(layout, gram, jtr_t, jtj, jtr)
        return jj, jr, cost

    def jac_chunk(xs_elem, assoc_elem, pre_elem=None):
        # Lane-aligned feature-major passes (the row-major (C, K, ...)
        # chunk views pad trailing dims to (8, 128) TPU tiles at every
        # materialization boundary -- ~40% of the pass).
        geom = _geom_of(ctx, xs_elem)
        beta_kfm = _beta_fm_of(beta_t, xs_elem)
        if assoc_elem is not None:  # frozen association
            o, n, am = assoc_elem
            return frozen_chunk_partial_fm(
                geom, o, n, am, beta_kfm, weight, g_per,
                jac_dtype=(jnp.bfloat16 if sol.jac_dtype == "bf16"
                           else None))
        if pre_elem is not None:    # pre-sampled moving mix
            m_fm, r_mv, mask_mv = pre_elem
            return premixed_chunk_partial_fm(geom, m_fm, r_mv, mask_mv,
                                             beta_kfm, weight, g_per)
        return moving_chunk_partial_fm(cfg, ctx, geom, beta_kfm, intr,
                                       weight, g_per)

    if sol.assembly_backend == "pallas" and beta.dtype == jnp.float32:
        # Fused Pallas path: compute (r, h) per chunk, then one kernel does
        # both reduction levels (pallas_kernels/gram.py).
        def rh_chunk(xs_elem, assoc_elem):
            r, g, _ = _jacobian_of(cfg, ctx, beta, beta_t, intr, weight,
                                   xs_elem, assoc_elem)
            return r, g.reshape(g.shape[0], 28)

        if nc == 1:
            take0 = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            r_all, h_all = rh_chunk(take0(xs),
                                    None if axs is None else take0(axs))
        else:
            _, (rs, hs) = jax.lax.scan(lambda c, e: (c, rh_chunk(*e)), None,
                                       (xs, axs))
            r_all = rs.reshape(-1)
            h_all = hs.reshape(-1, 28)
        from super_tpu.pallas_kernels.gram import tuple_gram_pallas

        gram, jtr_t = tuple_gram_pallas(
            h_all, r_all, layout.block_tuple, tuple_cap=t_cap,
            block=sol.assembly_pad_group)
        return finish(gram, jtr_t, jnp.sum(r_all * r_all))

    if nc == 1:
        take0 = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
        partial, cost = jac_chunk(take0(xs),
                                  None if axs is None else take0(axs))
    else:
        nc_live = _live_chunk_count(ctx, nc, chunk)
        if nc_live is not None:
            bpc = chunk // g_per
            parts0 = jnp.zeros((nc, bpc, 28 * 29), beta.dtype)

            def fbody(i, carry):
                c, parts = carry
                part, dc = jac_chunk(_take_chunk(xs, i), _take_chunk(axs, i),
                                     _take_chunk(pxs, i))
                parts = jax.lax.dynamic_update_index_in_dim(
                    parts, part, i, 0)
                return c + dc, parts

            cost, parts = jax.lax.fori_loop(0, nc_live, fbody,
                                            (zero, parts0))
        else:
            def scan_body(c, e):
                part, dc = jac_chunk(*e)
                return c + dc, part

            cost, parts = jax.lax.scan(scan_body, zero, (xs, axs, pxs))
        partial = parts.reshape(-1, 28 * 29)

    if sol.assembly_combine == "matmul":
        acc = assembly.segment_sum_matmul(
            partial, layout.block_tuple, t_cap,
            sum_dtype=sol.gram_sum_dtype if sol.gram_sum_dtype != "f32"
            else None)
    else:
        acc = jnp.zeros((t_cap, 28 * 29), dtype=beta.dtype).at[
            layout.block_tuple].add(partial)
    acc = acc.reshape(t_cap, 28, 29)
    return finish(acc[..., :28], acc[..., 28], cost)


def _data_normal_eq_scatter(cfg, ctx, beta, intr, weight, jtj, jtr,
                            assoc=None):
    """Direct scatter-add path (reference semantics; slow on TPU).

    Returns (jtj, jtr, cost) like the tuple path.
    """
    chunk = _cost_chunk_size(cfg, ctx)
    xs, nc = _chunk_xs(ctx, chunk)
    axs = None if assoc is None else _assoc_chunk_xs(assoc, chunk)
    zero = jnp.asarray(0.0, beta.dtype)

    beta_t = beta[ctx.layout.tuple_nodes] if ctx.layout is not None else None

    def accumulate(carry, xs_elem, assoc_elem):
        jtj_d, jtr_b, cost = carry
        cv = _chunk_view(xs_elem)
        r, g, _ = _jacobian_of(cfg, ctx, beta, beta_t, intr, weight, xs_elem,
                               assoc_elem)
        k = cv.knn_idx.shape[1]
        for a in range(k):
            jtr_b = jtr_b.at[cv.knn_idx[:, a]].add(-g[:, a, :] * r[:, None])
            for b_ in range(k):
                blk = g[:, a, :, None] * g[:, b_, None, :]
                jtj_d = _add_blocks(jtj_d, cv.knn_idx[:, a],
                                    cv.knn_idx[:, b_], blk)
        return (jtj_d, jtr_b, cost + jnp.sum(r * r)), None

    if nc == 1:
        take0 = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
        (jtj, jtr, cost), _ = accumulate(
            (jtj, jtr, zero), take0(xs), None if axs is None else take0(axs))
    else:
        (jtj, jtr, cost), _ = jax.lax.scan(
            lambda c, e: accumulate(c, e[0], e[1]), (jtj, jtr, zero),
            (xs, axs))
    return jtj, jtr, cost


def assemble_normal_equations(cfg: SuPerConfig, ctx: LMContext, beta,
                              intr: Intrinsics, axis_name=None, assoc=None,
                              with_cost: bool = False):
    """Build (JTJ, JTr) = (sum_r J_r^T J_r, -sum_r J_r^T r) over all enabled
    derived-gradient terms.  Parity: LM_Solver.prepareCostTerm grad=True
    (super/LM.py:54-68) + prepare_jtj_jtl (loss.py:199-205).

    JTJ: (7 J_cap, 7 J_cap) dense; JTr: (7 J_cap,).

    With ``with_cost`` the scalar sum of squared residuals at ``beta`` is
    returned as a third output -- it falls out of the residuals the Jacobian
    pass computes anyway, which is what makes the deferred-acceptance LM
    schedule one pass per iteration (core/lm.py).

    When ``axis_name`` is set (shard_map over the surfel dimension), the data
    term is computed on the local surfel slice, the replicated graph terms
    are down-scaled by the shard count, and the result is ``psum``-combined
    -- the cross-chip JTJ/JTr reduction of the north-star design.
    """
    j_cap = ctx.ed_mask.shape[0]
    dim = 7 * j_cap
    losses = cfg.losses
    acc_dtype = (jnp.bfloat16 if cfg.solver.jtj_dtype == "bf16"
                 else beta.dtype)
    # Pair expansion writes the dense (7J, 7J) matrix directly (windowed
    # set-scatter of distinct node-pair blocks + symmetrization): no block
    # intermediate, no block->dense transpose.
    pairs_mode = (losses.sf_point_plane and ctx.layout is not None
                  and ctx.layout.pair_rank is not None)
    # Accumulation layout for the scatter paths: for small graphs the
    # (J, J, 7, 7) block layout is fastest (contiguous 7x7 tile writes) and
    # its 20.9x tile-padding overhead is affordable (~1 GB at J=512); for
    # dense graphs it would be 16 GB, so blocks scatter directly into the
    # final dense matrix.
    block_layout = j_cap <= 512 and not pairs_mode
    if pairs_mode:
        jtj = None   # created by _data_normal_eq_tuple via expand_pairs
        jtr = None
    elif block_layout:
        jtj = jnp.zeros((j_cap, j_cap, 7, 7), dtype=acc_dtype)
        jtr = jnp.zeros((j_cap, 7), dtype=beta.dtype)
    else:
        jtj = jnp.zeros((dim, dim), dtype=acc_dtype)
        jtr = jnp.zeros((j_cap, 7), dtype=beta.dtype)
    if axis_name is None:
        graph_scale = 1.0
    else:
        graph_scale = jax.lax.rsqrt(
            jax.lax.psum(jnp.asarray(1.0, beta.dtype), axis_name))

    pairs_fused = cfg.solver.linear_solver == "pairs_fused"
    if pairs_fused:
        if ctx.layout is None or ctx.layout.pair_rank is None:
            raise ValueError("linear_solver='pairs_fused' requires the "
                             "tuple assembly with the pair layout")
        pcap = ctx.layout.pair_dest.shape[0]
        jtj = jnp.zeros((pcap, 49), dtype=beta.dtype)
        jtr = jnp.zeros((j_cap, 7), dtype=beta.dtype)

    cost = jnp.asarray(0.0, beta.dtype)
    if losses.sf_point_plane:
        weight = losses.sf_point_plane_weight
        if ctx.layout is not None:
            jtj, jtr, dcost = _data_normal_eq_tuple(
                cfg, ctx, beta, intr, weight, jtj, jtr, assoc=assoc,
                acc_dtype=acc_dtype)
        else:
            jtj, jtr, dcost = _data_normal_eq_scatter(
                cfg, ctx, beta, intr, weight, jtj, jtr, assoc=assoc)
        cost = cost + dcost

    graph_rows = []   # pairs_fused: (R, 49) blocks + (R,) pair ranks
    graph_ranks = []
    if losses.mesh_arap:
        r, g, idx, _ = arap_term_jacobian(ctx, beta, losses.mesh_arap_weight)
        r, g = r * graph_scale, g * graph_scale
        cost = cost + jnp.sum(r * r)
        jk = r.shape[0] * r.shape[1]
        r2 = r.reshape(jk, 3)
        g2 = g.reshape(jk, 3, 2, 7)
        idx2 = idx.reshape(jk, 2)
        for a in range(2):
            ga = g2[:, :, a, :]
            jtr = jtr.at[idx2[:, a]].add(-jnp.einsum("rci,rc->ri", ga, r2))
        if pairs_fused:
            # Distinct-pair rows under the symmetric-half convention
            # (diagonal pairs halved, off-diagonal oriented min -> max).
            b00 = jnp.einsum("rci,rcj->rij", g2[:, :, 0], g2[:, :, 0])
            b11 = jnp.einsum("rci,rcj->rij", g2[:, :, 1], g2[:, :, 1])
            b01 = jnp.einsum("rci,rcj->rij", g2[:, :, 0], g2[:, :, 1])
            swap = ctx.layout.arap_swap.reshape(jk)
            boff = jnp.where(swap[:, None, None],
                             jnp.swapaxes(b01, 1, 2), b01)
            graph_rows += [0.5 * b00.reshape(jk, 49),
                           0.5 * b11.reshape(jk, 49),
                           boff.reshape(jk, 49)]
            ar = ctx.layout.arap_rank.reshape(jk, 3)
            graph_ranks += [ar[:, 0], ar[:, 1], ar[:, 2]]
        else:
            for a in range(2):
                ga = g2[:, :, a, :]
                for b in range(2):
                    gb = g2[:, :, b, :]
                    blk = jnp.einsum("rci,rcj->rij", ga, gb)
                    jtj = _add_blocks(jtj, idx2[:, a], idx2[:, b], blk)

    if losses.mesh_rot:
        r, g, _ = rot_term_jacobian(beta, ctx.ed_mask, losses.mesh_rot_weight)
        r, g = r * graph_scale, g * graph_scale
        cost = cost + jnp.sum(r * r)
        diag = jnp.arange(j_cap)
        jtr = jtr.at[diag].add(-g * r[:, None])
        if pairs_fused:
            graph_rows.append(
                (0.5 * g[:, :, None] * g[:, None, :]).reshape(j_cap, 49))
            graph_ranks.append(ctx.layout.diag_rank)
        else:
            jtj = _add_blocks(jtj, diag, diag, g[:, :, None] * g[:, None, :])

    if graph_rows:
        jtj = jtj + assembly.segment_sum_matmul(
            jnp.concatenate(graph_rows), jnp.concatenate(graph_ranks),
            jtj.shape[0])
    if block_layout:
        jtj = jtj.transpose(0, 2, 1, 3).reshape(dim, dim)
    jtr = jtr.reshape(dim)
    if axis_name is not None:
        jtj = jax.lax.psum(jtj, axis_name)
        jtr = jax.lax.psum(jtr, axis_name)
        cost = jax.lax.psum(cost, axis_name)
    if with_cost:
        return jtj, jtr, cost
    return jtj, jtr


def total_cost(cfg: SuPerConfig, ctx: LMContext, beta, intr: Intrinsics,
               axis_name=None, assoc=None):
    """Scalar objective used by the LM accept/reject test
    (LM_Solver.prepareCostTerm grad=False, super/LM.py:70-78)."""
    losses = cfg.losses
    total = jnp.asarray(0.0, dtype=beta.dtype)
    if axis_name is None:
        inv_n = 1.0
    else:
        inv_n = 1.0 / jax.lax.psum(jnp.asarray(1.0, beta.dtype), axis_name)
    if losses.sf_point_plane:
        total = total + data_term_cost(cfg, ctx, beta, intr,
                                       losses.sf_point_plane_weight,
                                       assoc=assoc)
    if losses.mesh_arap:
        total = total + inv_n * arap_term_cost(ctx, beta,
                                               losses.mesh_arap_weight)
    if losses.mesh_rot:
        total = total + inv_n * rot_term_cost(beta, ctx.ed_mask,
                                              losses.mesh_rot_weight)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
    return total
