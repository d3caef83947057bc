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
  JTJ / JTr -- same normal equations as the reference's filtering).
- JTJ is assembled as node-pair 7x7 blocks scattered into a dense
  (7 J_cap, 7 J_cap) matrix.  At reference scales (J <= 512) the dense
  normal matrix is small (<= 51 MB) and Cholesky on the MXU is cheap; the
  block-sparse PCG path (solver.py) covers dense-graph configs.
- f32 instead of the reference's f64 (TPU has no native f64); tests compare
  against a NumPy f64 reference implementation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core import assembly
from super_tpu.core.state import FrameData, GraphState, SurfelState
from super_tpu.geometry.camera import Intrinsics, project_points
from super_tpu.geometry.quaternion import (
    blend_warp_jac,
    skew,
    transform_quat_t,
    transform_quat_t_jac,
)
from super_tpu.ops.bilinear import bilinear_sample_indexed


class LMContext(NamedTuple):
    """Per-frame constants of the LM solve (reference: each loss's
    ``prepare``, super/loss.py:212-220,408-426,480-485).

    With the "tuple" assembly mode, the surfel-dimension fields are stored
    in the tuple-sorted, padded order described in core/assembly.py (masks
    cover the padding), and ``layout`` carries the grouping structure.
    """

    # --- data term ---
    sf_mask: jnp.ndarray       # (N,) active surfels
    sf_knn_idx: jnp.ndarray    # (N, K)
    sf_knn_w: jnp.ndarray      # (N, K)
    sf_knn: jnp.ndarray        # (N, K, 3) anchor positions g_i
    sf_diff: jnp.ndarray       # (N, K, 3) p - g_i
    sf_skew: jnp.ndarray       # (N, K, 3, 3)
    # --- target frame ---
    trg_points: jnp.ndarray    # (P, 3) candidate points (pixel-indexed)
    trg_norms: jnp.ndarray     # (P, 3)
    trg_index_map: jnp.ndarray  # (H, W)
    # --- ARAP term ---
    ed_mask: jnp.ndarray       # (J,) active nodes
    ed_knn_idx: jnp.ndarray    # (J, K_ed)
    ed_pair_mask: jnp.ndarray  # (J, K_ed) both endpoints active
    d_eds: jnp.ndarray         # (J, K_ed, 3) g_i - g_j
    ed_skew: jnp.ndarray       # (J, K_ed, 3, 3)
    layout: Optional["assembly.TupleLayout"]  # tuple-mode grouping or None


def prepare_lm(cfg: SuPerConfig, surfels: SurfelState, graph: GraphState,
               frame: FrameData) -> LMContext:
    sol = cfg.solver
    sf_mask = surfels.active
    sf_knn_idx = surfels.knn_idx
    sf_knn_w = surfels.knn_w
    sf_points = surfels.points

    layout = None
    if sol.assembly_mode == "tuple" and cfg.num_neighbors == 4:
        layout = assembly.build_tuple_layout(
            surfels.knn_idx, surfels.active, graph.capacity,
            tuple_cap=sol.assembly_tuple_cap,
            chunk=sol.assembly_tuple_chunk,
            pad_group=sol.assembly_pad_group)
        src = layout.src_of
        sf_mask = layout.slot_valid & surfels.active[src]
        sf_knn_idx = surfels.knn_idx[src]
        sf_knn_w = surfels.knn_w[src]
        sf_points = surfels.points[src]

    sf_knn = graph.points[sf_knn_idx]
    sf_diff = sf_points[:, None, :] - sf_knn
    ed_knn_idx = graph.knn_idx
    d_eds = graph.points[:, None, :] - graph.points[ed_knn_idx]
    ed_pair_mask = graph.active[:, None] & graph.active[ed_knn_idx]
    return LMContext(
        sf_mask=sf_mask,
        sf_knn_idx=sf_knn_idx,
        sf_knn_w=sf_knn_w,
        sf_knn=sf_knn,
        sf_diff=sf_diff,
        sf_skew=skew(sf_diff),
        trg_points=frame.points,
        trg_norms=frame.norms,
        trg_index_map=frame.index_map(cfg.height, cfg.width),
        ed_mask=graph.active,
        ed_knn_idx=ed_knn_idx,
        ed_pair_mask=ed_pair_mask,
        d_eds=d_eds,
        ed_skew=skew(d_eds),
        layout=layout,
    )


# ---------------------------------------------------------------------------
# Point-to-plane data term (super/loss.py:207-290)
# ---------------------------------------------------------------------------

def _project_and_sample(cfg: SuPerConfig, ctx: LMContext, trans_points,
                        intr: Intrinsics, grad: bool):
    """Project warped surfels, gate on frame validity, bilinear-sample the
    target point/normal maps.  Returns sampled values + the combined mask."""
    h, w = cfg.height, cfg.width
    v, u, coords, proj_valid = project_points(trans_points, intr, h, w)
    p = ctx.trg_points.shape[0]
    coords_c = jnp.clip(coords, 0, p - 1)
    # Valid pairing: rounded pixel in range and a valid candidate there
    # (loss.py:229-234), plus the margin test and surfel activity.
    pair_valid = (coords >= 0) & (coords < p) & (ctx.trg_index_map.reshape(-1)[coords_c] >= 0)
    mask = ctx.sf_mask & pair_valid & proj_valid

    new_points, pvalid, dpdpi = bilinear_sample_indexed(
        ctx.trg_points, ctx.trg_index_map, v, u, compute_grad=grad)
    new_norms, nvalid, dndpi = bilinear_sample_indexed(
        ctx.trg_norms, ctx.trg_index_map, v, u, compute_grad=grad)
    mask = mask & pvalid & nvalid
    return new_points, new_norms, dpdpi, dndpi, mask


def data_term_residual(cfg: SuPerConfig, ctx: LMContext, beta,
                       intr: Intrinsics, weight: float):
    """Masked residual vector lambda * n^T (T(p) - o), (N,)."""
    trans_points = transform_quat_t(ctx.sf_diff, beta[ctx.sf_knn_idx])
    trans_points = jnp.sum(ctx.sf_knn_w[..., None] * (trans_points + ctx.sf_knn), axis=-2)
    new_points, new_norms, _, _, mask = _project_and_sample(
        cfg, ctx, trans_points, intr, grad=False)
    r = weight * jnp.sum(new_norms * (trans_points - new_points), axis=-1)
    return jnp.where(mask, r, 0.0), mask


def data_term_cost(cfg: SuPerConfig, ctx: LMContext, beta, intr: Intrinsics,
                   weight: float):
    """Scalar cost sum((lambda * r)^2) of the point-plane term
    (loss.py:222-248,289-290 grad=False path)."""
    r, _ = data_term_residual(cfg, ctx, beta, intr, weight)
    return jnp.sum(r * r)


def data_term_jacobian(cfg: SuPerConfig, ctx: LMContext, beta,
                       intr: Intrinsics, weight: float):
    """Residual + per-anchor 7-dim gradient rows of the point-plane term.

    Returns (r (N,), g (N, K, 7), idx (N, K), mask (N,)); rows are zeroed
    where masked.  Parity: DataLoss.forward grad=True (loss.py:250-288).
    """
    trans_points, jac = blend_warp_jac(
        ctx.sf_diff, ctx.sf_knn, beta[ctx.sf_knn_idx], ctx.sf_knn_w,
        skew_v=ctx.sf_skew)  # jac: (N, K, 3, 4), already knn_w-weighted
    new_points, new_norms, dpdpi, dndpi, mask = _project_and_sample(
        cfg, ctx, trans_points, intr, grad=True)

    pt_diff = trans_points - new_points

    # dPi: d(u, v)/d(xyz) of the pinhole projection (loss.py:160-173).
    z = trans_points[..., 2] + 1e-8
    zero = jnp.zeros_like(z)
    dpi = jnp.stack(
        [
            jnp.stack([intr.fx / z, zero, -intr.fx * trans_points[..., 0] / (z * z)], axis=-1),
            jnp.stack([zero, intr.fy / z, -intr.fy * trans_points[..., 1] / (z * z)], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)

    dpdt = dpdpi @ dpi  # (N, 3, 3): d(sampled target point)/d(warped point)
    dndt = dndpi @ dpi  # (N, 3, 3)

    k = ctx.sf_knn_idx.shape[1]
    w4 = ctx.sf_knn_w[..., None, None]  # (N, K, 1, 1)
    dndq = dndt[:, None] @ jac  # (N, K, 3, 4)
    dndq = jnp.concatenate(
        [dndq, w4 * jnp.broadcast_to(dndt[:, None], dndq.shape[:2] + (3, 3))], axis=-1)
    dpdq = jac - dpdt[:, None] @ jac  # (N, K, 3, 4)
    eye3 = jnp.eye(3, dtype=beta.dtype)
    dpdq_b = w4 * (eye3 - dpdt[:, None])  # (N, K, 3, 3)
    dpdq = jnp.concatenate([dpdq, dpdq_b], axis=-1)  # (N, K, 3, 7)

    g = (new_norms[:, None, None, :] @ dpdq)[..., 0, :] \
        + (pt_diff[:, None, None, :] @ dndq)[..., 0, :]  # (N, K, 7)

    r = jnp.where(mask, weight * jnp.sum(new_norms * pt_diff, axis=-1), 0.0)
    g = jnp.where(mask[:, None, None], weight * g, 0.0)
    return r, g, ctx.sf_knn_idx, mask


# ---------------------------------------------------------------------------
# ARAP term (super/loss.py:403-455)
# ---------------------------------------------------------------------------

def arap_term_residual(ctx: LMContext, beta, weight: float):
    """Masked ARAP residuals, (J, K_ed, 3)."""
    nb_beta = beta[ctx.ed_knn_idx]  # (J, K_ed, 7) neighbor transforms
    r = transform_quat_t(ctx.d_eds, nb_beta)
    r = r - ctx.d_eds - beta[:, None, 4:7]
    return jnp.where(ctx.ed_pair_mask[..., None], weight * r, 0.0)


def arap_term_cost(ctx: LMContext, beta, weight: float):
    """Scalar cost of the ARAP term (grad=False path, loss.py:428-437,455)."""
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
    r = tv - ctx.d_eds - beta[:, None, 4:7]  # (J, K, 3)

    j_cap, k = ctx.ed_knn_idx.shape
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=beta.dtype), (j_cap, k, 3, 3))
    zeros34 = jnp.zeros((j_cap, k, 3, 4), dtype=beta.dtype)
    g_j = jnp.concatenate([dq, eye3], axis=-1)          # (J, K, 3, 7) wrt node j
    g_i = jnp.concatenate([zeros34, -eye3], axis=-1)    # (J, K, 3, 7) wrt node i
    g = jnp.stack([g_j, g_i], axis=-2)                  # (J, K, 3, 2, 7)

    self_idx = jnp.broadcast_to(
        jnp.arange(j_cap, dtype=ctx.ed_knn_idx.dtype)[:, None], (j_cap, k))
    idx = jnp.stack([ctx.ed_knn_idx, self_idx], axis=-1)  # (J, K, 2)

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
    """Returns (r (J,), g (J, 7), mask)."""
    q = beta[:, 0:4]
    r = weight * (1.0 - jnp.sum(q * q, axis=-1))
    g = jnp.concatenate([-2.0 * weight * q, jnp.zeros_like(beta[:, 4:7])], axis=-1)
    r = jnp.where(active, r, 0.0)
    g = jnp.where(active[:, None], g, 0.0)
    return r, g, active


# ---------------------------------------------------------------------------
# JTJ / JTr assembly
# ---------------------------------------------------------------------------

def assemble_normal_equations(cfg: SuPerConfig, ctx: LMContext, beta,
                              intr: Intrinsics, axis_name=None):
    """Build (JTJ, JTr) = (sum_r J_r^T J_r, -sum_r J_r^T r) over all enabled
    derived-gradient terms.  Parity: LM_Solver.prepareCostTerm grad=True
    (super/LM.py:54-68) + prepare_jtj_jtl (loss.py:199-205).

    JTJ: (7 J_cap, 7 J_cap) dense; JTr: (7 J_cap,).

    When ``axis_name`` is set (shard_map over the surfel dimension), the data
    term is computed on the local surfel slice, the replicated graph terms
    are down-scaled by the shard count, and the result is ``psum``-combined
    -- the cross-chip JTJ/JTr reduction of the north-star design.
    """
    j_cap = ctx.ed_mask.shape[0]
    dim = 7 * j_cap
    losses = cfg.losses
    jtj_blocks = jnp.zeros((j_cap, j_cap, 7, 7), dtype=beta.dtype)
    jtr = jnp.zeros((j_cap, 7), dtype=beta.dtype)
    if axis_name is None:
        graph_scale = 1.0
    else:
        # Graph terms are replicated across shards; scale g and r by
        # n^-1/2 so the psum of (g g^T, g r) is exact.
        graph_scale = jax.lax.rsqrt(
            jax.lax.psum(jnp.asarray(1.0, beta.dtype), axis_name))

    if losses.sf_point_plane and ctx.layout is not None:
        # Tuple-grouped MXU assembly (see core/assembly.py).
        sol = cfg.solver
        r, g, _, _ = data_term_jacobian(cfg, ctx, beta, intr,
                                        losses.sf_point_plane_weight)
        h = g.reshape(g.shape[0], -1)  # (Np, 28)
        gram, jtr_t = assembly.tuple_reduce(
            ctx.layout, h, r, chunk=sol.assembly_tuple_chunk,
            local=sol.assembly_local)
        jtj_blocks, jtr = assembly.expand_to_blocks(
            ctx.layout, gram, jtr_t, jtj_blocks, jtr)
    elif losses.sf_point_plane:
        weight = losses.sf_point_plane_weight
        n = ctx.sf_mask.shape[0]
        chunk = cfg.solver.assembly_chunk
        num_chunks = max(1, -(-n // chunk))
        if n % num_chunks != 0:
            num_chunks = 1  # fall back to one pass if capacity isn't divisible

        def accumulate(carry, cctx):
            jtj_b, jtr_b = carry
            r, g, idx, _ = data_term_jacobian(cfg, cctx, beta, intr, weight)
            k = idx.shape[1]
            for a in range(k):
                jtr_b = jtr_b.at[idx[:, a]].add(-g[:, a, :] * r[:, None])
                for b_ in range(k):
                    blk = g[:, a, :, None] * g[:, b_, None, :]  # (C, 7, 7)
                    jtj_b = jtj_b.at[idx[:, a], idx[:, b_]].add(blk)
            return (jtj_b, jtr_b), None

        if num_chunks == 1:
            (jtj_blocks, jtr), _ = accumulate((jtj_blocks, jtr), ctx)
        else:
            # Stream the surfel dimension in chunks (bounded peak memory:
            # the (C, K, 3, 7) chain-rule temporaries exist one chunk at a
            # time instead of for all N surfel slots).
            def split(x):
                return x.reshape((num_chunks, n // num_chunks) + x.shape[1:])

            chunked = ctx._replace(
                sf_mask=split(ctx.sf_mask), sf_knn_idx=split(ctx.sf_knn_idx),
                sf_knn_w=split(ctx.sf_knn_w), sf_knn=split(ctx.sf_knn),
                sf_diff=split(ctx.sf_diff), sf_skew=split(ctx.sf_skew))

            def body(carry, sl):
                cctx = ctx._replace(
                    sf_mask=sl[0], sf_knn_idx=sl[1], sf_knn_w=sl[2],
                    sf_knn=sl[3], sf_diff=sl[4], sf_skew=sl[5])
                return accumulate(carry, cctx)

            (jtj_blocks, jtr), _ = jax.lax.scan(
                body, (jtj_blocks, jtr),
                (chunked.sf_mask, chunked.sf_knn_idx, chunked.sf_knn_w,
                 chunked.sf_knn, chunked.sf_diff, chunked.sf_skew))

    if losses.mesh_arap:
        r, g, idx, _ = arap_term_jacobian(ctx, beta, losses.mesh_arap_weight)
        r, g = r * graph_scale, g * graph_scale
        jk = r.shape[0] * r.shape[1]
        r2 = r.reshape(jk, 3)
        g2 = g.reshape(jk, 3, 2, 7)
        idx2 = idx.reshape(jk, 2)
        for a in range(2):
            ga = g2[:, :, a, :]  # (JK, 3, 7)
            jtr = jtr.at[idx2[:, a]].add(-jnp.einsum("rci,rc->ri", ga, r2))
            for b in range(2):
                gb = g2[:, :, b, :]
                blk = jnp.einsum("rci,rcj->rij", ga, gb)
                jtj_blocks = jtj_blocks.at[idx2[:, a], idx2[:, b]].add(blk)

    if losses.mesh_rot:
        r, g, _ = rot_term_jacobian(beta, ctx.ed_mask, losses.mesh_rot_weight)
        r, g = r * graph_scale, g * graph_scale
        diag = jnp.arange(j_cap)
        jtr = jtr.at[diag].add(-g * r[:, None])
        jtj_blocks = jtj_blocks.at[diag, diag].add(g[:, :, None] * g[:, None, :])

    jtj = jtj_blocks.transpose(0, 2, 1, 3).reshape(dim, dim)
    jtr = jtr.reshape(dim)
    if axis_name is not None:
        jtj = jax.lax.psum(jtj, axis_name)
        jtr = jax.lax.psum(jtr, axis_name)
    return jtj, jtr


def total_cost(cfg: SuPerConfig, ctx: LMContext, beta, intr: Intrinsics,
               axis_name=None):
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
                                       losses.sf_point_plane_weight)
    if losses.mesh_arap:
        total = total + inv_n * arap_term_cost(ctx, beta, losses.mesh_arap_weight)
    if losses.mesh_rot:
        total = total + inv_n * rot_term_cost(beta, ctx.ed_mask,
                                              losses.mesh_rot_weight)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
    return total
