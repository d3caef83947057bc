"""Independent NumPy f64 port of the reference LM solver semantics.

This is a *golden model* for tests: a from-scratch NumPy implementation of
the reference's per-iteration LM loop --

  - per-iteration projective re-association of the point-plane data term
    (reference super/loss.py:222-248: project the warped surfels with
    rounded-coordinate validity, bilinear-sample the target point/normal
    maps through the index map with NaN-on-invalid corners);
  - ARAP residuals r_ij = R(q_j) d_ij + b_j - d_ij - b_i
    (super/loss.py:403-440);
  - Rot residuals 1 - |q|^2 (super/loss.py:475-499);
  - the accept/reject damping loop with minimal_loss initialized to 1e10
    and a plain (unscaled) damped Cholesky solve (super/LM.py:81-121).

The Jacobian is computed by CENTRAL FINITE DIFFERENCES on the residual
vector (row masks frozen at the base beta), so this port shares no
analytic-derivative code with super_tpu -- an independent oracle for both
the Jacobian assembly and the loop semantics.

NumPy-only on purpose: no torch, no jax, no super_tpu imports.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class GoldenInputs(NamedTuple):
    # surfels
    p: np.ndarray          # (N, 3) surfel positions
    sf_active: np.ndarray  # (N,) bool
    knn_idx: np.ndarray    # (N, 4) anchor node ids
    knn_w: np.ndarray      # (N, 4)
    # ED graph
    g: np.ndarray          # (J, 3) node positions
    ed_active: np.ndarray  # (J,) bool
    ed_knn: np.ndarray     # (J, K_ed)
    # target frame (pixel-indexed, P = H*W)
    trg_points: np.ndarray  # (P, 3)
    trg_norms: np.ndarray   # (P, 3)
    index_map: np.ndarray   # (H, W) int, -1 invalid
    # camera
    fx: float
    fy: float
    cx: float
    cy: float
    # weights
    w_data: float
    w_arap: float
    w_rot: float


def transform_quat(v, beta):
    """T(q, b) v = v + 2 qw (qv x v) + 2 qv x (qv x v) + b."""
    qw = beta[..., 0:1]
    qv = beta[..., 1:4]
    c = np.cross(qv, v)
    tv = v + 2.0 * qw * c + 2.0 * np.cross(qv, c)
    if beta.shape[-1] == 7:
        tv = tv + beta[..., 4:7]
    return tv


def warp_surfels(inp: GoldenInputs, beta):
    """Eq (10): blended per-anchor warps, T(p) = sum_k w_k (T_k(p-g_k)+g_k)."""
    g_k = inp.g[inp.knn_idx]                    # (N, 4, 3)
    d = inp.p[:, None, :] - g_k                 # (N, 4, 3)
    tk = transform_quat(d, beta[inp.knn_idx]) + g_k
    return np.sum(inp.knn_w[..., None] * tk, axis=1)


def _bilinear_nan(feat, index_map, v, u):
    """Bilinear sample (P, F) features through the index map at float (v, u),
    NaN where any corner is invalid (reference loss.py:106-157)."""
    h, w = index_map.shape
    fl_v = np.floor(v)
    fl_u = np.floor(u)
    out = np.zeros((v.shape[0], feat.shape[1]))
    valid = np.ones(v.shape[0], dtype=bool)
    for dv in (0.0, 1.0):
        for du in (0.0, 1.0):
            cv = fl_v + dv
            cu = fl_u + du
            ci = cv.astype(np.int64)
            cj = cu.astype(np.int64)
            inb = (ci >= 0) & (ci < h) & (cj >= 0) & (cj < w)
            sid = np.where(inb, index_map[np.clip(ci, 0, h - 1),
                                          np.clip(cj, 0, w - 1)], -1)
            ok = sid >= 0
            valid &= ok
            wgt = (1.0 - np.abs(cv - v)) * (1.0 - np.abs(cu - u))
            out += wgt[:, None] * np.where(ok[:, None],
                                           feat[np.clip(sid, 0, None)], 0.0)
    out[~valid] = np.nan
    return out


def data_rows(inp: GoldenInputs, beta, frozen_mask=None):
    """Per-surfel point-plane residuals + validity (loss.py:222-248).

    Returns (r (N,), mask (N,)); r is zero on masked rows.  With
    ``frozen_mask`` the row set is fixed (used inside finite differences;
    the sampled values still move with beta).
    """
    tp = warp_surfels(inp, beta)
    z = tp[:, 2] + 1e-8
    u = tp[:, 0] * inp.fx / z + inp.cx
    v = tp[:, 1] * inp.fy / z + inp.cy
    h, w = inp.index_map.shape
    p_cnt = h * w
    ui = np.rint(u).astype(np.int64)
    vi = np.rint(v).astype(np.int64)
    coords = vi * w + ui
    proj_valid = (vi >= 0) & (vi < h - 1) & (ui >= 0) & (ui < w - 1)
    in_range = (coords >= 0) & (coords < p_cnt)
    flat_valid = inp.index_map.reshape(-1) >= 0
    valid_pair = flat_valid[np.clip(coords, 0, p_cnt - 1)] & in_range

    o = _bilinear_nan(inp.trg_points, inp.index_map, v, u)
    n = _bilinear_nan(inp.trg_norms, inp.index_map, v, u)
    intrp_valid = ~(np.isnan(o).any(axis=1) | np.isnan(n).any(axis=1))

    mask = inp.sf_active & valid_pair & proj_valid & intrp_valid
    if frozen_mask is not None:
        mask = frozen_mask
    o = np.nan_to_num(o)
    n = np.nan_to_num(n)
    r = inp.w_data * np.sum(n * (tp - o), axis=1)
    return np.where(mask, r, 0.0), mask


def arap_rows(inp: GoldenInputs, beta):
    """r_ij = R(q_j)(g_i - g_j) + b_j - (g_i - g_j) - b_i, flattened."""
    d = inp.g[:, None, :] - inp.g[inp.ed_knn]          # (J, K, 3)
    r = transform_quat(d, beta[inp.ed_knn]) - d - beta[:, None, 4:7]
    mask = inp.ed_active[:, None] & inp.ed_active[inp.ed_knn]
    r = np.where(mask[..., None], inp.w_arap * r, 0.0)
    return r.reshape(-1)


def rot_rows(inp: GoldenInputs, beta):
    q = beta[:, 0:4]
    r = inp.w_rot * (1.0 - np.sum(q * q, axis=1))
    return np.where(inp.ed_active, r, 0.0)


def residual_vector(inp: GoldenInputs, beta, frozen_mask=None):
    r_d, mask = data_rows(inp, beta, frozen_mask=frozen_mask)
    return np.concatenate([r_d, arap_rows(inp, beta), rot_rows(inp, beta)]), \
        mask


def cost(inp: GoldenInputs, beta):
    r, _ = residual_vector(inp, beta)
    return float(np.sum(r * r))


def fd_jacobian(inp: GoldenInputs, beta, h=1e-7):
    """Central-difference Jacobian of the residual vector, row masks frozen
    at the base beta."""
    _, mask = residual_vector(inp, beta)
    j_cap = beta.shape[0]
    r0, _ = residual_vector(inp, beta, frozen_mask=mask)
    jac = np.zeros((r0.shape[0], j_cap * 7))
    for col in range(j_cap * 7):
        node, comp = divmod(col, 7)
        bp = beta.copy()
        bp[node, comp] += h
        rp, _ = residual_vector(inp, bp, frozen_mask=mask)
        bm = beta.copy()
        bm[node, comp] -= h
        rm, _ = residual_vector(inp, bm, frozen_mask=mask)
        jac[:, col] = (rp - rm) / (2.0 * h)
    return jac, r0


class GoldenIter(NamedTuple):
    cand_cost: float
    accepted: bool
    u: float
    beta: np.ndarray


def golden_lm(inp: GoldenInputs, num_iter: int, u: float = 10.0,
              v: float = 7.5, minimal_loss: float = 1e10):
    """The reference LM loop (LM.py:81-121) on the FD normal equations.

    Returns (best_beta, history).  Plain damped Cholesky/solve, no Jacobi
    scaling (the reference solves the raw f64 system).
    """
    j_cap = inp.g.shape[0]
    beta = np.tile(np.array([1.0, 0, 0, 0, 0, 0, 0]), (j_cap, 1))
    best_beta = beta.copy()
    history = []
    for _ in range(num_iter):
        jac, r = fd_jacobian(inp, beta)
        jtj = jac.T @ jac
        jtl = -jac.T @ r
        a = jtj + u * np.eye(7 * j_cap)
        delta = np.linalg.solve(a, jtl).reshape(j_cap, 7)
        beta = beta + delta
        loss = cost(inp, beta)
        if loss < minimal_loss:
            minimal_loss = loss
            u /= v
            best_beta = beta.copy()
            accepted = True
        else:
            u *= v
            beta = best_beta.copy()
            accepted = False
        history.append(GoldenIter(cand_cost=loss, accepted=accepted, u=u,
                                  beta=beta.copy()))
    return best_beta, history
