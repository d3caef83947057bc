"""Levenberg-Marquardt solver for the per-frame warp field.

Re-implements LM_Solver.LM (super/LM.py:81-121) as a fixed-trip-count
``lax.fori_loop`` with branch-free accept/reject, so the solve stays a single
XLA program and batches cleanly over streams under ``vmap``:

  - decision vector beta: (J_cap, 7) node [q; b], initialized to identity;
  - per iteration: assemble (JTJ, JTr) at beta, add damping u to the
    diagonal, Cholesky-solve, take the step, re-evaluate the scalar cost;
  - accept (cost improved): keep the step, u /= v; reject: restore the best
    beta, u *= v (LM.py:109-117);
  - an ill-posed solve (non-finite delta) acts as a reject instead of the
    reference's loop break (LM.py:99-103) -- same fixed iteration budget.

f32 on TPU (the reference solves in f64); damping keeps the normal matrix
PD, and tests check the step against a NumPy f64 port on synthetic graphs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.losses import (
    LMContext,
    assemble_normal_equations,
    associate,
    total_cost,
)
from super_tpu.geometry.camera import Intrinsics
from super_tpu.geometry.quaternion import IDENTITY_DQ


def _block_jacobi_pcg(a, b, j_cap: int, iterations: int, inv_d=None):
    """Preconditioned conjugate gradients on the (Jacobi-scaled) normal
    system.

    Preconditioner: inverted 7x7 diagonal node blocks.  A fixed trip count
    keeps the solve branch-free (inexact Newton; the LM accept/reject loop
    absorbs solve error).  This is the path that scales to dense ED graphs
    where a 7J x 7J Cholesky becomes the bottleneck (BASELINE dense config).

    When ``inv_d`` is given, ``a`` is the *unscaled* matrix and the
    symmetric scaling D^-1/2 A D^-1/2 is folded into the matvec -- avoiding
    a second dim^2 buffer (822 MB at J = 2048).
    """
    dim = 7 * j_cap

    if inv_d is None:
        def matvec(p):
            return a @ p
        a_diag_src = a
        d_scale = None
    else:
        def matvec(p):
            return inv_d * (a @ (inv_d * p))
        a_diag_src = a
        d_scale = inv_d.reshape(j_cap, 7)

    blocks = a_diag_src.reshape(j_cap, 7, j_cap, 7)
    diag = blocks[jnp.arange(j_cap), :, jnp.arange(j_cap), :]  # (J, 7, 7)
    if d_scale is not None:
        diag = diag * d_scale[:, :, None] * d_scale[:, None, :]
    eye7 = jnp.eye(7, dtype=a.dtype)
    diag_inv = jnp.linalg.inv(diag + 1e-8 * eye7)

    def precond(r):
        return jnp.einsum("jab,jb->ja", diag_inv,
                          r.reshape(j_cap, 7)).reshape(dim)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = r0 @ z0

    def body(_, carry):
        x, r, p, rz = carry
        ap = matvec(p)
        denom = p @ ap
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = r @ z
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iterations, body, (x0, r0, p0, rz0))
    return x


class LMResult(NamedTuple):
    beta: jnp.ndarray        # (J_cap, 7) final deformation parameters
    cost: jnp.ndarray        # () final accepted cost
    final_damping: jnp.ndarray  # ()


def lm_solve(cfg: SuPerConfig, ctx: LMContext, intr: Intrinsics,
             axis_name=None) -> LMResult:
    j_cap = ctx.ed_mask.shape[0]
    dim = 7 * j_cap
    dtype = ctx.d_eds.dtype

    beta0 = jnp.tile(IDENTITY_DQ.astype(dtype)[None, :], (j_cap, 1))
    u0 = jnp.asarray(cfg.solver.lm_damping_init, dtype)
    v = cfg.solver.lm_damping_factor
    best0 = jnp.asarray(1e10, dtype)
    diag_idx = jnp.arange(dim)

    # Frozen projective association (classical ICP mode): one sampling pass
    # at the identity warp; iterations re-linearize only the warp field.
    assoc = None
    if cfg.solver.association == "per_frame" and cfg.losses.sf_point_plane:
        assoc = associate(cfg, ctx, beta0, intr)

    def solve_damped(a, rhs):
        """Solve the damped, Jacobi-scaled normal system.

        Symmetric diagonal scaling first: the q- and b-columns differ in
        magnitude by ~1e3 (projection chain vs unit translations), which
        squares into the normal matrix; scaling recovers ~6 digits of f32
        accuracy.  The solution is mathematically unchanged (the reference
        solves raw in f64, super/LM.py:58-59).
        """
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(a), 1e-20))
        inv_d = 1.0 / d
        b_s = rhs * inv_d
        if cfg.solver.linear_solver == "pcg":
            # Scaling folded into the matvec: no second dim^2 buffer.
            x = _block_jacobi_pcg(a, b_s, j_cap,
                                  cfg.solver.pcg_iterations, inv_d=inv_d)
        else:
            a_s = a * inv_d[:, None] * inv_d[None, :]
            chol = jnp.linalg.cholesky(a_s)
            x = jax.scipy.linalg.cho_solve((chol, True), b_s)
        return x * inv_d

    def body(_, carry):
        beta, best_beta, best_cost, u = carry
        jtj, jtr = assemble_normal_equations(cfg, ctx, beta, intr,
                                             axis_name=axis_name,
                                             assoc=assoc)
        # Damping on the diagonal (LM.py:97) without materializing a dense
        # identity (dim^2 can be ~800 MB for dense ED graphs).
        a = jtj.at[diag_idx, diag_idx].add(u)
        delta = solve_damped(a, jtr)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0).reshape(j_cap, 7)
        beta_new = beta + delta
        cost = total_cost(cfg, ctx, beta_new, intr, axis_name=axis_name,
                          assoc=assoc)
        accept = ok & (cost < best_cost)
        best_beta = jnp.where(accept, beta_new, best_beta)
        best_cost = jnp.where(accept, cost, best_cost)
        u = jnp.where(accept, u / v, u * v)
        beta = jnp.where(accept, beta_new, best_beta)
        return beta, best_beta, best_cost, u

    _, best_beta, best_cost, u = jax.lax.fori_loop(
        0, cfg.solver.num_iterations, body, (beta0, beta0, best0, u0))
    return LMResult(beta=best_beta, cost=best_cost, final_damping=u)
