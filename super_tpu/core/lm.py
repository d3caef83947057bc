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

Three schedules (SolverConfig.lm_schedule / lm_hypotheses):
  - "classic": the reference loop verbatim -- assembly at the accepted
    point plus a separate candidate cost pass each iteration;
  - "deferred" (default): the candidate's cost falls out of the next
    iteration's assembly and the accepted (JTJ, JTr) is cached, so each
    iteration is ONE fused residual/Jacobian pass (see
    _lm_solve_deferred);
  - lm_hypotheses > 1: H damping values solved and cost-tested in batch
    per assembly (_lm_solve_hypotheses) -- the parallel accept/reject axis
    the sequential reference cannot express.

f32 on TPU (the reference solves in f64); damping keeps the normal matrix
PD.  tests/test_lm.py checks the assembled normal equations against f64
autodiff, cost descent on synthetic scenes, and schedule equivalence;
tests/test_golden_lm.py cross-checks per-iteration semantics against an
independent NumPy f64 port of the reference loop.
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


def _block_jacobi_pcg(a, b, j_cap: int, iterations: int, inv_d=None,
                      scaled_eps: float = 0.0, x0=None):
    """Preconditioned conjugate gradients on the (Jacobi-scaled) normal
    system.

    Preconditioner: inverted 7x7 diagonal node blocks.  A fixed trip count
    keeps the solve branch-free (inexact Newton; the LM accept/reject loop
    absorbs solve error).  This is the path that scales to dense ED graphs
    where a 7J x 7J Cholesky becomes the bottleneck (BASELINE dense config).

    When ``inv_d`` is given, ``a`` is the *unscaled* matrix and the
    symmetric scaling D^-1/2 A D^-1/2 is folded into the matvec -- avoiding
    a second dim^2 buffer (822 MB at J = 2048).

    ``scaled_eps`` adds Tikhonov damping in the *scaled* space (unit
    diagonal), where a storage-precision perturbation has a known spectral
    norm: bf16 accumulators (jtj_dtype="bf16") carry elementwise noise
    ~eps_bf16 whose dim x dim random sign pattern reaches ||E||_2 ~
    eps_bf16 * sqrt(dim) -- enough to push near-null eigenvalues of the
    scaled system negative and blow up CG.  Damping at that magnitude
    restores PD; the step stays a descent direction and the LM
    accept/reject loop absorbs the extra inexactness.
    """
    dim = 7 * j_cap
    # (No optimization_barrier on `a`: measured at dim=8512 on TPU,
    # forcing a separate materialization of the damped matrix made the
    # dense LM ~7% SLOWER -- XLA's fusion of the construction into the
    # loop is beneficial here, unlike the gather-duplication cases.)

    def mv(p):
        if a.dtype == jnp.bfloat16:
            # Keep the dot ALL-bf16 (f32 accumulation): a mixed
            # bf16 @ f32 dot re-upcasts the matrix every iteration
            # (measured 1.29 ms/iter at dim=8512 vs 0.28 all-bf16).
            # The Krylov vector's bf16 truncation is absorbed like the
            # matrix's own storage noise (scaled_eps damping + the LM
            # accept/reject loop around the inexact-Newton solve).
            return jax.lax.dot(a, p.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
        return a @ p

    if inv_d is None:
        def matvec(p):
            return mv(p) + scaled_eps * p
        a_diag_src = a
        d_scale = None
    else:
        def matvec(p):
            return inv_d * mv(inv_d * p) + scaled_eps * p
        a_diag_src = a
        d_scale = inv_d.reshape(j_cap, 7)

    blocks = a_diag_src.reshape(j_cap, 7, j_cap, 7)
    diag = blocks[jnp.arange(j_cap), :, jnp.arange(j_cap), :]  # (J, 7, 7)
    diag = diag.astype(b.dtype)  # f32 preconditioner even for bf16 A
    if d_scale is not None:
        diag = diag * d_scale[:, :, None] * d_scale[:, None, :]
    eye7 = jnp.eye(7, dtype=b.dtype)
    diag_inv = jnp.linalg.inv(diag + (1e-8 + scaled_eps) * eye7)

    def precond(r):
        return jnp.einsum("jab,jb->ja", diag_inv,
                          r.reshape(j_cap, 7)).reshape(dim)

    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        # Warm start (consecutive damped LM systems differ mildly; the
        # deferred loop zeroes x0 after a reject): one extra matvec.
        r0 = b - matvec(x0)
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


def _block_precond_pcg_pallas(a, rhs, j_cap: int, iterations: int):
    """Damped-normal-system solve via the fused Pallas CG kernel.

    Block preconditioning is folded into the system: with L the batched
    Cholesky of A's 7x7 diagonal node blocks (damping keeps them PD),
    A-hat = L^-1 A L^-T has unit diagonal blocks, so the kernel runs plain
    CG (no preconditioner state) and x = L^-T x-hat.  This subsumes the
    Jacobi scaling of the cholesky/pcg paths (the block scaling IS the
    symmetric scaling, extended to the full 7x7 coupling).

    Equivalent to _block_jacobi_pcg in exact arithmetic; one kernel launch
    instead of ~10 XLA kernels per CG iteration (pallas_kernels/pcg.py).
    """
    from super_tpu.pallas_kernels.pcg import pcg_pallas

    dim = 7 * j_cap
    blocks = a.reshape(j_cap, 7, j_cap, 7)[
        jnp.arange(j_cap), :, jnp.arange(j_cap), :]          # (J, 7, 7)
    eye7 = jnp.eye(7, dtype=rhs.dtype)
    chol = jnp.linalg.cholesky(blocks.astype(rhs.dtype) + 1e-8 * eye7)
    linv = jax.scipy.linalg.solve_triangular(
        chol, jnp.broadcast_to(eye7, (j_cap, 7, 7)), lower=True)
    # A-hat = (I (x) L^-1) A (I (x) L^-T), applied as two batched 7-row
    # transforms (each one pass over the 20 MB matrix).
    a1 = jnp.einsum("jik,jkd->jid", linv, a.reshape(j_cap, 7, dim),
                    precision=jax.lax.Precision.HIGHEST).reshape(dim, dim)
    a_hat = jnp.einsum("djk,jik->dji", a1.reshape(dim, j_cap, 7), linv,
                       precision=jax.lax.Precision.HIGHEST).reshape(dim, dim)
    b_hat = jnp.einsum("jik,jk->ji", linv,
                       rhs.reshape(j_cap, 7)).reshape(dim)
    x_hat = pcg_pallas(a_hat, b_hat, iterations=iterations)
    return jnp.einsum("jki,jk->ji", linv,
                      x_hat.reshape(j_cap, 7)).reshape(dim)


def _pairs_fused_solve(cfg: SuPerConfig, layout, acc, rhs, u, j_cap: int,
                       x0=None):
    """Damped solve on the SPARSE pair-form normal equations.

    ``acc`` (P, 49) holds the distinct-node-pair blocks (symmetric half,
    diagonal pairs halved: dense = S + S^T).  No dense (7J)^2 matrix is
    ever built: the block-Jacobi-preconditioned CG runs in ONE Pallas
    kernel with the pair blocks VMEM-resident and the one-hot gather/
    scatter matrices regenerated on the fly (pallas_kernels/pcg.py:
    pairs_cg_pallas).  Replaces expand_pairs + damping + Cholesky.
    """
    from super_tpu.pallas_kernels.pcg import pairs_cg_pallas

    pcap = acc.shape[0]
    # Diagonal 7x7 blocks: dense diag = d + d^T (halved convention).
    dr = jnp.clip(layout.diag_rank, 0, pcap - 1)
    dhalf = acc[dr].reshape(j_cap, 7, 7)
    dhalf = jnp.where((layout.diag_rank < pcap - 1)[:, None, None], dhalf,
                      0.0)
    dblk = dhalf + jnp.swapaxes(dhalf, 1, 2)
    eye7 = jnp.eye(7, dtype=rhs.dtype)

    # Raw-space solve with a block-Jacobi preconditioner.  (Two scaling
    # experiments measured and rejected on the dense J=1131 workload:
    # folding a block-Cholesky transform into the pair system blows up on
    # near-singular node blocks at small damping (2.45 px vs 1.14 raw),
    # and symmetric Jacobi vector scaling is a wash (1.17 px) -- the pair
    # CG is not conditioning-limited; block-Jacobi already absorbs the
    # q-vs-b column spread.)
    minv = jnp.linalg.inv(dblk + (u + 1e-8) * eye7)        # (J, 7, 7)
    rhs_solve = rhs
    u_solve = u

    # Diagonal-band layouts for the kernel's rolled matvec (row 8d+i):
    #   blk_pad[8d+i]  = B[i, (i+d) % 8]    (y1 = B x2)
    #   blkt_pad[8d+i] = B[(i+d) % 8, i]    (y2 = B^T x1)
    #   minv_pad[8d+i] = Minv[i, (i+d) % 8]
    # (row/col 7 of the 8-padded blocks are zero rows).
    acc_t = acc.T                                          # (49, P)
    idx_fwd = []
    idx_rev = []
    for d in range(8):
        for i in range(8):
            j = (i + d) % 8
            ok = (i < 7) and (j < 7)
            idx_fwd.append(i * 7 + j if ok else 49)
            idx_rev.append(j * 7 + i if ok else 49)
    pad_rows = jnp.concatenate([acc_t, jnp.zeros((1,) + acc_t.shape[1:],
                                                 acc_t.dtype)])
    blk_pad = pad_rows[jnp.asarray(idx_fwd)]               # (64, P)
    blkt_pad = pad_rows[jnp.asarray(idx_rev)]
    minv_t = minv.transpose(1, 2, 0).reshape(49, j_cap)    # [i*7+j] = M[i,j]
    minv_rows = jnp.concatenate([minv_t, jnp.zeros((1, j_cap),
                                                   minv_t.dtype)])
    minv_pad = minv_rows[jnp.asarray(idx_fwd)]             # (64, J)

    n1 = (layout.pair_dest[:, 0] // 7).astype(jnp.int32)   # J (=dim//7) when
    n2 = (layout.pair_dest[:, 1] // 7).astype(jnp.int32)   # sink -> no match
    b_fm = rhs_solve.reshape(j_cap, 7).T                   # (7, J)
    x0_fm = None if x0 is None else x0.reshape(j_cap, 7).T
    x_fm = pairs_cg_pallas(blk_pad, blkt_pad, n1, n2, minv_pad, b_fm,
                           u_solve.astype(rhs.dtype), x0_fm,
                           iterations=cfg.solver.pcg_iterations)
    return x_fm.T.reshape(7 * j_cap)


class LMResult(NamedTuple):
    beta: jnp.ndarray        # (J_cap, 7) final deformation parameters
    cost: jnp.ndarray        # () final accepted cost
    final_damping: jnp.ndarray  # ()


def lm_solve(cfg: SuPerConfig, ctx: LMContext, intr: Intrinsics,
             axis_name=None) -> LMResult:
    if cfg.solver.jtj_dtype == "bf16" and \
            cfg.solver.linear_solver != "pcg":
        raise ValueError(
            "jtj_dtype='bf16' requires linear_solver='pcg' (the dense "
            "Cholesky would materialize an f32 copy, defeating the bf16 "
            "accumulator's memory purpose)")
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
    # "per_iteration_frozen" RE-associates at every candidate but keeps the
    # frozen-target Jacobian (no chain through the bilinear weights) -- the
    # experiment splitting the reference-semantics accuracy gap: if the
    # moving mode's extra error comes from the target-chasing sampling
    # chain, this mode should match per_frame; if from re-association
    # itself, it should match per_iteration (README Status).
    assoc = None
    per_it_frozen = (cfg.solver.association == "per_iteration_frozen"
                     and cfg.losses.sf_point_plane)
    if cfg.solver.association == "per_frame" and cfg.losses.sf_point_plane:
        assoc = associate(cfg, ctx, beta0, intr, identity=True)

    pairs_fused = cfg.solver.linear_solver == "pairs_fused"

    def solve_damped(a, rhs, x0=None):
        """Solve the damped, Jacobi-scaled normal system.

        Symmetric diagonal scaling first: the q- and b-columns differ in
        magnitude by ~1e3 (projection chain vs unit translations), which
        squares into the normal matrix; scaling recovers ~6 digits of f32
        accuracy.  The solution is mathematically unchanged (the reference
        solves raw in f64, super/LM.py:58-59).

        With a bf16 ``a`` (jtj_dtype="bf16", dense ED graphs) the PCG
        matvec reads bf16 and accumulates f32; everything vector-sized
        stays f32.
        """
        if pairs_fused:
            acc, u = a     # damped() defers damping to the solve
            return _pairs_fused_solve(cfg, ctx.layout, acc, rhs, u, j_cap,
                                      x0=x0)
        if cfg.solver.linear_solver == "pcg_pallas":
            return _block_precond_pcg_pallas(a.astype(rhs.dtype), rhs, j_cap,
                                             cfg.solver.pcg_iterations)
        diag_a = jnp.diagonal(a).astype(rhs.dtype)
        d = jnp.sqrt(jnp.maximum(diag_a, 1e-20))
        inv_d = 1.0 / d
        b_s = rhs * inv_d
        if cfg.solver.linear_solver == "pcg":
            # Scaling folded into the matvec: no second dim^2 buffer.
            # bf16 storage: damp by the storage-noise spectral norm
            # (see _block_jacobi_pcg docstring) to keep CG PD.
            eps_s = 0.0
            if a.dtype == jnp.bfloat16:
                eps_s = float(2.0 ** -8) * float(dim) ** 0.5
            # Warm start in the SCALED space: x_s = d * x.
            x0_s = None if x0 is None else x0 * d
            x = _block_jacobi_pcg(a, b_s, j_cap,
                                  cfg.solver.pcg_iterations, inv_d=inv_d,
                                  scaled_eps=eps_s, x0=x0_s)
        else:
            a_s = a * inv_d[:, None] * inv_d[None, :]
            chol = jnp.linalg.cholesky(a_s)
            x = jax.scipy.linalg.cho_solve((chol, True), b_s)
        return x * inv_d

    def assemble(beta):
        a = associate(cfg, ctx, beta, intr) if per_it_frozen else assoc
        return assemble_normal_equations(cfg, ctx, beta, intr,
                                         axis_name=axis_name, assoc=a,
                                         with_cost=True)

    def damped(jtj, u):
        if pairs_fused:
            return (jtj, u)  # sparse pair form: damping applied in-solve
        # Damping on the diagonal (LM.py:97) without materializing a dense
        # identity (dim^2 can be ~800 MB for dense ED graphs).
        return jtj.at[diag_idx, diag_idx].add(u.astype(jtj.dtype))

    if cfg.solver.lm_hypotheses > 1:
        return _lm_solve_hypotheses(cfg, ctx, intr, axis_name, assoc, beta0,
                                    u0, v, best0, assemble, damped,
                                    solve_damped)
    if cfg.solver.lm_schedule == "deferred":
        def final_cost(beta):
            return total_cost(cfg, ctx, beta, intr, axis_name=axis_name,
                              assoc=assoc)

        return _lm_solve_deferred(cfg, beta0, u0, v, assemble, damped,
                                  solve_damped, final_cost)

    def body(_, carry):
        beta, best_beta, best_cost, u, delta_prev = carry
        jtj, jtr, _ = assemble(beta)
        a = damped(jtj, u)
        delta = solve_damped(a, jtr, x0=delta_prev)
        # (delta_prev is zeroed on reject below, so a rejected step's
        # overlong delta never warm-starts the more-damped re-solve.)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        beta_new = beta + delta.reshape(j_cap, 7)
        cost = total_cost(cfg, ctx, beta_new, intr, axis_name=axis_name,
                          assoc=assoc)
        accept = ok & (cost < best_cost)
        best_beta = jnp.where(accept, beta_new, best_beta)
        best_cost = jnp.where(accept, cost, best_cost)
        u = jnp.where(accept, u / v, u * v)
        beta = jnp.where(accept, beta_new, best_beta)
        return beta, best_beta, best_cost, u, jnp.where(accept, delta, 0.0)

    _, best_beta, best_cost, u, _ = jax.lax.fori_loop(
        0, cfg.solver.num_iterations, body,
        (beta0, beta0, best0, u0, jnp.zeros((dim,), dtype)))
    return LMResult(beta=best_beta, cost=best_cost, final_damping=u)


def _lm_solve_deferred(cfg: SuPerConfig, beta0, u0, v, assemble, damped,
                       solve_damped, final_cost=None) -> LMResult:
    """Deferred-acceptance LM: one fused assemble+cost pass per iteration.

    The classic loop runs two residual passes per iteration (Jacobian
    assembly at the accepted point, then a separate cost evaluation at the
    candidate).  Here each iteration assembles at the *candidate*; the cost
    of that candidate falls out of the same pass, the accept/reject test
    runs on it, and the accepted (JTJ, JTr) is cached in the loop carry so
    a rejection re-solves from the cache instead of re-assembling.

    Trip 0 is special: it caches beta0's normal equations but leaves
    best_cost at the reference's 1e10 init (the reference never evaluates
    the cost at beta0, LM.py:81), so candidate 1 is accepted against 1e10
    exactly as in the classic loop; u starts at u0*v so trip 0's accept
    restores u0 for the first solve.  The candidate sequence is then
    *identical* to the classic schedule, at one residual pass per
    iteration instead of two.

    num_iterations trips evaluate beta0 plus the first num_iterations-1
    candidates; the LAST candidate's assembly would be discarded either
    way (the loop ends after its accept test), so it is judged by a
    residual-only cost pass (``final_cost``) instead of a full
    assemble+solve trip -- same accept decision, ~1/5 the cost.
    """
    j_cap = beta0.shape[0]
    dim = 7 * j_cap
    dtype = beta0.dtype
    acc_dtype = jnp.bfloat16 if cfg.solver.jtj_dtype == "bf16" else dtype
    if cfg.solver.linear_solver == "pairs_fused":
        # Sparse pair-form carry: (P, 49) instead of the (7J)^2 dense
        # matrix -- 0.8 MB vs 20 MB at J=320 in the fori_loop carry.
        zero_jtj = jnp.zeros((cfg.solver.assembly_pair_cap, 49), dtype)
    else:
        zero_jtj = jnp.zeros((dim, dim), acc_dtype)
    zero_jtr = jnp.zeros((dim,), dtype)
    big = jnp.asarray(1e10, dtype)

    def body(i, carry):
        (beta_cand, best_beta, best_cost, best_jtj, best_jtr, u,
         delta_prev) = carry
        jtj_c, jtr_c, cost_c = assemble(beta_cand)
        first = i == 0
        accept = first | (jnp.all(jnp.isfinite(jtr_c)) &
                          (cost_c < best_cost))
        best_beta = jnp.where(accept, beta_cand, best_beta)
        # Reference semantics: beta0's cost is never recorded, so the first
        # candidate is judged against the 1e10 init (LM.py:81,109).
        best_cost = jnp.where(first, best_cost,
                              jnp.where(accept, cost_c, best_cost))
        best_jtj = jnp.where(accept, jtj_c, best_jtj)
        best_jtr = jnp.where(accept, jtr_c, best_jtr)
        u = jnp.where(accept, u / v, u * v)
        # x0 = previous delta: warm-starts the iterative solvers
        # (consecutive damped systems differ mildly); direct solvers
        # ignore it, so candidates are unchanged there.  After a REJECT
        # the damping jumped v x and the stale delta is a bad init
        # (overlong; CG wastes iterations walking it back) -- cold-start.
        x0 = jnp.where(accept, delta_prev, 0.0)
        delta = solve_damped(damped(best_jtj, u), best_jtr, x0=x0)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        beta_cand = best_beta + delta.reshape(j_cap, 7)
        return (beta_cand, best_beta, best_cost, best_jtj, best_jtr, u,
                delta)

    init = (beta0, beta0, big, zero_jtj, zero_jtr, u0 * v,
            jnp.zeros((dim,), dtype))
    trips = cfg.solver.num_iterations + (0 if final_cost is not None else 1)
    cand, best_beta, best_cost, _, _, u, _ = jax.lax.fori_loop(
        0, trips, body, init)
    if final_cost is not None:
        # Accept test for the last candidate without assembling equations
        # nobody would consume (same branch-free update as the loop body).
        cost_c = final_cost(cand)
        accept = jnp.isfinite(cost_c) & (cost_c < best_cost)
        best_beta = jnp.where(accept, cand, best_beta)
        best_cost = jnp.where(accept, cost_c, best_cost)
        u = jnp.where(accept, u / v, u * v)
    return LMResult(beta=best_beta, cost=best_cost, final_damping=u)


def _lm_solve_hypotheses(cfg: SuPerConfig, ctx: LMContext, intr, axis_name,
                         assoc, beta0, u0, v, best0, assemble, damped,
                         solve_damped) -> LMResult:
    """Batched damping hypotheses: one assembly, H damped solves + H costs.

    Per iteration the normal equations are assembled once at the accepted
    point, then H = lm_hypotheses damping values {u v^-(H-1), ..., u v^-1, u}
    are tried *in parallel*: the H Cholesky solves batch on the MXU and the
    H candidate costs batch through one vmapped residual pass.  The best
    improving candidate is accepted and u continues from its damping
    (divided once more, as in the accept branch of LM.py:109-117); if none
    improve, u *= v as in the reject branch.  H=2 reproduces the classic
    one-test schedule's accept outcome while also probing the next-smaller
    damping, so each assembly explores twice the damping ladder.

    Under the production ``pairs_fused`` solver the H damped solves run as
    H *sequential* Pallas CG launches sharing the one assembled pair table
    (the kernel pipelines its own grid and is not vmappable; H is tiny and
    each launch is sub-ms, so sequential solves cost far less than the
    assembly they share).  The H candidate costs still batch through one
    vmapped residual pass.
    """
    hyp = cfg.solver.lm_hypotheses
    j_cap = beta0.shape[0]
    dtype = beta0.dtype
    # Exponents {-(H-1), ..., -1, 0}: probe smaller dampings than u.
    exps = jnp.arange(-(hyp - 1), 1, dtype=dtype)

    def body(_, carry):
        beta, best_beta, best_cost, u = carry
        jtj, jtr, _ = assemble(beta)
        us = u * jnp.asarray(v, dtype) ** exps                  # (H,)
        if cfg.solver.linear_solver == "pairs_fused":
            # H sequential kernel launches over the shared pair table.
            deltas = jnp.stack([solve_damped(damped(jtj, us[h]), jtr)
                                for h in range(hyp)])
        else:
            deltas = jax.vmap(
                lambda ui: solve_damped(damped(jtj, ui), jtr))(us)
        oks = jnp.all(jnp.isfinite(deltas), axis=-1)            # (H,)
        deltas = jnp.where(oks[:, None], deltas, 0.0)
        cands = beta[None] + deltas.reshape(hyp, j_cap, 7)      # (H, J, 7)
        costs = jax.vmap(lambda b: total_cost(cfg, ctx, b, intr,
                                              axis_name=axis_name,
                                              assoc=assoc))(cands)
        costs = jnp.where(oks, costs, jnp.inf)
        h_star = jnp.argmin(costs)
        cost_star = costs[h_star]
        accept = cost_star < best_cost
        beta_new = cands[h_star]
        best_beta = jnp.where(accept, beta_new, best_beta)
        best_cost = jnp.where(accept, cost_star, best_cost)
        u = jnp.where(accept, us[h_star] / v, u * v)
        beta = jnp.where(accept, beta_new, best_beta)
        return beta, best_beta, best_cost, u

    _, best_beta, best_cost, u = jax.lax.fori_loop(
        0, cfg.solver.num_iterations, body, (beta0, beta0, best0, u0))
    return LMResult(beta=best_beta, cost=best_cost, final_damping=u)
