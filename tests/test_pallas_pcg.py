"""Fused-CG solve kernel (pallas_kernels/pcg.py) and its LM integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_scene

from super_tpu.core.lm import _block_precond_pcg_pallas, lm_solve
from super_tpu.core.losses import prepare_lm
from super_tpu.core.tracker import init_tracker
from super_tpu.pallas_kernels.pcg import pcg_pallas


def _spd(dim, seed=0, cond=1e3):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    ev = np.geomspace(1.0, cond, dim)
    return (q * ev) @ q.T


import pytest


@pytest.mark.parametrize("interpret", [False, True])
def test_pcg_pallas_matches_direct_solve(interpret):
    """interpret=True forces the actual kernel (interpreted off-TPU);
    interpret=False exercises the compiled-XLA fallback on CPU."""
    dim = 200  # not a multiple of row_block: exercises zero padding
    a = _spd(dim, cond=50.0).astype(np.float32)
    b = np.random.default_rng(1).standard_normal(dim).astype(np.float32)
    x = pcg_pallas(jnp.asarray(a), jnp.asarray(b), iterations=100,
                   row_block=128, interpret=interpret)
    x_ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-3, atol=2e-4)


def test_block_precond_pcg_matches_cholesky():
    """The full LM-style damped solve: block-preconditioned fused CG vs a
    dense f64 solve on a normal-equation-shaped system (strong 7x7 diagonal
    blocks + damping)."""
    j = 24
    dim = 7 * j
    rng = np.random.default_rng(2)
    jac = rng.standard_normal((3 * dim, dim)) * rng.uniform(
        0.1, 30.0, (1, dim))  # badly column-scaled, like q- vs b-columns
    a = (jac.T @ jac).astype(np.float32)
    u = 1.0
    a += u * np.eye(dim, dtype=np.float32)
    b = rng.standard_normal(dim).astype(np.float32)
    x = _block_precond_pcg_pallas(jnp.asarray(a), jnp.asarray(b), j,
                                  iterations=120)
    x_ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(np.asarray(x) / scale, x_ref / scale,
                               atol=5e-4)


def _pairs_cfg(cfg, **kw):
    return cfg.replace(solver=dataclasses.replace(
        cfg.solver, linear_solver="pairs_fused", **kw))


def test_pairs_sparse_assembly_matches_dense():
    """The (P, 49) pair-form normal equations (data + ARAP + rot), expanded
    to dense, must equal the dense assembly on the same layout."""
    from super_tpu.core import assembly
    from super_tpu.core.losses import assemble_normal_equations
    from super_tpu.geometry.quaternion import IDENTITY_DQ

    cfg, intr, seq, frames = tiny_scene(num_frames=3)
    cfg_sp = _pairs_cfg(cfg)
    state = init_tracker(cfg_sp, frames[0])
    ctx = prepare_lm(cfg_sp, state.surfels, state.graph, frames[2])
    j_cap = cfg.capacity.node_capacity
    beta = jnp.tile(IDENTITY_DQ[None], (j_cap, 1)) + 0.01

    acc, jtr_sp, cost_sp = assemble_normal_equations(
        cfg_sp, ctx, beta, intr, with_cost=True)
    # Same ctx/layout through the dense path (expand_pairs + block adds).
    cfg_d = cfg.replace(solver=dataclasses.replace(cfg.solver))
    jtj_d, jtr_d, cost_d = assemble_normal_equations(
        cfg_d, ctx, beta, intr, with_cost=True)

    pcap = acc.shape[0]
    dim = 7 * j_cap
    s = jnp.zeros((dim, dim), jnp.float32)
    s = assembly._scatter_blocks_set(s, ctx.layout.pair_dest,
                                     acc.reshape(pcap, 7, 7))
    dense_sp = s + s.T
    scale = float(jnp.max(jnp.abs(jtj_d))) + 1e-12
    np.testing.assert_allclose(np.asarray(dense_sp) / scale,
                               np.asarray(jtj_d) / scale, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jtr_sp), np.asarray(jtr_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(cost_sp), float(cost_d), rtol=1e-6)


def test_pairs_fused_solve_matches_dense_solve():
    from super_tpu.core.lm import _pairs_fused_solve
    from super_tpu.core.losses import assemble_normal_equations
    from super_tpu.geometry.quaternion import IDENTITY_DQ

    cfg, intr, seq, frames = tiny_scene(num_frames=3)
    cfg_sp = _pairs_cfg(cfg, pcg_iterations=100)
    state = init_tracker(cfg_sp, frames[0])
    ctx = prepare_lm(cfg_sp, state.surfels, state.graph, frames[2])
    j_cap = cfg.capacity.node_capacity
    beta = jnp.tile(IDENTITY_DQ[None], (j_cap, 1))

    acc, jtr, _ = assemble_normal_equations(cfg_sp, ctx, beta, intr,
                                            with_cost=True)
    jtj_d, _, _ = assemble_normal_equations(cfg, ctx, beta, intr,
                                            with_cost=True)
    u = jnp.float32(10.0)
    x = _pairs_fused_solve(cfg_sp, ctx.layout, acc, jtr, u, j_cap)
    dim = 7 * j_cap
    a = np.asarray(jtj_d, np.float64) + float(u) * np.eye(dim)
    x_ref = np.linalg.solve(a, np.asarray(jtr, np.float64))
    scale = np.abs(x_ref).max() + 1e-12
    np.testing.assert_allclose(np.asarray(x) / scale, x_ref / scale,
                               atol=1e-3)


def test_pairs_cg_ref_matches_kernel():
    """The compiled-XLA fallback (_pairs_cg_ref) must track the interpreted
    kernel bit-for-recurrence on the same padded inputs -- the multichip
    dryrun and CPU integration tests run the fallback, so its equivalence
    to the kernel IS the kernel's off-TPU validity."""
    from super_tpu.core.lm import _pairs_fused_solve
    from super_tpu.core.losses import assemble_normal_equations
    from super_tpu.geometry.quaternion import IDENTITY_DQ
    from super_tpu.pallas_kernels import pcg as pcg_mod

    cfg, intr, seq, frames = tiny_scene(num_frames=3)
    cfg_sp = _pairs_cfg(cfg, pcg_iterations=24)
    state = init_tracker(cfg_sp, frames[0])
    ctx = prepare_lm(cfg_sp, state.surfels, state.graph, frames[2])
    j_cap = cfg.capacity.node_capacity
    beta = jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
    acc, jtr, _ = assemble_normal_equations(cfg_sp, ctx, beta, intr,
                                            with_cost=True)
    u = jnp.float32(10.0)

    # Fallback path (default off-TPU), then the interpreted kernel forced
    # via interpret=True at the call site (_pairs_fused_solve resolves
    # pairs_cg_pallas through the module attribute at call time).
    import functools as ft
    x_ref = _pairs_fused_solve(cfg_sp, ctx.layout, acc, jtr, u, j_cap)
    orig = pcg_mod.pairs_cg_pallas
    pcg_mod.pairs_cg_pallas = ft.partial(orig, interpret=True)
    try:
        x_kern = _pairs_fused_solve(cfg_sp, ctx.layout, acc, jtr, u, j_cap)
    finally:
        pcg_mod.pairs_cg_pallas = orig
    scale = float(np.abs(np.asarray(x_kern)).max()) + 1e-12
    # f32 reassociation: one-hot-matmul gather/scatter vs index ops
    # accumulate in different orders.
    np.testing.assert_allclose(np.asarray(x_ref) / scale,
                               np.asarray(x_kern) / scale, atol=2e-4)


def test_lm_descends_with_pairs_fused():
    cfg, intr, seq, frames = tiny_scene(num_frames=3)
    cfg_sp = _pairs_cfg(cfg, pcg_iterations=48)
    state = init_tracker(cfg_sp, frames[0])
    ctx = prepare_lm(cfg_sp, state.surfels, state.graph, frames[2])
    res = jax.jit(lambda c: lm_solve(cfg_sp, c, intr))(ctx)
    assert np.isfinite(float(res.cost))
    assert np.abs(np.asarray(res.beta[:, 4:])).max() > 1e-4
    ctx_ref = prepare_lm(cfg, state.surfels, state.graph, frames[2])
    res_ref = jax.jit(lambda c: lm_solve(cfg, c, intr))(ctx_ref)
    # atol floor: both costs converge to ~2e-7 on this scene, where f32
    # solver rounding flips late accept/reject decisions.
    np.testing.assert_allclose(float(res.cost), float(res_ref.cost),
                               rtol=0.05, atol=1e-7)


def test_lm_descends_with_pcg_pallas():
    cfg, intr, seq, frames = tiny_scene(num_frames=3)
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver, linear_solver="pcg_pallas", pcg_iterations=48))
    state = init_tracker(cfg, frames[0])
    ctx = prepare_lm(cfg, state.surfels, state.graph, frames[2])
    res = jax.jit(lambda c: lm_solve(cfg, c, intr))(ctx)
    assert np.isfinite(float(res.cost))
    # The solve moved the warp field and reached a small cost.
    assert np.abs(np.asarray(res.beta[:, 4:])).max() > 1e-4
    cfg_ref = cfg.replace(solver=dataclasses.replace(
        cfg.solver, linear_solver="cholesky"))
    res_ref = jax.jit(lambda c: lm_solve(cfg_ref, c, intr))(ctx)
    # Same accept/reject path and comparable final cost as Cholesky.
    np.testing.assert_allclose(float(res.cost), float(res_ref.cost),
                               rtol=0.05)


def test_pcg_kernels_vmap_safe():
    """Batched (multi-stream) solves must lower via sequential_vmap instead
    of breaking the kernels' block specs -- regression for the streams>1
    bench crash ('block shape ... divisible by 8 and 128' on the batched
    SMEM scalar)."""
    dim = 128
    rng = np.random.default_rng(5)
    a = np.stack([_spd(dim, seed=s, cond=20.0) for s in (0, 1)]).astype(
        np.float32)
    b = rng.standard_normal((2, dim)).astype(np.float32)
    x = jax.vmap(lambda ai, bi: pcg_pallas(ai, bi, iterations=80,
                                           row_block=128))(
        jnp.asarray(a), jnp.asarray(b))
    for i in range(2):
        x_ref = np.linalg.solve(a[i].astype(np.float64),
                                b[i].astype(np.float64))
        np.testing.assert_allclose(np.asarray(x[i]), x_ref, rtol=5e-3,
                                   atol=5e-4)


def test_lm_pairs_fused_vmap_batches():
    """Full lm_solve with the pairs_fused kernel under vmap (the
    multi-stream batch path of parallel/sharded.make_batched_step)."""
    cfg, intr, seq, frames = tiny_scene(num_frames=3)
    cfg_sp = _pairs_cfg(cfg, pcg_iterations=48)
    state = init_tracker(cfg_sp, frames[0])
    ctx = prepare_lm(cfg_sp, state.surfels, state.graph, frames[2])
    ctxs = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (2,) + x.shape),
                        ctx)
    res = jax.jit(jax.vmap(lambda c: lm_solve(cfg_sp, c, intr)))(ctxs)
    costs = np.asarray(res.cost)
    assert np.isfinite(costs).all()
    np.testing.assert_allclose(costs[0], costs[1], rtol=1e-6)


def test_pairs_cg_chunked_kernel_matches_persistent():
    """The chunked-one-hot kernel (dense pair tables) must match the
    persistent-one-hot kernel on identical padded inputs (both run
    interpreted off-TPU; the chunked path is forced by lowering the
    VMEM threshold)."""
    import functools as ft

    from super_tpu.core.lm import _pairs_fused_solve
    from super_tpu.core.losses import assemble_normal_equations
    from super_tpu.geometry.quaternion import IDENTITY_DQ
    from super_tpu.pallas_kernels import pcg as pcg_mod

    cfg, intr, seq, frames = tiny_scene(num_frames=3)
    cfg_sp = _pairs_cfg(cfg, pcg_iterations=16)
    state = init_tracker(cfg_sp, frames[0])
    ctx = prepare_lm(cfg_sp, state.surfels, state.graph, frames[2])
    j_cap = cfg.capacity.node_capacity
    beta = jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
    acc, jtr, _ = assemble_normal_equations(cfg_sp, ctx, beta, intr,
                                            with_cost=True)
    u = jnp.float32(10.0)

    orig = pcg_mod.pairs_cg_pallas
    pcg_mod.pairs_cg_pallas = ft.partial(orig, interpret=True)
    try:
        x_pers = _pairs_fused_solve(cfg_sp, ctx.layout, acc, jtr, u, j_cap)
        old_max = pcg_mod._PAIRS_PERSISTENT_OH_MAX
        old_chunk = pcg_mod._PAIRS_CHUNK
        pcg_mod._PAIRS_PERSISTENT_OH_MAX = 0   # force the chunked kernel
        pcg_mod._PAIRS_CHUNK = 128             # non-divisor: exercises pad
        try:
            x_chunk = _pairs_fused_solve(cfg_sp, ctx.layout, acc, jtr, u,
                                         j_cap)
        finally:
            pcg_mod._PAIRS_PERSISTENT_OH_MAX = old_max
            pcg_mod._PAIRS_CHUNK = old_chunk
    finally:
        pcg_mod.pairs_cg_pallas = orig
    scale = float(np.abs(np.asarray(x_pers)).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(x_chunk) / scale,
                               np.asarray(x_pers) / scale, atol=2e-5)
