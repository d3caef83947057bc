"""LM solver stack: analytic JTJ vs autodiff, cost descent, graph builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config, tiny_scene

from super_tpu.core.anchoring import update_graph_knn
from super_tpu.core.graph import build_graph, grid_layout
from super_tpu.core.lm import lm_solve
from super_tpu.core.losses import (
    arap_term_residual,
    assemble_normal_equations,
    data_term_residual,
    prepare_lm,
    rot_term_residual,
    total_cost,
)
from super_tpu.core.tracker import init_tracker
from super_tpu.geometry.quaternion import IDENTITY_DQ


@pytest.fixture(scope="module")
def scene():
    return tiny_scene(num_frames=6)


@pytest.fixture(scope="module")
def tracker0(scene):
    cfg, intr, seq, frames = scene
    return init_tracker(cfg, frames[0])


def test_grid_layout_static():
    anchor_pix, edges, tris = grid_layout(48, 64, 8)
    assert anchor_pix.shape == (48,)       # 6 x 8 grid
    # Interior cell has 4 edges; boundary cells fewer.
    assert edges.shape[1] == 2 and tris.shape[1] == 3
    assert edges.max() < 48 and tris.max() < 48
    # 5x7 full cells -> 2 triangles each.
    assert len(tris) == 2 * 5 * 7


def test_graph_builder(scene, tracker0):
    cfg, intr, seq, frames = scene
    g = tracker0.graph
    n_active = int(g.num_active)
    assert 30 <= n_active <= 48
    act = np.asarray(g.active)
    radii = np.asarray(g.radii)
    assert np.all(radii[act] > 0)
    e = np.asarray(g.edges)
    ea = np.asarray(g.edge_active)
    assert np.all(act[e[ea][:, 0]]) and np.all(act[e[ea][:, 1]])
    # knn weights of active nodes sum to 1
    w = np.asarray(g.knn_w)[act]
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)


def _to64(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def _scatter_cfg(cfg):
    import dataclasses
    return cfg.replace(solver=dataclasses.replace(cfg.solver,
                                                  assembly_mode="scatter"))


def test_jtj_matches_autodiff(scene, tracker0):
    """The hand-assembled normal equations must equal J^T J / -J^T r computed
    by autodiff of the residual vector (both f64)."""
    cfg, intr, seq, frames = scene
    cfg = _scatter_cfg(cfg)
    st = tracker0
    ctx = _to64(prepare_lm(cfg, st.surfels, st.graph, frames[1]))
    # Slice the surfel dimension to keep the autodiff Jacobian cheap: the
    # assembly treats rows independently, so a subset is a full check.
    ns = 384
    ctx = ctx._replace(
        sf_mask=ctx.sf_mask[:ns], sf_knn_idx=ctx.sf_knn_idx[:, :ns],
        sf_knn_w=ctx.sf_knn_w[:, :ns], sf_knn=ctx.sf_knn[:, :ns],
        sf_diff=ctx.sf_diff[:, :ns])
    intr64 = _to64(intr)
    j_cap = ctx.ed_mask.shape[0]

    rng = np.random.default_rng(1)
    beta = jnp.tile(IDENTITY_DQ.astype(jnp.float64)[None], (j_cap, 1))
    beta = beta + 0.01 * jnp.asarray(rng.normal(size=beta.shape))

    ls = cfg.losses

    def rvec(b):
        r1, _ = data_term_residual(cfg, ctx, b, intr64,
                                   ls.sf_point_plane_weight)
        r2 = arap_term_residual(ctx, b, ls.mesh_arap_weight).reshape(-1)
        r3 = rot_term_residual(b, ctx.ed_mask, ls.mesh_rot_weight)
        return jnp.concatenate([r1, r2, r3])

    r = rvec(beta)
    jac = jax.jacrev(rvec)(beta).reshape(r.shape[0], j_cap * 7)
    jtj_ad = jac.T @ jac
    jtr_ad = -jac.T @ r

    jtj, jtr = assemble_normal_equations(cfg, ctx, beta, intr64)
    scale = float(jnp.max(jnp.abs(jtj_ad))) + 1e-12
    np.testing.assert_allclose(np.asarray(jtj) / scale,
                               np.asarray(jtj_ad) / scale, atol=1e-9)
    rscale = float(jnp.max(jnp.abs(jtr_ad))) + 1e-12
    np.testing.assert_allclose(np.asarray(jtr) / rscale,
                               np.asarray(jtr_ad) / rscale, atol=1e-9)


def test_tuple_assembly_matches_scatter(scene, tracker0):
    """The tuple-grouped MXU assembly must produce the same normal equations
    as the direct scatter path."""
    cfg, intr, seq, frames = scene
    st = tracker0
    rng = np.random.default_rng(5)
    j_cap = cfg.capacity.node_capacity
    beta = (jnp.tile(IDENTITY_DQ.astype(jnp.float64)[None], (j_cap, 1))
            + 0.01 * jnp.asarray(rng.normal(size=(j_cap, 7))))

    ctx_t = _to64(prepare_lm(cfg, st.surfels, st.graph, frames[1]))
    assert ctx_t.layout is not None
    jtj_t, jtr_t = assemble_normal_equations(cfg, ctx_t, beta, _to64(intr))

    cfg_s = _scatter_cfg(cfg)
    ctx_s = _to64(prepare_lm(cfg_s, st.surfels, st.graph, frames[1]))
    assert ctx_s.layout is None
    jtj_s, jtr_s = assemble_normal_equations(cfg_s, ctx_s, beta, _to64(intr))

    scale = float(jnp.max(jnp.abs(jtj_s))) + 1e-12
    np.testing.assert_allclose(np.asarray(jtj_t) / scale,
                               np.asarray(jtj_s) / scale, atol=1e-10)
    rscale = float(jnp.max(jnp.abs(jtr_s))) + 1e-12
    np.testing.assert_allclose(np.asarray(jtr_t) / rscale,
                               np.asarray(jtr_s) / rscale, atol=1e-10)


def test_f32_assembly_close_to_f64(scene, tracker0):
    cfg, intr, seq, frames = scene
    st = tracker0
    ctx32 = prepare_lm(cfg, st.surfels, st.graph, frames[1])
    ctx64 = _to64(ctx32)
    j_cap = ctx32.ed_mask.shape[0]
    # Generic beta: at exact identity the frame-0 surfels sit on pixel
    # centers, where f32 vs f64 rounding flips sampling masks -- a
    # degenerate configuration that says nothing about solver precision.
    rng = np.random.default_rng(3)
    beta32 = (jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
              + 0.01 * jnp.asarray(rng.normal(size=(j_cap, 7)),
                                   dtype=jnp.float32))
    jtj32, jtr32 = assemble_normal_equations(cfg, ctx32, beta32, intr)
    jtj64, jtr64 = assemble_normal_equations(
        cfg, ctx64, beta32.astype(jnp.float64), _to64(intr))
    denom = float(jnp.linalg.norm(jtj64))
    assert float(jnp.linalg.norm(jtj32.astype(jnp.float64) - jtj64)) / denom < 1e-4


def test_pcg_solver_matches_cholesky(scene, tracker0):
    """Block-Jacobi PCG must reach the Cholesky solution on the real damped
    normal system (dense-graph scalability path)."""
    import dataclasses

    cfg, intr, seq, frames = scene
    st = tracker0
    ctx = prepare_lm(cfg, st.surfels, st.graph, frames[1])
    j_cap = ctx.ed_mask.shape[0]
    beta = jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
    jtj, jtr = assemble_normal_equations(cfg, ctx, beta, intr)
    a = jtj + 10.0 * jnp.eye(7 * j_cap)

    from super_tpu.core.lm import _block_jacobi_pcg

    d = jnp.sqrt(jnp.maximum(jnp.diagonal(a), 1e-20))
    a_s = a / d[:, None] / d[None, :]
    b_s = jtr / d
    x_chol = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(a_s), True), b_s)
    x_pcg = _block_jacobi_pcg(a_s, b_s, j_cap, 128)
    denom = float(jnp.linalg.norm(x_chol)) + 1e-12
    rel = float(jnp.linalg.norm(x_pcg - x_chol)) / denom
    assert rel < 5e-3, rel


def test_lm_descends_and_tracks_motion(scene, tracker0):
    """Solving frame t=3 from the t=0 model must reduce the cost and move
    surfels toward the deformed surface."""
    cfg, intr, seq, frames = scene
    st = tracker0
    ctx = prepare_lm(cfg, st.surfels, st.graph, frames[3])
    j_cap = ctx.ed_mask.shape[0]
    beta0 = jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
    cost0 = float(total_cost(cfg, ctx, beta0, intr))

    res = jax.jit(lambda c: lm_solve(cfg, c, intr))(ctx)
    assert np.isfinite(float(res.cost))
    assert float(res.cost) < 0.5 * cost0, (cost0, float(res.cost))
    # Node translations should be non-trivial (scene moves ~mm/frame).
    b = np.asarray(res.beta)
    act = np.asarray(ctx.ed_mask)
    t_norm = np.linalg.norm(b[act][:, 4:7], axis=1)
    assert t_norm.mean() > 1e-4


def _sched_cfg(cfg, **kw):
    import dataclasses
    return cfg.replace(solver=dataclasses.replace(cfg.solver, **kw))


def test_deferred_schedule_matches_classic(scene, tracker0):
    """On a monotonically descending solve the deferred-acceptance schedule
    must produce the classic schedule's trajectory (same candidates, same
    accept decisions, same damping ladder)."""
    cfg, intr, seq, frames = scene
    st = tracker0
    # f64: in f32 the two compiled programs round the shared math
    # differently (different fusion), which flips near-converged accept
    # tests -- the *schedules* are what is under test here.
    ctx = _to64(prepare_lm(cfg, st.surfels, st.graph, frames[1]))
    intr64 = _to64(intr)

    res_c = jax.jit(lambda c: lm_solve(
        _sched_cfg(cfg, lm_schedule="classic"), c, intr64))(ctx)
    res_d = jax.jit(lambda c: lm_solve(
        _sched_cfg(cfg, lm_schedule="deferred"), c, intr64))(ctx)
    np.testing.assert_allclose(np.asarray(res_d.beta), np.asarray(res_c.beta),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(res_d.cost), float(res_c.cost),
                               rtol=1e-9)
    np.testing.assert_allclose(float(res_d.final_damping),
                               float(res_c.final_damping), rtol=1e-9)


def test_hypotheses_schedule_descends_at_least_as_much(scene, tracker0):
    """Batched damping hypotheses (H=2: {u/v, u}) must reach a final cost no
    worse than the classic single-test schedule."""
    cfg, intr, seq, frames = scene
    st = tracker0
    ctx = prepare_lm(cfg, st.surfels, st.graph, frames[3])

    res_c = jax.jit(lambda c: lm_solve(
        _sched_cfg(cfg, lm_schedule="classic"), c, intr))(ctx)
    res_h = jax.jit(lambda c: lm_solve(
        _sched_cfg(cfg, lm_hypotheses=2), c, intr))(ctx)
    assert np.isfinite(float(res_h.cost))
    # "No worse" holds exactly only in exact arithmetic (H=2 contains the
    # classic candidate); f32 reduction-order noise in the assembly
    # (matmul segment sums, pair symmetrization) wiggles converged costs
    # by ~1e-4 relative.
    assert float(res_h.cost) <= float(res_c.cost) * (1 + 1e-3), (
        float(res_h.cost), float(res_c.cost))


def test_bf16_jtj_dense_layout_descends(scene, tracker0):
    """bf16 JTJ accumulation + block-Jacobi PCG on the dense accumulation
    layout (node cap > 512, the J=2048 memory path) must still descend to
    nearly the f32 solution."""
    import dataclasses

    cfg, intr, seq, frames = scene
    st = tracker0
    # Same scene, node capacity pushed over the block-layout cutoff so the
    # dense (7J, 7J) accumulator path is exercised.
    cfg_dense = cfg.replace(capacity=dataclasses.replace(
        cfg.capacity, node_capacity=576))
    from super_tpu.core.anchoring import update_graph_knn
    from super_tpu.core.graph import build_graph
    from super_tpu.core.tracker import init_surfels_from_frame

    graph = update_graph_knn(cfg_dense, build_graph(cfg_dense, frames[0]))
    surfels = init_surfels_from_frame(cfg_dense, graph, frames[0])
    ctx = prepare_lm(cfg_dense, surfels, graph, frames[3])
    cost0 = float(total_cost(cfg_dense, ctx, jnp.tile(
        IDENTITY_DQ[None], (576, 1)), intr))

    cfg16 = cfg_dense.replace(solver=dataclasses.replace(
        cfg_dense.solver, jtj_dtype="bf16", linear_solver="pcg"))
    res16 = jax.jit(lambda c: lm_solve(cfg16, c, intr))(ctx)
    assert np.isfinite(float(res16.cost))
    assert float(res16.cost) < 0.5 * cost0, (float(res16.cost), cost0)

    # Order-of-magnitude descent: the bf16 storage noise forces extra
    # scaled-space damping (core/lm.py solve_damped), so steps are more
    # conservative than f32 -- a memory fallback, not a parity path.
    assert float(res16.cost) < 0.1 * cost0, (float(res16.cost), cost0)


def test_bf16_jtj_requires_pcg(scene):
    import dataclasses

    cfg, intr, seq, frames = scene
    cfg16 = cfg.replace(solver=dataclasses.replace(
        cfg.solver, jtj_dtype="bf16"))  # cholesky default
    with pytest.raises(ValueError, match="bf16"):
        lm_solve(cfg16, None, intr)  # validated before ctx is touched


def test_assembly_cost_matches_total_cost(scene, tracker0):
    """The scalar cost emitted by the fused assembly pass must equal
    total_cost at the same beta (both tuple and scatter paths)."""
    cfg, intr, seq, frames = scene
    st = tracker0
    rng = np.random.default_rng(11)
    j_cap = cfg.capacity.node_capacity
    beta = (jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
            + 0.01 * jnp.asarray(rng.normal(size=(j_cap, 7)), jnp.float32))
    for c in (cfg, _scatter_cfg(cfg)):
        ctx = prepare_lm(c, st.surfels, st.graph, frames[1])
        _, _, cost_a = assemble_normal_equations(c, ctx, beta, intr,
                                                 with_cost=True)
        cost_t = total_cost(c, ctx, beta, intr)
        np.testing.assert_allclose(float(cost_a), float(cost_t), rtol=1e-5)


def test_frozen_jacobian_direct_form(scene, tracker0):
    """The direct n^T dT/dq vector identities must match the contraction of
    the full analytic warp Jacobian."""
    from super_tpu.core.losses import (DataChunk, _chunk_view, _chunk_xs,
                                       frozen_chunk_jacobian)
    from super_tpu.geometry.quaternion import blend_warp_jac

    cfg, intr, seq, frames = scene
    st = tracker0
    # Scatter-mode ctx: it carries the explicit per-surfel knn fields the
    # row-major DataChunk view needs (tuple mode holds them per tuple).
    ctx = prepare_lm(_scatter_cfg(cfg), st.surfels, st.graph, frames[1])
    xs, nc = _chunk_xs(ctx, ctx.sf_mask.shape[0])
    cv = _chunk_view(jax.tree.map(lambda a: a[0] if nc == 1 else a, xs))
    j_cap = cfg.capacity.node_capacity
    rng2 = np.random.default_rng(7)
    beta = jnp.tile(IDENTITY_DQ[None], (j_cap, 1)) + \
        0.02 * jnp.asarray(rng2.normal(size=(j_cap, 7)), dtype=jnp.float32)
    n_fm = jnp.asarray(rng2.normal(size=(3, cv.mask.shape[0])),
                       dtype=jnp.float32)
    o_fm = jnp.asarray(rng2.normal(size=(3, cv.mask.shape[0])),
                       dtype=jnp.float32)
    amask = jnp.ones_like(cv.mask)

    r, g, _ = frozen_chunk_jacobian(cv, o_fm, n_fm, amask,
                                    beta[cv.knn_idx], 1.0)

    # Reference form: contract the full per-anchor Jacobian.
    tp, jac = blend_warp_jac(cv.diff, cv.knn, beta[cv.knn_idx], cv.knn_w)
    g_q = jnp.einsum("ci,ckij->ckj", n_fm.T, jac)
    g_b = cv.knn_w[..., None] * n_fm.T[:, None, :]
    g_ref = jnp.concatenate([g_q, g_b], axis=-1)
    g_ref = jnp.where(cv.mask[:, None, None], g_ref, 0.0)
    sel = np.asarray(cv.mask)
    np.testing.assert_allclose(np.asarray(g)[sel], np.asarray(g_ref)[sel],
                               rtol=2e-4, atol=1e-5)


def test_moving_assembly_chunked_matches_unchunked():
    """The two-pass moving assembly (moving_mix_pass + premixed chunks,
    used when the surfel set spans multiple assembly chunks) must match
    the single-chunk fused pass on the same context."""
    import dataclasses

    import jax

    from helpers import tiny_scene
    from super_tpu.core.losses import prepare_lm
    from super_tpu.core.tracker import init_tracker
    from super_tpu.geometry.quaternion import IDENTITY_DQ

    cfg, intr, seq, frames = tiny_scene(num_frames=3)
    cfg_small = cfg.replace(solver=dataclasses.replace(
        cfg.solver, assembly_chunk=512, association="per_iteration"))
    state = init_tracker(cfg_small, frames[0])
    ctx = prepare_lm(cfg_small, state.surfels, state.graph, frames[2])
    j_cap = cfg.capacity.node_capacity
    rng = np.random.default_rng(3)
    beta = jnp.asarray(
        np.tile(np.asarray(IDENTITY_DQ)[None], (j_cap, 1))
        + 0.01 * rng.standard_normal((j_cap, 7)), jnp.float32)

    out_chunked = jax.jit(lambda b: assemble_normal_equations(
        cfg_small, ctx, b, intr, with_cost=True))(beta)
    cfg_one = cfg.replace(solver=dataclasses.replace(
        cfg.solver, assembly_chunk=1 << 20, association="per_iteration"))
    out_one = jax.jit(lambda b: assemble_normal_equations(
        cfg_one, ctx, b, intr, with_cost=True))(beta)
    for a, b, name in zip(out_chunked, out_one, ("jtj", "jtr", "cost")):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-6,
                                   err_msg=name)


def test_hypotheses_pairs_fused_descends(scene, tracker0):
    """lm_hypotheses=2 under the production pairs_fused solver (H sequential
    Pallas-CG launches over the one shared pair assembly) must run and reach
    a final cost no worse than single-hypothesis pairs_fused (H=2 contains
    its candidate, modulo CG inexactness)."""
    cfg, intr, seq, frames = scene
    st = tracker0
    cfg_p = _sched_cfg(cfg, linear_solver="pairs_fused", pcg_iterations=32)
    ctx = prepare_lm(cfg_p, st.surfels, st.graph, frames[3])

    res_1 = jax.jit(lambda c: lm_solve(cfg_p, c, intr))(ctx)
    res_h = jax.jit(lambda c: lm_solve(
        _sched_cfg(cfg_p, lm_hypotheses=2), c, intr))(ctx)
    assert np.isfinite(float(res_h.cost))
    assert float(res_h.cost) <= float(res_1.cost) * (1 + 1e-2), (
        float(res_h.cost), float(res_1.cost))
