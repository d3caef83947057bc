"""Cross-check LM semantics against the independent NumPy f64 golden port.

VERDICT round-1 item 3: the per-iteration (reference-semantics) LM path is
validated step-for-step against ``golden_lm`` -- a NumPy port of the
reference loop (super/LM.py:81-121 + loss.py:222-290) whose Jacobian comes
from finite differences, sharing no derivative code with super_tpu.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_scene

import golden_lm as gold

from super_tpu.core.losses import (
    assemble_normal_equations,
    prepare_lm,
    total_cost,
)
from super_tpu.core.lm import lm_solve
from super_tpu.core.tracker import init_tracker
from super_tpu.geometry.quaternion import IDENTITY_DQ


def _to64(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


@pytest.fixture(scope="module")
def setup():
    cfg, intr, seq, frames = tiny_scene(num_frames=3, h=24, w=32, step=8)
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver, assembly_mode="scatter", association="per_iteration",
        lm_schedule="classic"))
    st = init_tracker(cfg, frames[0])
    # Perturb surfel positions off the pixel grid: surfels born from pixels
    # project back onto exact pixel centers at the identity warp, where
    # corner/rounding knife edges let f64 op-order noise flip validity
    # masks between any two implementations.  Both sides see the same
    # perturbed state, so this changes the scene, not the comparison.
    rng = np.random.default_rng(17)
    pts = np.asarray(st.surfels.points)
    pts = (pts + 2e-4 * rng.standard_normal(pts.shape)).astype(np.float32)
    st = st._replace(surfels=st.surfels._replace(points=jnp.asarray(pts)))
    frame = frames[1]
    inp = gold.GoldenInputs(
        p=np.asarray(st.surfels.points.T, np.float64),
        sf_active=np.asarray(st.surfels.active),
        knn_idx=np.asarray(st.surfels.knn_idx.T),
        knn_w=np.asarray(st.surfels.knn_w.T, np.float64),
        g=np.asarray(st.graph.points, np.float64),
        ed_active=np.asarray(st.graph.active),
        ed_knn=np.asarray(st.graph.knn_idx),
        trg_points=np.asarray(frame.points.T, np.float64),
        trg_norms=np.asarray(frame.norms.T, np.float64),
        index_map=np.asarray(frame.index_map(cfg.height, cfg.width)),
        fx=float(intr.fx), fy=float(intr.fy),
        cx=float(intr.cx), cy=float(intr.cy),
        w_data=cfg.losses.sf_point_plane_weight,
        w_arap=cfg.losses.mesh_arap_weight,
        w_rot=cfg.losses.mesh_rot_weight,
    )
    ctx = _to64(prepare_lm(cfg, st.surfels, st.graph, frame))
    return cfg, _to64(intr), inp, ctx


def test_normal_equations_match_fd_golden(setup):
    """Analytic (JTJ, JTr, cost) == the golden port's finite-difference
    normal equations at a generic beta."""
    cfg, intr, inp, ctx = setup
    j_cap = ctx.ed_mask.shape[0]
    rng = np.random.default_rng(2)
    beta_np = np.tile(np.array([1.0, 0, 0, 0, 0, 0, 0]), (j_cap, 1))
    beta_np += 0.005 * rng.normal(size=beta_np.shape)
    beta = jnp.asarray(beta_np)

    jac, r0 = gold.fd_jacobian(inp, beta_np)
    jtj_g = jac.T @ jac
    jtr_g = -jac.T @ r0

    jtj, jtr, cost_a = assemble_normal_equations(cfg, ctx, beta, intr,
                                                 with_cost=True)
    scale = np.max(np.abs(jtj_g)) + 1e-12
    np.testing.assert_allclose(np.asarray(jtj) / scale, jtj_g / scale,
                               atol=2e-6)
    rscale = np.max(np.abs(jtr_g)) + 1e-12
    np.testing.assert_allclose(np.asarray(jtr) / rscale, jtr_g / rscale,
                               atol=2e-6)
    np.testing.assert_allclose(float(cost_a), float(np.sum(r0 * r0)),
                               rtol=1e-9)


def test_lm_trajectory_matches_golden(setup):
    """Step-for-step: candidate costs, accept decisions and damping of the
    classic per-iteration loop must match the golden reference loop."""
    cfg, intr, inp, ctx = setup
    num_iter = 6
    _, hist = gold.golden_lm(inp, num_iter)

    j_cap = ctx.ed_mask.shape[0]
    beta = jnp.tile(IDENTITY_DQ.astype(jnp.float64)[None], (j_cap, 1))
    best_beta, best_cost = beta, 1e10
    u, v = cfg.solver.lm_damping_init, cfg.solver.lm_damping_factor
    diag = jnp.arange(7 * j_cap)
    for it in range(num_iter):
        jtj, jtr = assemble_normal_equations(cfg, ctx, beta, intr)
        a = jtj.at[diag, diag].add(u)
        delta = jnp.linalg.solve(a, jtr)
        beta_new = beta + delta.reshape(j_cap, 7)
        cand = float(total_cost(cfg, ctx, beta_new, intr))
        accepted = cand < best_cost
        g = hist[it]
        np.testing.assert_allclose(cand, g.cand_cost, rtol=1e-6,
                                   err_msg=f"iteration {it} candidate cost")
        assert accepted == g.accepted, f"iteration {it} accept decision"
        if accepted:
            best_beta, best_cost = beta_new, cand
            u /= v
            beta = beta_new
        else:
            u *= v
            beta = best_beta
        np.testing.assert_allclose(u, g.u, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(beta), g.beta, rtol=1e-5,
                                   atol=1e-8,
                                   err_msg=f"iteration {it} beta")


def test_lm_solve_reaches_golden_optimum(setup):
    """The jitted classic lm_solve lands on the golden loop's final beta."""
    cfg, intr, inp, ctx = setup
    num_iter = 6
    best_g, hist = gold.golden_lm(inp, num_iter)
    cfg6 = cfg.replace(solver=dataclasses.replace(cfg.solver,
                                                  num_iterations=num_iter))
    res = jax.jit(lambda c: lm_solve(cfg6, c, intr))(ctx)
    np.testing.assert_allclose(np.asarray(res.beta), best_g, rtol=1e-5,
                               atol=1e-8)
    accepted_costs = [h.cand_cost for h in hist if h.accepted]
    np.testing.assert_allclose(float(res.cost), accepted_costs[-1],
                               rtol=1e-6)
