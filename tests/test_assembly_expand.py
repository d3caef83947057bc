"""Cross-checks for the MXU-reformulated assembly paths (round 2):

- level-2 combine: one-hot segment matmul vs sorted scatter-add
- tuple->dense expansion: pair-sorted symmetric matmul + windowed
  set-scatter vs the 16-block conflict scatter (+ transpose)
- per-anchor beta fetch: tuple broadcast vs per-surfel gather (must be
  value-identical -- blocks are tuple-pure)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_tpu.config import CapacityConfig, SuPerConfig
from super_tpu.core.losses import assemble_normal_equations, prepare_lm
from super_tpu.core.preprocess import preprocess_frame
from super_tpu.core.tracker import init_tracker
from super_tpu.data.synthetic import default_intrinsics, generate
from super_tpu.geometry.quaternion import IDENTITY_DQ


@pytest.fixture(scope="module")
def scene():
    h, w = 96, 128
    cfg = SuPerConfig(
        height=h, width=w, mesh_step_size=24,
        capacity=CapacityConfig(surfel_capacity=16384, node_capacity=64,
                                edge_capacity=256, triangle_capacity=128,
                                new_surfel_capacity=2048))
    intr = default_intrinsics(h, w)
    seq = generate(2, h, w, intr=intr)
    pre = jax.jit(lambda d, c, t: preprocess_frame(cfg, intr, d, c, t))
    frames = [pre(jnp.asarray(seq.depths[t]),
                  jnp.asarray(seq.colors[t].transpose(2, 0, 1)),
                  jnp.float32(t)) for t in range(2)]
    state = init_tracker(cfg, frames[0])
    rng = np.random.default_rng(3)
    j = cfg.capacity.node_capacity
    beta = jnp.tile(IDENTITY_DQ[None], (j, 1)).astype(jnp.float32) + \
        0.02 * jnp.asarray(rng.normal(size=(j, 7)), jnp.float32)
    return cfg, intr, frames, state, beta


def _assemble(cfg, intr, frames, state, beta, **solver_kw):
    c = cfg.replace(solver=dataclasses.replace(cfg.solver, **solver_kw))
    ctx = prepare_lm(c, state.surfels, state.graph, frames[1])
    return jax.jit(lambda ctx, b: assemble_normal_equations(
        c, ctx, b, intr, with_cost=True))(ctx, beta)


def test_combine_and_expand_modes_agree(scene):
    cfg, intr, frames, state, beta = scene
    ref = _assemble(cfg, intr, frames, state, beta,
                    assembly_combine="scatter", assembly_expand="scatter")
    scale = float(jnp.max(jnp.abs(ref[0])))
    for combine in ("matmul", "scatter"):
        for expand in ("pairs", "scatter"):
            got = _assemble(cfg, intr, frames, state, beta,
                            assembly_combine=combine, assembly_expand=expand)
            np.testing.assert_allclose(np.asarray(got[0]),
                                       np.asarray(ref[0]),
                                       atol=2e-3 * scale, rtol=0,
                                       err_msg=f"{combine}/{expand} jtj")
            np.testing.assert_allclose(np.asarray(got[1]),
                                       np.asarray(ref[1]), rtol=1e-4,
                                       atol=1e-4,
                                       err_msg=f"{combine}/{expand} jtr")
            np.testing.assert_allclose(float(got[2]), float(ref[2]),
                                       rtol=1e-5)


def test_pairs_expansion_is_symmetric(scene):
    cfg, intr, frames, state, beta = scene
    jtj, _, _ = _assemble(cfg, intr, frames, state, beta,
                          assembly_combine="matmul", assembly_expand="pairs")
    jtj = np.asarray(jtj)
    np.testing.assert_allclose(jtj, jtj.T, atol=1e-5 * np.abs(jtj).max())


def test_no_pair_overflow_at_default_caps(scene):
    cfg, intr, frames, state, beta = scene
    c = cfg.replace(solver=dataclasses.replace(
        cfg.solver, assembly_expand="pairs"))
    ctx = prepare_lm(c, state.surfels, state.graph, frames[1])
    assert int(ctx.layout.pair_overflow) == 0
    # An absurdly small pair cap must trip the overflow counter instead of
    # corrupting the matrix.
    c2 = cfg.replace(solver=dataclasses.replace(
        cfg.solver, assembly_expand="pairs", assembly_pair_cap=16))
    ctx2 = prepare_lm(c2, state.surfels, state.graph, frames[1])
    assert int(ctx2.layout.pair_overflow) > 0


def test_broadcast_beta_matches_gather(scene):
    """Tuple-broadcast beta_k must equal the per-surfel gather exactly."""
    from super_tpu.core.losses import _beta_k_of, _chunk_xs

    cfg, intr, frames, state, beta = scene
    ctx = prepare_lm(cfg, state.surfels, state.graph, frames[1])
    assert ctx.layout is not None
    xs, nc = _chunk_xs(ctx, ctx.sf_mask.shape[0])
    xs0 = jax.tree.map(lambda a: a[0] if nc == 1 else a, xs)
    beta_t = beta[ctx.layout.tuple_nodes]
    bk = _beta_k_of(ctx, beta_t, xs0)
    # Reference: the per-surfel gather the broadcast replaced -- each padded
    # slot's anchors via sort_perm[src_pos] (tuple mode no longer carries
    # sf_knn_idx).
    src_of = ctx.layout.sort_perm[ctx.layout.src_pos]
    knn_slot = state.surfels.knn_idx[:, src_of]      # (K, Np)
    ref = beta[knn_slot.T]
    sel = np.asarray(ctx.sf_mask)
    np.testing.assert_array_equal(np.asarray(bk)[sel], np.asarray(ref)[sel])


def test_live_chunk_skip_matches_full_scan(scene):
    """The dynamic live-chunk bound (layout.live_end) must be a pure
    optimization: skipped sink/padding chunks contribute exact zeros, so
    (JTJ, JTr, cost), total_cost and the frozen association are identical
    with the bound disabled (live_end=None => full static scan)."""
    from super_tpu.core.losses import Assoc, associate, total_cost

    cfg, intr, frames, state, beta = scene
    c = cfg.replace(solver=dataclasses.replace(
        cfg.solver, assembly_chunk=2048, association="per_frame"))
    ctx = prepare_lm(c, state.surfels, state.graph, frames[1])
    assert ctx.layout is not None and ctx.layout.live_end is not None
    # The scene must actually have a skippable suffix for this to bite.
    np_cap = ctx.sf_mask.shape[0]
    assert int(ctx.layout.live_end) < np_cap
    ctx_full = ctx._replace(layout=ctx.layout._replace(live_end=None))

    fast = jax.jit(lambda ctx, b: assemble_normal_equations(
        c, ctx, b, intr, with_cost=True))
    got = fast(ctx, beta)
    ref = fast(ctx_full, beta)
    for g, r, name in zip(got, ref, ("jtj", "jtr", "cost")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)

    cost = jax.jit(lambda ctx, b: total_cost(c, ctx, b, intr))
    np.testing.assert_array_equal(np.asarray(cost(ctx, beta)),
                                  np.asarray(cost(ctx_full, beta)))

    assoc = jax.jit(lambda ctx: associate(c, ctx, beta * 0 + beta, intr,
                                          identity=True))
    a: Assoc = assoc(ctx)
    b_: Assoc = assoc(ctx_full)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b_.mask))
    sel = np.asarray(a.mask)
    np.testing.assert_array_equal(np.asarray(a.o)[:, sel],
                                  np.asarray(b_.o)[:, sel])
    np.testing.assert_array_equal(np.asarray(a.n)[:, sel],
                                  np.asarray(b_.n)[:, sel])
