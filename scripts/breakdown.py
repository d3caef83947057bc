#!/usr/bin/env python
"""Per-stage timing breakdown of the tracking step on the local accelerator.

Times each hot stage with tunnel-safe dependent-chain timing
(utils/profiling.chain_time); use --stages to select a subset, e.g.:

  python scripts/breakdown.py --stages lm_deferred,lm_classic,proj_scatter
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--mesh_step_size", type=int, default=30)
    ap.add_argument("--reps", type=int, default=None,
                    help="default 5 (chain mode) / 40 (--amortize: the "
                         "~22 ms tunnel dispatch divides by reps, so small "
                         "stages need many trips for an honest number)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--association", default="per_frame")
    ap.add_argument("--stages", default="prepare,lm_deferred,lm_classic,"
                    "proj_sort,proj_scatter,fuse,step")
    ap.add_argument("--amortize", action="store_true",
                    help="time each stage inside one compiled fori_loop "
                         "(amortizes the tunnel dispatch floor entirely)")
    args = ap.parse_args()
    if args.reps is None:
        args.reps = 40 if args.amortize else 5

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_tpu.config import CapacityConfig, SuPerConfig
    from super_tpu.core import fusion as fusion_mod
    from super_tpu.core.graph import grid_layout
    from super_tpu.core.lm import lm_solve
    from super_tpu.core.losses import prepare_lm
    from super_tpu.core.preprocess import preprocess_frame
    from super_tpu.core.tracker import init_tracker, track_step
    from super_tpu.data.synthetic import default_intrinsics, generate
    from super_tpu.utils.profiling import chain_time, loop_time

    h, w = args.height, args.width
    anchors, _, _ = grid_layout(h, w, args.mesh_step_size)

    def round64(n):
        return max(64, -(-n // 64) * 64)

    node_cap = round64(len(anchors))
    chunk = 32768
    surfel_cap = -(-int(1.25 * h * w) // chunk) * chunk
    cfg = SuPerConfig(
        height=h, width=w, mesh_step_size=args.mesh_step_size,
        capacity=CapacityConfig(
            surfel_capacity=surfel_cap,
            node_capacity=node_cap,
            edge_capacity=4 * node_cap,
            triangle_capacity=2 * node_cap,
        ),
    )
    solver_kw = dict(association=args.association)
    if node_cap > 512:
        solver_kw.update(assembly_tuple_cap=8 * node_cap,
                         assembly_pair_cap=16 * node_cap,
                         linear_solver="pairs_fused", pcg_iterations=32,
                         gram_sum_dtype="bf16")
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, **solver_kw))
    intr = default_intrinsics(h, w)

    seq = generate(3, h, w, intr=intr)
    pre = jax.jit(lambda d, c, t: preprocess_frame(cfg, intr, d, c, t))
    frames = [pre(jnp.asarray(seq.depths[t]),
                  jnp.asarray(seq.colors[t].transpose(2, 0, 1)),
                  jnp.float32(t)) for t in range(3)]
    state0 = init_tracker(cfg, frames[0])
    jax.block_until_ready(state0.surfels.points)

    def sched_cfg(**kw):
        return cfg.replace(solver=dataclasses.replace(cfg.solver, **kw))

    stages = {}

    def reg(name, fn, *fargs, probe=None):
        stages[name] = (fn, fargs, probe)

    reg("prepare",
        jax.jit(lambda s: prepare_lm(cfg, s.surfels, s.graph, frames[1])),
        state0, probe=lambda c: jnp.sum(c.sf_points[:, :8]))
    ctx = jax.jit(lambda s: prepare_lm(cfg, s.surfels, s.graph,
                                       frames[1]))(state0)
    from super_tpu.geometry.quaternion import IDENTITY_DQ as _IDQ
    beta_t0 = jnp.tile(_IDQ[None], (cfg.capacity.node_capacity, 1))
    for sched in ("deferred", "classic"):
        c2 = sched_cfg(lm_schedule=sched)
        reg(f"lm_{sched}", jax.jit(lambda c, _c2=c2: lm_solve(_c2, c, intr)),
            ctx, probe=lambda r: r.cost)
    reg("lm_hyp2", jax.jit(lambda c: lm_solve(sched_cfg(lm_hypotheses=2),
                                              c, intr)),
        ctx, probe=lambda r: r.cost)
    for it in (8, 16, 32):
        reg(f"lm_pcg{it}",
            jax.jit(lambda c, _it=it: lm_solve(
                sched_cfg(linear_solver="pcg", pcg_iterations=_it),
                c, intr)),
            ctx, probe=lambda r: r.cost)
    for it in (16, 32, 48):
        c_sp = sched_cfg(linear_solver="pairs_fused", pcg_iterations=it)
        ctx_sp = jax.jit(lambda s, _c=c_sp: prepare_lm(
            _c, s.surfels, s.graph, frames[1]))(state0)
        reg(f"lm_pairs{it}",
            jax.jit(lambda c, _c=c_sp: lm_solve(_c, c, intr)),
            ctx_sp, probe=lambda r: r.cost)
    for it in (16, 32, 64):
        reg(f"lm_fcg{it}",
            jax.jit(lambda c, _it=it: lm_solve(
                sched_cfg(linear_solver="pcg_pallas", pcg_iterations=_it),
                c, intr)),
            ctx, probe=lambda r: r.cost)
    # One-iteration variants: slope vs the 10-iteration numbers isolates
    # the per-iteration cost from the fixed prologue (assoc pass etc.).
    reg("lm_defer1",
        jax.jit(lambda c: lm_solve(sched_cfg(num_iterations=1), c, intr)),
        ctx, probe=lambda r: r.cost)
    # prepare_lm sub-stages.
    from super_tpu.core import assembly as assembly_mod
    from super_tpu.ops.bilinear import build_corner_bank_z
    reg("prep_layout",
        jax.jit(lambda s: assembly_mod.build_tuple_layout(
            s.surfels.knn_idx, s.surfels.active,
            s.graph.capacity, tuple_cap=cfg.solver.assembly_tuple_cap,
            pad_group=cfg.solver.assembly_pad_group,
            chunk=cfg.solver.assembly_chunk,
            pair_cap=cfg.solver.assembly_pair_cap)),
        state0, probe=lambda lo: jnp.sum(lo.block_tuple[:64]))
    reg("prep_bank",
        jax.jit(lambda f: build_corner_bank_z(
            f.points, f.norms, f.index_map(cfg.height, cfg.width))),
        frames[1], probe=lambda b: jnp.sum(b[:, :64]))
    from super_tpu.core.losses import associate
    reg("assoc_id",
        jax.jit(lambda c: associate(cfg, c, beta_t0 * 1.0, intr,
                                    identity=True)),
        ctx, probe=lambda a: jnp.sum(a.o[:, :8]))
    reg("assoc_gen",
        jax.jit(lambda c: associate(cfg, c, beta_t0 * 1.0, intr)),
        ctx, probe=lambda a: jnp.sum(a.o[:, :8]))
    reg("lm_pallas",
        jax.jit(lambda c: lm_solve(sched_cfg(assembly_backend="pallas"),
                                   c, intr)),
        ctx, probe=lambda r: r.cost)

    from super_tpu.core.losses import assemble_normal_equations
    from super_tpu.geometry.quaternion import IDENTITY_DQ

    j_cap = cfg.capacity.node_capacity
    beta_t = jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
    jtj0, jtr0 = jax.jit(
        lambda c, b: assemble_normal_equations(cfg, c, b, intr))(ctx, beta_t)
    if jtj0.ndim == 2 and jtj0.shape[0] == jtj0.shape[1]:
        # Dense normal matrix (cholesky/pcg configs); the pairs_fused base
        # config returns the (P, 49) pair form instead -- no chol stage.
        a0 = jtj0.astype(jnp.float32) + 10.0 * jnp.eye(7 * j_cap)

        def chol_solve(a, b):
            d = jnp.sqrt(jnp.maximum(jnp.diagonal(a), 1e-20))
            a_s = a / d[:, None] / d[None, :]
            return jax.scipy.linalg.cho_solve(
                (jnp.linalg.cholesky(a_s), True), b / d) / d

        reg("chol", jax.jit(chol_solve), a0, jtr0)
    reg("assemble",
        jax.jit(lambda c, b: assemble_normal_equations(cfg, c, b, intr,
                                                       with_cost=True)),
        ctx, beta_t, probe=lambda o: o[2])
    for mode in ("sort", "scatter"):
        cm = cfg.replace(proj_map_mode=mode)
        reg(f"proj_{mode}",
            jax.jit(lambda s, _cm=cm: fusion_mod.build_projection_maps(
                _cm, intr, s.surfels)),
            state0, probe=lambda o: jnp.sum(o[0][:, :8]))
    reg("fuse",
        jax.jit(lambda s: fusion_mod.fuse_frame(cfg, intr, s.surfels,
                                                s.graph, frames[1])),
        state0, probe=lambda o: o[0].points[0, 0])
    # Stage 4 in isolation with a REALISTIC post-merge add mask (~2% of
    # pixels), instead of the fuse-minus-fuse_no4 subtraction (stage
    # interactions inflate that delta).
    _mask_np = (jnp.arange(cfg.image_pixels) % 50) == 0
    reg("fuse_add",
        jax.jit(lambda s, f: fusion_mod.add_candidates(
            cfg, intr, s.surfels, s.graph, f, _mask_np & f.valid,
            f.time)),
        state0, frames[1], probe=lambda o: o[0].points[0, 0] +
        o[1].astype(jnp.float32))
    # Stage-isolated fusion variants: fuse minus fuse_noX = stage X's cost.
    for tag, kw in (("no2", dict(disable_merging_new_surfels=True)),
                    ("no3", dict(disable_merging_exist_surfels=True)),
                    ("no4", dict(disable_adding_new_surfels=True))):
        cf = cfg.replace(**kw)
        reg(f"fuse_{tag}",
            jax.jit(lambda s, _cf=cf: fusion_mod.fuse_frame(
                _cf, intr, s.surfels, s.graph, frames[1])),
            state0, probe=lambda o: o[0].points[0, 0])
    reg("step", jax.jit(lambda s: track_step(cfg, intr, s, frames[1])),
        state0, probe=lambda o: o[1].lm_cost)
    c_sp32 = sched_cfg(linear_solver="pairs_fused", pcg_iterations=32)
    reg("step_pairs",
        jax.jit(lambda s, _c=c_sp32: track_step(_c, intr, s, frames[1])),
        state0, probe=lambda o: o[1].lm_cost)
    c_spb = sched_cfg(linear_solver="pairs_fused", pcg_iterations=32,
                      gram_sum_dtype="bf16")
    reg("step_pairs_bf16",
        jax.jit(lambda s, _c=c_spb: track_step(_c, intr, s, frames[1])),
        state0, probe=lambda o: o[1].lm_cost)
    ctx_spb = jax.jit(lambda s, _c=c_spb: prepare_lm(
        _c, s.surfels, s.graph, frames[1]))(state0)
    reg("lm_pairs_bf16",
        jax.jit(lambda c, _c=c_spb: lm_solve(_c, c, intr)),
        ctx_spb, probe=lambda r: r.cost)
    # One frozen-association assemble and one damped solve of the
    # pairs_fused path, isolated (per-trip attribution inside lm_pairs).
    from super_tpu.core.lm import _pairs_fused_solve
    from super_tpu.core.losses import assemble_normal_equations as _asm
    assoc_spb = jax.jit(lambda c: associate(c_spb, c, beta_t0 * 1.0, intr,
                                            identity=True))(ctx_spb)
    reg("asm_pairs_frozen",
        jax.jit(lambda c, b: _asm(c_spb, c, b, intr, assoc=assoc_spb,
                                  with_cost=True)),
        ctx_spb, beta_t0 * 1.0, probe=lambda o: o[2])
    acc_spb, jtr_spb, _ = jax.jit(lambda c, b: _asm(
        c_spb, c, b, intr, assoc=assoc_spb, with_cost=True))(
            ctx_spb, beta_t0 * 1.0)
    reg("solve_pairs",
        jax.jit(lambda a, r: _pairs_fused_solve(
            c_spb, ctx_spb.layout, a, r, jnp.float32(10.0),
            cfg.capacity.node_capacity)),
        acc_spb, jtr_spb, probe=lambda x: jnp.sum(x[:64]))

    # Moving-target assembly variants (meaningful with
    # --association per_iteration): premixed two-pass vs fused one-pass
    # at two chunk sizes, all on the pairs_fused finish.
    for tag, kw in (
        ("asm_mv_premix", dict()),
        ("asm_mv_1p64", dict(moving_premix=False)),
        ("asm_mv_1p128", dict(moving_premix=False, assembly_chunk=131072)),
        ("asm_mv_premix128", dict(assembly_chunk=131072)),
    ):
        c_mv = sched_cfg(linear_solver="pairs_fused", pcg_iterations=32,
                         gram_sum_dtype="bf16", association="per_iteration",
                         **kw)
        reg(tag,
            jax.jit(lambda c, b, _c=c_mv: _asm(_c, c, b, intr,
                                               with_cost=True)),
            ctx_spb, beta_t0 * 1.0, probe=lambda o: o[2])
    c_pit = sched_cfg(linear_solver="pairs_fused", pcg_iterations=32,
                      gram_sum_dtype="bf16", association="per_iteration")
    reg("lm_pairs_pit",
        jax.jit(lambda c, _c=c_pit: lm_solve(_c, c, intr)),
        ctx_spb, probe=lambda r: r.cost)
    reg("step_pairs_pit",
        jax.jit(lambda s, _c=c_pit: track_step(_c, intr, s, frames[1])),
        state0, probe=lambda o: o[1].lm_cost)

    wanted = args.stages.split(",")
    out = {}
    for name in wanted:
        if name not in stages:
            continue
        fn, fargs, probe = stages[name]
        t0 = time.perf_counter()
        if args.amortize:
            # The probe must consume EVERY output, or XLA dead-code
            # eliminates whole stages (e.g. probing only lm_cost of a
            # track_step erases fusion -- measured 193 "ms" vs the real
            # 297).  Full sums cost ~0.1 ms of bandwidth; honesty is
            # cheaper than the lie.
            def probe(o, _p=probe):
                acc = jnp.float32(0)
                for a in jax.tree.leaves(o):
                    if hasattr(a, "dtype"):
                        acc = acc + jnp.sum(a).astype(jnp.float32)
                return acc

            def inject(tree, d):
                # Perturb EVERY leaf by a zero that depends on the loop
                # counter: otherwise XLA hoists any computation not
                # data-dependent on the perturbed leaf out of the timing
                # loop (e.g. the tuple-layout build depends only on int
                # knn_idx / bool active and was silently hoisted).
                # The zero MUST be produced by a float multiply (d * 0.0 is
                # not foldable -- d could be NaN/Inf); an int multiply
                # (d.astype(int32) * 0) IS folded to the constant 0 by the
                # XLA algebraic simplifier, which un-perturbs every int/bool
                # leaf and re-hoists their dependents.
                zi = (d * 0.0).astype(jnp.int32)

                def bump(a):
                    if not hasattr(a, "dtype"):
                        return a
                    if jnp.issubdtype(a.dtype, jnp.floating):
                        return a + d.astype(a.dtype) * 0
                    if a.dtype == jnp.bool_:
                        return a ^ (zi != 0)
                    if jnp.issubdtype(a.dtype, jnp.integer):
                        return a + zi.astype(a.dtype)
                    return a
                return jax.tree.map(bump, tree)

            def make_fn(acc, *fa, _fn=fn, _probe=probe):
                # Operands arrive as jit ARGUMENTS (not closure constants:
                # the tunnel 413s on >150 MB of constants, and the hoisted
                # one-hot fields push ctx pytrees past that).
                new_args = [inject(a, acc) for a in fa]
                return _probe(_fn(*new_args)).astype(jnp.float32)

            dt = loop_time(make_fn, jnp.float32(0.0), n_iter=args.reps,
                           args=tuple(fargs)) / 1e3
        else:
            dt = chain_time(fn, *fargs, probe=probe, reps=args.reps)
        out[name] = round(dt * 1e3, 2)
        print(f"{name}: {dt*1e3:.1f} ms  (total incl. compile "
              f"{time.perf_counter()-t0:.0f} s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
