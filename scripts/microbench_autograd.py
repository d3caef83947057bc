#!/usr/bin/env python
"""Per-term profile of the autograd (Semantic-SuPer GraphFit) iteration.

The r4 bench put semantic_hz at 1.17 (855 ms/frame) with no attribution.
This times, on the real bench workload (480p, soft-seg ICP + rot + face +
bn_morph, Adam): the full step, prepare, fusion, one fwd loss, one
value_and_grad, and each term's value_and_grad in isolation.

  python scripts/microbench_autograd.py [--stages grad_all,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--stages", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench as bench_mod
    from super_tpu.core import fusion as fusion_mod
    from super_tpu.core import optimizer as opt_mod
    from super_tpu.core.tracker import track_step
    from super_tpu.utils.profiling import loop_time

    bargs = argparse.Namespace(height=args.height, width=args.width,
                               streams=1, mesh_step_size=30)
    cfg, intr, state0, frames = bench_mod.build_workload(
        bargs, 30, "per_iteration", semantic=True)
    frame = frames[1]
    surfels, graph = state0.surfels, state0.graph
    ctx = jax.jit(lambda s, f: opt_mod.prepare_autograd(
        cfg, s.surfels, s.graph, f, intr=intr))(state0, frame)
    j_cap = graph.capacity
    deform0 = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)[None],
                       (j_cap + 1, 1))

    def inject(tree, d):
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

    def probe(o):
        acc = jnp.float32(0)
        for a in jax.tree.leaves(o):
            if hasattr(a, "dtype"):
                acc = acc + jnp.sum(a).astype(jnp.float32)
        return acc

    def loss_cfg(**kw):
        base = dict(sf_point_plane=False, sf_soft_seg_point_plane=False,
                    mesh_arap=False, mesh_rot=False, mesh_face=False,
                    sf_bn_morph=False)
        base.update(kw)
        return cfg.replace(losses=dataclasses.replace(cfg.losses, **base))

    out = {}

    def rec(name, fn, ops, reps=None):
        out[name] = round(loop_time(fn, jnp.float32(0.0),
                                    n_iter=reps or args.reps, args=ops), 2)
        print(f"{name}: {out[name]} ms", flush=True)

    stages = {}

    def reg(name, fn, ops):
        stages[name] = (fn, ops)

    reg("step", lambda d, s, f: probe(track_step(
        cfg, intr, inject(s, d), inject(f, d))), (state0, frame))
    reg("prepare", lambda d, s, f: probe(opt_mod.prepare_autograd(
        cfg, inject(s, d).surfels, s.graph, inject(f, d), intr=intr)),
        (state0, frame))
    reg("fuse", lambda d, s, f: probe(fusion_mod.fuse_frame(
        cfg, intr, inject(s, d).surfels, s.graph, inject(f, d))),
        (state0, frame))
    reg("fwd_all", lambda d, c, dfm: opt_mod.autograd_total(
        cfg, inject(c, d), graph, dfm + 0 * d, intr)[0], (ctx, deform0))
    reg("grad_all", lambda d, c, dfm: probe(jax.value_and_grad(
        lambda x: opt_mod.autograd_total(cfg, inject(c, d), graph, x,
                                         intr)[0])(dfm + 0 * d)),
        (ctx, deform0))
    for nm, kw in (
        ("softseg", dict(sf_soft_seg_point_plane=True)),
        ("pp_plain", dict(sf_point_plane=True)),
        ("rot", dict(mesh_rot=True)),
        ("face", dict(mesh_face=True)),
        ("bn_morph", dict(sf_bn_morph=True)),
    ):
        cfg_t = loss_cfg(**kw)
        reg(f"grad_{nm}", lambda d, c, dfm, _c=cfg_t: probe(
            jax.value_and_grad(
                lambda x: opt_mod.autograd_total(_c, inject(c, d), graph, x,
                                                 intr)[0])(dfm + 0 * d)),
            (ctx, deform0))
    reg("warp_fwd", lambda d, c, dfm: jnp.sum(opt_mod._warp_all(
        cfg, inject(c, d).base, dfm + 0 * d)), (ctx, deform0))
    reg("warp_grad", lambda d, c, dfm: probe(jax.value_and_grad(
        lambda x: jnp.sum(opt_mod._warp_all(cfg, inject(c, d).base, x)))(
            dfm + 0 * d)), (ctx, deform0))

    wanted = args.stages.split(",") if args.stages else list(stages)
    for name in wanted:
        if name in stages:
            fn, ops = stages[name]
            rec(name, fn, ops)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
