#!/usr/bin/env python
"""In-situ bisect of fuse_frame via its stop_after probe points: cumulative
prefixes of the REAL program, each loop_time'd with all-leaf operand
injection, so consecutive differences attribute the in-situ stage costs.
(Stage-disabling deltas misattribute: disabling stage 4 also DCEs shared
work and changes fusion decisions upstream -- fuse-minus-fuse_no4 measured
11.3 ms while the standalone add_candidates program costs 6.5.)

  python scripts/microbench_fuse_bisect.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--stages", default=None)
    ap.add_argument("--semantic", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench as bench_mod
    from super_tpu.core import fusion as fusion_mod
    from super_tpu.utils.profiling import loop_time

    bargs = argparse.Namespace(height=480, width=640, streams=1,
                               mesh_step_size=30)
    cfg, intr, state0, frames = bench_mod.build_workload(
        bargs, 30, "per_frame", semantic=args.semantic)
    frame = frames[1]

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

    def upto(stop):
        def fn(d, s, f):
            return probe(fusion_mod.fuse_frame(
                cfg, intr, inject(s, d).surfels, s.graph, inject(f, d),
                stop_after=stop))
        return fn

    names = ["proj", "merge23", "unpack", "reweight", "full"]
    if args.stages:
        names = args.stages.split(",")
    out = {}
    for nm in names:
        fn = upto(None if nm == "full" else nm)
        out[nm] = round(loop_time(
            lambda d, s, f, _f=fn: _f(d, s, f),
            jnp.float32(0.0), n_iter=args.reps, args=(state0, frame)), 2)
        print(f"{nm}: {out[nm]} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
