#!/usr/bin/env python
"""In-situ bisect of fusion stage 4 (add_candidates) on the REAL bench
state: cumulative prefixes of the stage, each loop_time'd, so consecutive
differences attribute the cost inside the actual XLA program (the
standalone microbench_stage4 components sum to ~6 ms while the isolated
stage measures ~12).

  python scripts/microbench_add_bisect.py
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
    ap.add_argument("--stages", default=None,
                    help="comma list; default all")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench as bench_mod
    from super_tpu.core.anchoring import anchor_points
    from super_tpu.core.state import gather_rows
    from super_tpu.utils.profiling import loop_time

    bargs = argparse.Namespace(height=480, width=640, streams=1)
    cfg, intr, state0, frames = bench_mod.build_workload(
        bargs, 30, "per_frame")
    frame = frames[1]
    surfels = state0.surfels
    graph = state0.graph
    p = cfg.image_pixels
    a_cap = cfg.capacity.new_surfel_capacity
    n = surfels.capacity
    mask_np = ((jnp.arange(p) % 50) == 0)

    def inject(tree, d):
        # Perturb EVERY leaf by a loop-dependent zero (breakdown.py inject):
        # otherwise free = ~sf.active, its cumsum, and the dst_bank concat
        # are loop-invariant and XLA hoists them out of the timed fori_loop,
        # under-attributing exactly the costs this script bisects.
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

    def prefix(upto):
        def fn(d, sf, fr):
            sf = inject(sf, d)
            fr = inject(fr, d)
            add_mask = mask_np & fr.valid & (d.astype(jnp.int32) == 0)
            acc = jnp.float32(0)
            cand_cs = jnp.cumsum(add_mask).astype(jnp.int32)
            acc += cand_cs[-1].astype(jnp.float32)
            if upto == "cumsum_p":
                return acc
            cand_r1 = jnp.arange(1, a_cap + 1, dtype=jnp.int32)
            comp_src = jnp.searchsorted(cand_cs, cand_r1).astype(jnp.int32)
            comp_valid = cand_r1 <= cand_cs[-1]
            comp_src = jnp.where(comp_valid, jnp.clip(comp_src, 0, p - 1), 0)
            acc += jnp.sum(comp_src[:64]).astype(jnp.float32)
            if upto == "compact_p":
                return acc
            fdt = fr.points.dtype
            fbank2 = jnp.concatenate([
                fr.points, fr.norms, fr.colors, fr.radii[None],
                fr.confs[None], fr.dist2edge[None],
                fr.seg.astype(fdt)[None], fr.seg_conf], axis=0)
            cvals = gather_rows(fbank2, comp_src)
            acc += jnp.sum(cvals[:, :64])
            if upto == "gather":
                return acc
            c_points = cvals[0:3]
            c_seg = cvals[12].astype(jnp.int32)
            c_seg_conf = cvals[13:]
            knn_idx, knn_w, stable = anchor_points(
                cfg, graph, c_points, comp_valid, seg=c_seg,
                seg_conf=c_seg_conf)
            add = comp_valid & stable
            acc += jnp.sum(knn_w[:, :64]) + jnp.sum(add).astype(jnp.float32)
            if upto == "anchor":
                return acc
            free = ~sf.active
            free_cs = jnp.cumsum(free).astype(jnp.int32)
            add_rank1 = jnp.cumsum(add).astype(jnp.int32)
            fits = add & (add_rank1 <= free_cs[-1])
            target = jnp.where(fits, jnp.searchsorted(
                free_cs, add_rank1).astype(jnp.int32), n)
            acc += jnp.sum(target[:64]).astype(jnp.float32)
            if upto == "slots":
                return acc
            src_bank = jnp.concatenate([
                cvals, jnp.full((1, a_cap), fr.time, dtype=fdt),
                knn_idx.astype(fdt), knn_w,
                jnp.ones((1, a_cap), fdt)], axis=0)
            dst_bank = jnp.concatenate([
                sf.points, sf.norms, sf.colors,
                sf.radii[None], sf.confs[None],
                sf.dist2edge[None], sf.seg.astype(fdt)[None],
                sf.seg_conf, sf.time_stamp[None],
                sf.knn_idx.astype(fdt), sf.knn_w,
                sf.active.astype(fdt)[None]], axis=0)
            new_bank = dst_bank.at[:, target].set(src_bank, mode="drop")
            acc += jnp.sum(new_bank)
            return acc
        return fn

    def lib(d, sf, fr):
        # The REAL library stage in the same harness: a gap vs the "full"
        # replica points at the replica, not add_candidates.
        from super_tpu.core import fusion as fusion_mod
        sf = inject(sf, d)
        fr = inject(fr, d)
        add_mask = mask_np & fr.valid & (d.astype(jnp.int32) == 0)
        out_sf, ov, ex = fusion_mod.add_candidates(
            cfg, intr, sf, graph, fr, add_mask, fr.time)
        acc = ov.astype(jnp.float32) + ex.astype(jnp.float32)
        for a in jax.tree.leaves(out_sf):
            acc = acc + jnp.sum(a).astype(jnp.float32)
        return acc

    names = ["cumsum_p", "compact_p", "gather", "anchor", "slots", "full",
             "lib"]
    if args.stages:
        names = args.stages.split(",")
    out = {}
    for nm in names:
        fn = lib if nm == "lib" else prefix(nm)
        out[nm] = round(loop_time(
            lambda d, sf, fr, _f=fn: _f(d, sf, fr),
            jnp.float32(0.0), n_iter=args.reps,
            args=(surfels, frame)), 2)
        print(f"{nm}: {out[nm]} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
