#!/usr/bin/env python
"""Bisect the gap between the amortized per-stage step time and the
bench.py device-resident scan loop (126 ms vs 175 ms/frame at 480p).

Variants (all device-resident lax.scan, 30 trips, timed on the 2nd call):
  A: track_step, ONE fixed frame closed over (matches the breakdown stage)
  B: track_step, frame dynamic-sliced from a stacked (2, ...) pytree
  C: track_step_sharded(num_shards=1), fixed frame
  D: bench.py's exact construction (track_step_sharded + slicing)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from super_tpu.config import CapacityConfig, SuPerConfig
    from super_tpu.core.graph import grid_layout
    from super_tpu.core.preprocess import preprocess_frame
    from super_tpu.core.tracker import init_tracker, track_step
    from super_tpu.data.synthetic import default_intrinsics, generate
    from super_tpu.parallel.sharded import track_step_sharded

    h, w, mss, reps = 480, 640, 30, 30
    anchors, _, _ = grid_layout(h, w, mss)
    node_cap = max(64, -(-len(anchors) // 64) * 64)
    chunk = 32768
    surfel_cap = -(-int(1.25 * h * w) // chunk) * chunk
    cfg = SuPerConfig(
        height=h, width=w, mesh_step_size=mss,
        capacity=CapacityConfig(
            surfel_capacity=surfel_cap, node_capacity=node_cap,
            edge_capacity=4 * node_cap, triangle_capacity=2 * node_cap))
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver, association="per_frame", linear_solver="pairs_fused",
        pcg_iterations=32, gram_sum_dtype="bf16"))
    intr = default_intrinsics(h, w)

    seq = generate(3, h, w, intr=intr)
    pre = jax.jit(lambda d, c, t: preprocess_frame(cfg, intr, d, c, t))
    frames = [pre(jnp.asarray(seq.depths[t]),
                  jnp.asarray(seq.colors[t].transpose(2, 0, 1)),
                  jnp.float32(t)) for t in range(3)]
    state0 = init_tracker(cfg, frames[0])
    frames2 = jax.tree.map(lambda a, c: jnp.stack([a, c]), frames[1],
                           frames[2])

    def timed(run):
        st, costs = run(state0)
        jax.device_get(costs)
        tic = time.perf_counter()
        st, costs = run(state0)
        jax.device_get(costs)
        return (time.perf_counter() - tic) / reps * 1e3

    out = {}

    @jax.jit
    def run_a(st):
        def body(s, _):
            s, o = track_step(cfg, intr, s, frames[1])
            return s, o.lm_cost
        return jax.lax.scan(body, st, jnp.arange(reps, dtype=jnp.int32))

    out["A_fixed_frame_track_step"] = round(timed(run_a), 2)
    print("A", out, flush=True)

    @jax.jit
    def run_b(st):
        def body(s, ix):
            fr = jax.tree.map(lambda a: a[ix], frames2)
            s, o = track_step(cfg, intr, s, fr)
            return s, o.lm_cost
        return jax.lax.scan(body, st,
                            jnp.arange(reps, dtype=jnp.int32) % 2)

    out["B_sliced_frame_track_step"] = round(timed(run_b), 2)
    print("B", out, flush=True)

    @jax.jit
    def run_c(st):
        def body(s, _):
            s, o = track_step_sharded(cfg, intr, 1, s, frames[1])
            return s, o.lm_cost
        return jax.lax.scan(body, st, jnp.arange(reps, dtype=jnp.int32))

    out["C_fixed_frame_sharded"] = round(timed(run_c), 2)
    print("C", out, flush=True)

    @jax.jit
    def run_d(st):
        def body(s, ix):
            fr = jax.tree.map(lambda a: a[ix], frames2)
            s, o = track_step_sharded(cfg, intr, 1, s, fr)
            return s, o.lm_cost
        return jax.lax.scan(body, st,
                            jnp.arange(reps, dtype=jnp.int32) % 2)

    out["D_bench_style"] = round(timed(run_d), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
