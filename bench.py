#!/usr/bin/env python
"""Benchmark: ED-graph LM tracking throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (reference scale, SURVEY.md section 6): 480x640 frames,
mesh_step_size 30 (J = 336 ED nodes), 10 LM iterations/frame, point-plane +
ARAP + rot losses, full fusion -- the per-frame step of run_super.py,
batched over concurrent streams on one chip.

vs_baseline: per-stream frame rate / 30 Hz (the north-star real-time budget;
the reference publishes no speed numbers).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    # vmapped multi-stream batching currently scales sub-linearly on a
    # single chip (the step is serial-op bound, not FLOP bound), so the
    # default measures the strongest single-stream configuration.
    ap.add_argument("--streams", type=int, default=1)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--mesh_step_size", type=int, default=30)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--mode", default="step", choices=["step", "lm"])
    ap.add_argument("--association", default="per_frame",
                    choices=["per_frame", "per_iteration"],
                    help="per_frame = projective-ICP association (fast); "
                         "per_iteration = reference resampling semantics")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_tpu.config import CapacityConfig, SuPerConfig
    from super_tpu.core.graph import grid_layout
    from super_tpu.core.lm import lm_solve
    from super_tpu.core.losses import prepare_lm
    from super_tpu.core.preprocess import preprocess_frame
    from super_tpu.core.tracker import init_tracker
    from super_tpu.data.synthetic import default_intrinsics, generate
    from super_tpu.parallel.sharded import make_batched_step

    h, w = args.height, args.width
    anchors, _, _ = grid_layout(h, w, args.mesh_step_size)

    def round64(n):
        # Multiple of 64, not pow2: the ED graph never grows past the
        # frame-0 grid and the 7J Cholesky is cubic in the capacity.
        return max(64, -(-n // 64) * 64)

    import dataclasses

    node_cap = round64(len(anchors))
    chunk = 32768
    surfel_cap = -(-int(1.25 * h * w) // chunk) * chunk  # headroom, chunk-aligned
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
        # Dense ED graph (mesh_step 16-ish): more distinct anchor tuples,
        # and the 7J Cholesky loses to block-Jacobi PCG.
        solver_kw.update(assembly_tuple_cap=8 * node_cap,
                         linear_solver="pcg", jtj_dtype="bf16")
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, **solver_kw))
    intr = default_intrinsics(h, w)

    seq = generate(3, h, w, intr=intr)
    pre = jax.jit(lambda d, c, t: preprocess_frame(cfg, intr, d, c, t))
    frames = [pre(jnp.asarray(seq.depths[t]),
                  jnp.asarray(seq.colors[t].transpose(2, 0, 1)),
                  jnp.float32(t)) for t in range(3)]
    state0 = init_tracker(cfg, frames[0])

    b = args.streams
    bcast = lambda x: jnp.broadcast_to(x[None], (b,) + x.shape)  # noqa: E731
    states = jax.tree.map(bcast, state0)
    fbatch = [jax.tree.map(bcast, f) for f in frames[1:]]

    if args.mode == "step":
        step = make_batched_step(cfg, intr)
        states, outs = step(states, fbatch[0])     # warm-up / compile
        jax.block_until_ready(outs.lm_cost)
        tic = time.perf_counter()
        for i in range(args.reps):
            states, outs = step(states, fbatch[i % 2])
        jax.block_until_ready(outs.lm_cost)
        dt = time.perf_counter() - tic
        metric = "tracked frames/s per chip (full step: 10-iter LM + fusion)"
    else:
        ctx = prepare_lm(cfg, state0.surfels, state0.graph, frames[1])
        ctxs = jax.tree.map(bcast, ctx)
        solve = jax.jit(jax.vmap(lambda c: lm_solve(cfg, c, intr)))
        res = solve(ctxs)
        jax.block_until_ready(res.cost)
        tic = time.perf_counter()
        for _ in range(args.reps):
            res = solve(ctxs)
        jax.block_until_ready(res.cost)
        dt = time.perf_counter() - tic
        metric = "LM frame-solves/s per chip (10 damped GN iterations)"

    frames_per_s = b * args.reps / dt
    per_stream_hz = frames_per_s / b
    print(json.dumps({
        "metric": metric,
        "value": round(frames_per_s, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(per_stream_hz / 30.0, 4),
        "streams": b,
        "per_stream_hz": round(per_stream_hz, 3),
    }))


if __name__ == "__main__":
    main()
