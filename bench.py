#!/usr/bin/env python
"""Benchmark: ED-graph LM tracking throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Workload (reference scale, SURVEY.md section 6): 480x640 frames,
mesh_step_size 30 (J = 336 ED nodes), 10 LM iterations/frame, point-plane +
ARAP + rot losses, full fusion -- the per-frame step of run_super.py,
batched over concurrent streams on one chip.  The default sweep also
reports ``per_iteration_hz`` (reference re-sampling semantics) and
``dense_mesh16_hz`` (mesh_step 16, J = 2048: the dense ED graph with bf16
JTJ + block-Jacobi PCG -- the config that OOMed a single v5e in round 1).

vs_baseline: per-stream frame rate / 30 Hz (the north-star real-time budget;
the reference publishes no speed numbers).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def build_workload(args, mesh_step: int, association: str,
                   semantic: bool = False):
    """Config + initial state + two preloaded frames for one workload."""
    import jax
    import jax.numpy as jnp

    from super_tpu.config import CapacityConfig, LossConfig, SuPerConfig
    from super_tpu.core.graph import grid_layout
    from super_tpu.core.preprocess import preprocess_frame
    from super_tpu.core.tracker import init_tracker
    from super_tpu.data.synthetic import default_intrinsics, generate

    h, w = args.height, args.width
    anchors, _, _ = grid_layout(h, w, mesh_step)

    def round64(n):
        # Multiple of 64, not pow2: the ED graph never grows past the
        # frame-0 grid and the 7J Cholesky is cubic in the capacity.
        return max(64, -(-n // 64) * 64)

    node_cap = round64(len(anchors))
    chunk = 32768
    surfel_cap = -(-int(1.25 * h * w) // chunk) * chunk  # headroom, aligned
    if node_cap <= 512 and not semantic:
        # pad_group 64 cuts the per-trip assembly from 5.0 to 4.2 ms
        # (g=128 measures 3.66 but its ~165k padding slots overflow the
        # slot space).  The extra ~83k padding slots (~2.6k steady-state
        # tuples x g/2) need one more capacity chunk of headroom;
        # tuple_overflow in the JSON line guards the margin.
        surfel_cap += chunk
    num_classes = 2
    extra_cfg = {}
    if semantic:
        # The reference's DEFAULT solver configuration (BASELINE config 3;
        # run_semantic_super defaults): autograd GraphFit with soft-seg ICP
        # + face + bn_morph + rot, Adam (deform_mesh.py:251-378).
        extra_cfg = dict(
            method="semantic-super", num_classes=num_classes, load_seg=True,
            losses=LossConfig(
                sf_point_plane=False,
                sf_soft_seg_point_plane=True,
                mesh_arap=False, mesh_rot=True, mesh_face=True,
                sf_bn_morph=True,
            ),
        )
    cfg = SuPerConfig(
        height=h, width=w, mesh_step_size=mesh_step,
        capacity=CapacityConfig(
            surfel_capacity=surfel_cap,
            node_capacity=node_cap,
            edge_capacity=4 * node_cap,
            triangle_capacity=2 * node_cap,
            # Steady-state fusion adds are a few hundred/frame (most pixels
            # merge); half the default add capacity halves the stage-4 KNN/
            # scatter width.  add_overflow in StepOutputs guards the margin.
            new_surfel_capacity=8192,
        ),
        **extra_cfg,
    )
    if semantic:
        cfg = cfg.replace(solver=dataclasses.replace(
            cfg.solver, use_derived_gradient=False, optimizer="Adam",
            learning_rate=2e-4))
        intr = default_intrinsics(h, w)
        seq = generate(3, h, w, intr=intr, num_classes=num_classes)
        pre = jax.jit(lambda d, c, t, s, sc: preprocess_frame(
            cfg, intr, d, c, t, seg=s, seg_conf=sc))
        frames = [pre(jnp.asarray(seq.depths[t]),
                      jnp.asarray(seq.colors[t].transpose(2, 0, 1)),
                      jnp.float32(t), jnp.asarray(seq.segs[t]),
                      jnp.asarray(seq.seg_confs[t]))
                  for t in range(3)]
        state0 = init_tracker(cfg, frames[0])
        return cfg, intr, state0, frames
    solver_kw = dict(association=association)
    if node_cap <= 512:
        solver_kw.update(assembly_pad_group=64)
    if node_cap > 512:
        # Dense ED graph (mesh_step 16-ish): more distinct anchor
        # tuples, and the 7J Cholesky loses to block-Jacobi PCG.
        # pair_cap must scale too: a mesh-16 grid has ~8.8k distinct node
        # pairs (the 4096 default silently dropped 4.7k of them -- most
        # off-diagonal JTJ blocks into the sink).
        solver_kw.update(assembly_tuple_cap=8 * node_cap,
                         assembly_pair_cap=16 * node_cap,
                         linear_solver="pairs_fused", pcg_iterations=32,
                         gram_sum_dtype="bf16")
    else:
        # Distinct anchor tuples plateau ~2.6k at 480p/J=336 (fusion adds
        # mint new tuples until the map saturates), so the default 4096
        # cap is right -- 2048 silently drops ~19% of residuals into the
        # sink (measured; the JSON line reports the overflow counters).
        # Both association modes use the pair-sparse fused-CG kernel
        # (warm-started, 32 iterations): the Cholesky path's per-trip
        # dense (7J)^2 expansion + graph-term block scatters cost more
        # than the whole solve, and CG at 32 iterations tracks Cholesky
        # accuracy in BOTH modes (synthetic reproj 0.127 px pairs_fused
        # vs 0.161 px Cholesky in per_iteration mode at 96x128).
        solver_kw.update(linear_solver="pairs_fused", pcg_iterations=32,
                         gram_sum_dtype="bf16")
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, **solver_kw))
    intr = default_intrinsics(h, w)

    seq = generate(3, h, w, intr=intr)
    pre = jax.jit(lambda d, c, t: preprocess_frame(cfg, intr, d, c, t))
    frames = [pre(jnp.asarray(seq.depths[t]),
                  jnp.asarray(seq.colors[t].transpose(2, 0, 1)),
                  jnp.float32(t)) for t in range(3)]
    state0 = init_tracker(cfg, frames[0])
    return cfg, intr, state0, frames


def measure_step(args, mesh_step: int, association: str, reps: int) -> float:
    """Frames/s of the full tracked step (device-resident frame loop)."""
    import jax
    import jax.numpy as jnp

    from super_tpu.parallel.sharded import make_batched_step

    cfg, intr, state0, frames = build_workload(args, mesh_step, association)
    b = args.streams
    bcast = lambda x: jnp.broadcast_to(x[None], (b,) + x.shape)  # noqa: E731
    states = jax.tree.map(bcast, state0)
    fbatch = [jax.tree.map(bcast, f) for f in frames[1:]]

    if args.host_loop:
        # One host dispatch per frame.  Representative of a synchronous
        # host driver; through the axon remote tunnel each dependent
        # dispatch pays a ~40-150 ms latency floor that a real TPU host
        # does not.
        step = make_batched_step(cfg, intr)
        st, outs = step(states, fbatch[0])  # warm-up / compile
        jax.block_until_ready(outs.lm_cost)
        tic = time.perf_counter()
        for i in range(reps):
            st, outs = step(st, fbatch[i % 2])
        jax.block_until_ready(outs.lm_cost)
        return b * reps / (time.perf_counter() - tic), {}

    # Device-resident frame loop: `reps` tracked frames per dispatch
    # (lax.scan alternating two preloaded frames) -- the throughput of a
    # production host that prefetches frames asynchronously
    # (runtime/frame_loader.cpp) instead of blocking per frame.
    from super_tpu.parallel.sharded import track_step_sharded

    # Stacked (2, ...) frames for the device-resident loop; unbatched when
    # b == 1 (the scan body then skips the vmap wrapper).
    f2_src = fbatch if b > 1 else frames[1:]
    frames2 = jax.tree.map(lambda a, c: jnp.stack([a, c]), f2_src[0],
                           f2_src[1])

    def one(s, f):
        return track_step_sharded(cfg, intr, 1, s, f)

    def body(st, ix):
        fr = jax.tree.map(lambda a: a[ix], frames2)
        if b == 1:
            # No vmap wrapper: a unit batch dim still changes
            # gather/matmul lowerings measurably on TPU.
            st, outs = one(st, fr)
        else:
            st, outs = jax.vmap(one)(st, fr)
        # Capacity-overflow maxima ride along: a benchmark that silently
        # drops residuals (tuple sink) or surfel adds would otherwise
        # look *faster*; the JSON line surfaces them.
        diag = jnp.stack([jnp.max(outs.tuple_overflow),
                          jnp.max(outs.pair_overflow),
                          jnp.max(outs.add_overflow),
                          jnp.max(outs.free_exhausted)])
        return st, (outs.lm_cost, diag)

    @jax.jit
    def run(st):
        ixs = jnp.arange(reps, dtype=jnp.int32) % 2
        st, (costs, diags) = jax.lax.scan(body, st, ixs)
        return st, costs, jnp.max(diags, axis=0)

    init_states = states if b > 1 else state0
    # The warm-up run also CONVERGES the map: after `reps` alternating
    # frames the adds/merges reach steady state, so the timed run below
    # measures a converged-map workload instead of the start-up transient
    # whose unmatched-candidate flood saturates new_surfel_capacity
    # (add_deferred in the r4 headline).  The transient rate is reported
    # alongside as cold_start_hz.
    st_warm, costs, diag = run(init_states)  # warm-up / compile / converge
    jax.device_get(costs)  # host fetch: reliable sync on the tunnel
    tic = time.perf_counter()
    st, costs, diag = run(st_warm)
    jax.device_get(costs)
    dt = time.perf_counter() - tic
    d = [int(x) for x in jax.device_get(diag)]
    overflow = dict(tuple=d[0], pair=d[1], add_deferred=d[2], free=d[3])
    tic = time.perf_counter()
    _, costs, diag_c = run(init_states)
    jax.device_get(costs)
    dt_cold = time.perf_counter() - tic
    dc = [int(x) for x in jax.device_get(diag_c)]
    overflow["cold_start_hz"] = round(b * reps / dt_cold, 3)
    overflow["cold_add_deferred"] = dc[2]
    return b * reps / dt, overflow


def measure_semantic(args, reps: int) -> float:
    """Frames/s of the autograd Semantic-SuPer step (the reference's
    DEFAULT solver: GraphFit Adam, deform_mesh.py:251-378), device-resident
    frame loop as in measure_step."""
    import jax
    import jax.numpy as jnp

    from super_tpu.core.tracker import track_step

    cfg, intr, state0, frames = build_workload(args, args.mesh_step_size,
                                               "per_iteration",
                                               semantic=True)
    frames2 = jax.tree.map(lambda a, c: jnp.stack([a, c]), frames[1],
                           frames[2])

    def body(st, ix):
        fr = jax.tree.map(lambda a: a[ix], frames2)
        st, outs = track_step(cfg, intr, st, fr)
        return st, outs.lm_cost

    @jax.jit
    def run(st):
        ixs = jnp.arange(reps, dtype=jnp.int32) % 2
        return jax.lax.scan(body, st, ixs)

    st, costs = run(state0)                 # warm-up / compile
    jax.device_get(costs)
    tic = time.perf_counter()
    st, costs = run(state0)
    jax.device_get(costs)
    return reps / (time.perf_counter() - tic)


def measure_perception(args, reps: int = 20) -> dict:
    """Per-frame perception-net inference rates (the reference runs these
    live inside SuPer.forward every frame when no precomputed maps are
    loaded: pred_depth / pred_seg, super/super.py:36-43,
    utils/data_loader.py:273-331), plus ONE end-to-end entry with the
    depth net in the tracking loop.

    Random-init weights (no checkpoints in this image) -- identical FLOPs
    and layout to converted checkpoints.  Timed with the amortized
    in-program loop (tunnel-safe)."""
    import jax
    import jax.numpy as jnp

    from super_tpu.config import SuPerConfig
    from super_tpu.factory import build_models, predict_frame_inputs
    from super_tpu.utils.profiling import loop_time

    h, w = args.height, args.width
    out = {}
    color = jnp.zeros((3, h, w), jnp.float32) + 0.5
    right = jnp.ones((3, h, w), jnp.float32) * 0.4

    def rate(fn, ops, n_iter=reps):
        ms = loop_time(fn, jnp.float32(0.0), n_iter=n_iter, args=ops)
        return round(1e3 / ms, 2)

    # Monodepth2 (flip post-process, the reference's superv1 config).
    cfg_m = SuPerConfig(height=h, width=w,
                        depth_model="monodepth2_stereo", post_process=True)
    models_m = build_models(cfg_m)
    out["depth_mono_hz"] = rate(
        lambda d, c: jnp.sum(predict_frame_inputs(
            cfg_m, models_m, c + 0 * d)["depth"]), (color,))

    # RAFT-Stereo, 32 GRU iterations (raft_stereo.py:108-136 semantics).
    cfg_r = SuPerConfig(height=h, width=w, depth_model="raft_stereo")
    models_r = build_models(cfg_r)
    out["depth_raft_hz"] = rate(
        lambda d, c, rc: jnp.sum(predict_frame_inputs(
            cfg_r, models_r, c + 0 * d, right_color_chw=rc)["depth"]),
        (color, right), n_iter=max(4, reps // 2))

    # DeepLabV3+ segmentation (the semantic-super seg net).
    cfg_s = SuPerConfig(height=h, width=w, seg_model="deeplabv3+",
                        num_classes=2)
    models_s = build_models(cfg_s)
    out["seg_hz"] = rate(
        lambda d, c: jnp.sum(predict_frame_inputs(
            cfg_s, models_s, c + 0 * d)["seg_conf"]), (color,))
    return out


def measure_e2e_depth(args, reps: int) -> float:
    """Frames/s of the FULL live path: monodepth2 inference -> depth
    preprocessing -> 10-iter LM + fusion, per frame, device-resident loop
    (the reference's default non-load_depth operation,
    super/super.py:36-43)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from super_tpu.core.preprocess import preprocess_frame
    from super_tpu.core.tracker import track_step
    from super_tpu.factory import build_models, predict_frame_inputs

    cfg, intr, state0, frames = build_workload(args, args.mesh_step_size,
                                               "per_frame")
    cfg = cfg.replace(depth_model="monodepth2_stereo", post_process=True)
    models = build_models(cfg)
    from super_tpu.data.synthetic import generate

    seq = generate(3, args.height, args.width, intr=intr)
    colors2 = jnp.stack([
        jnp.asarray(seq.colors[1].transpose(2, 0, 1)),
        jnp.asarray(seq.colors[2].transpose(2, 0, 1))])

    def body(st, ix):
        color = colors2[ix]
        depth = predict_frame_inputs(cfg, models, color)["depth"]
        fr = preprocess_frame(cfg, intr, depth, color,
                              ix.astype(jnp.float32) + 1.0)
        st, outs = track_step(cfg, intr, st, fr)
        return st, outs.lm_cost

    @jax.jit
    def run(st):
        ixs = jnp.arange(reps, dtype=jnp.int32) % 2
        return jax.lax.scan(body, st, ixs)

    st, costs = run(state0)
    jax.device_get(costs)
    tic = time.perf_counter()
    st, costs = run(state0)
    jax.device_get(costs)
    return reps / (time.perf_counter() - tic)


def measure_sol(args, reps: int = 40) -> dict:
    """Per-stage achieved-vs-modeled-floor accounting (utils/sol.py).

    Times the hot stages of the headline per_frame workload with the
    amortized in-program loop (profiling.loop_time) and reports
    sol_frac = modeled_floor / achieved per stage (+ MFU for the MXU
    assembly), flagging stages below 50% of the model.
    """
    import jax
    import jax.numpy as jnp

    from super_tpu.core import fusion as fusion_mod
    from super_tpu.core.lm import _pairs_fused_solve
    from super_tpu.core.losses import (
        assemble_normal_equations,
        associate,
        prepare_lm,
    )
    from super_tpu.geometry.quaternion import IDENTITY_DQ
    from super_tpu.utils import sol
    from super_tpu.utils.profiling import loop_time

    cfg, intr, state0, frames = build_workload(args, args.mesh_step_size,
                                               "per_frame")
    sol_cfg = cfg  # pairs_fused + bf16 gram: the headline solver config
    ctx = jax.jit(lambda s: prepare_lm(sol_cfg, s.surfels, s.graph,
                                       frames[1]))(state0)
    j_cap = cfg.capacity.node_capacity
    beta0 = jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
    assoc = jax.jit(lambda c: associate(sol_cfg, c, beta0 * 1.0, intr,
                                        identity=True))(ctx)
    acc, jtr, _ = jax.jit(lambda c, b: assemble_normal_equations(
        sol_cfg, c, b, intr, assoc=assoc, with_cost=True))(ctx, beta0 * 1.0)

    def probe_sum(tree):
        accum = jnp.float32(0)
        for a in jax.tree.leaves(tree):
            if hasattr(a, "dtype"):
                accum = accum + jnp.sum(a).astype(jnp.float32)
        return accum

    def bump(tree, d):
        # Perturb EVERY leaf by a data-dependent zero so XLA cannot hoist
        # the stage out of the timing loop (breakdown.py inject; float-only
        # perturbation lets int/bool-keyed work -- e.g. the tuple-layout
        # build off knn_idx/active -- hoist, under-measuring prepare).
        zi = (d * 0.0).astype(jnp.int32)

        def b(a):
            if not hasattr(a, "dtype"):
                return a
            if jnp.issubdtype(a.dtype, jnp.floating):
                return a + d.astype(a.dtype) * 0
            if a.dtype == jnp.bool_:
                return a ^ (zi != 0)
            if jnp.issubdtype(a.dtype, jnp.integer):
                return a + zi.astype(a.dtype)
            return a
        return jax.tree.map(b, tree)

    # Operands ride as loop_time ARGS (jit arguments), not closures: the
    # remote-compile tunnel rejects >~150 MB of jit constants, and ctx now
    # carries the hoisted one-hot operands (TupleLayout).
    stages = {
        "prepare": (lambda d, s, f: probe_sum(prepare_lm(
            sol_cfg, bump(s, d).surfels, s.graph, bump(f, d))),
            (state0, frames[1])),
        # identity association ignores beta -- perturb the ctx itself.
        "assoc": (lambda d, c: probe_sum(associate(
            sol_cfg, bump(c, d), beta0, intr, identity=True)), (ctx,)),
        "assemble": (lambda d, c, b, asc: probe_sum(assemble_normal_equations(
            sol_cfg, c, b + 0 * d, intr, assoc=asc,
            with_cost=True)), (ctx, beta0, assoc)),
        "solve": (lambda d, lo, a, r: probe_sum(_pairs_fused_solve(
            sol_cfg, lo, a + 0 * d, r, jnp.float32(10.0),
            j_cap)), (ctx.layout, acc, jtr)),
        "fuse": (lambda d, s, g, f: probe_sum(fusion_mod.fuse_frame(
            sol_cfg, intr, bump(s, d), g, bump(f, d))),
            (state0.surfels, state0.graph, frames[1])),
    }
    achieved = {}
    for name, (fn, ops) in stages.items():
        achieved[name] = loop_time(  # -> ms/iteration
            lambda acc_, *oa, _fn=fn: _fn(acc_, *oa).astype(jnp.float32),
            jnp.float32(0.0), n_iter=reps, args=ops)

    np_cap = cfg.capacity.surfel_capacity
    floors = sol.stage_floors(
        np_cap=np_cap, p=cfg.image_pixels, j=j_cap,
        t_cap=cfg.solver.assembly_tuple_cap,
        a_cap=cfg.capacity.new_surfel_capacity,
        pcg_iters=cfg.solver.pcg_iterations,
        num_lm_iters=cfg.solver.num_iterations)
    mxu_flops = {"assemble": np_cap * 28 * 29 * 2}
    return sol.sol_report(achieved, floors, mxu_flops=mxu_flops)


def measure_lm(args, reps: int) -> float:
    """Pure LM frame-solves/s (10 damped GN iterations, no fusion)."""
    import jax

    from super_tpu.core.lm import lm_solve
    from super_tpu.core.losses import prepare_lm

    cfg, intr, state0, frames = build_workload(
        args, args.mesh_step_size, args.association or "per_frame")
    import jax.numpy as jnp
    b = args.streams
    bcast = lambda x: jnp.broadcast_to(x[None], (b,) + x.shape)  # noqa: E731
    ctx = prepare_lm(cfg, state0.surfels, state0.graph, frames[1])
    ctxs = jax.tree.map(bcast, ctx)
    solve = jax.jit(jax.vmap(lambda c: lm_solve(cfg, c, intr)))
    res = solve(ctxs)
    jax.block_until_ready(res.cost)
    tic = time.perf_counter()
    for _ in range(reps):
        res = solve(ctxs)
    jax.block_until_ready(res.cost)
    return b * reps / (time.perf_counter() - tic)


def main():
    ap = argparse.ArgumentParser()
    # vmapped multi-stream batching scales sub-linearly on a single chip
    # (the 480p step saturates the chip; see README "Multi-stream scaling"),
    # so the default measures the strongest single-stream configuration.
    ap.add_argument("--streams", type=int, default=1)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--mesh_step_size", type=int, default=30)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--mode", default="step", choices=["step", "lm"])
    ap.add_argument("--association", default=None,
                    choices=["per_frame", "per_iteration"],
                    help="per_frame = projective-ICP association (fast); "
                         "per_iteration = reference resampling semantics. "
                         "Default: benchmark per_frame as the headline and "
                         "ALSO report per_iteration + the dense mesh-16 "
                         "config in the same JSON line.")
    ap.add_argument("--no_dense", action="store_true",
                    help="skip the dense mesh-16 entry of the default sweep")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sol", action="store_true",
                    help="measure per-stage achieved-vs-modeled-floor "
                         "accounting live (writes SOL.json); without this "
                         "flag the last committed SOL.json is embedded")
    ap.add_argument("--host_loop", action="store_true",
                    help="dispatch one step per frame from the host instead "
                         "of the device-resident lax.scan frame loop")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    extra = {}
    if args.mode == "lm":
        frames_per_s = measure_lm(args, args.reps)
        metric = "LM frame-solves/s per chip (10 damped GN iterations)"
    else:
        metric = "tracked frames/s per chip (full step: 10-iter LM + fusion)"
        sweep = args.association is None
        headline = args.association or "per_frame"
        frames_per_s, overflow = measure_step(args, args.mesh_step_size,
                                              headline, args.reps)
        if any(overflow.get(k) for k in ("tuple", "pair", "free")):
            # Residual-dropping overflow would make the bench *faster* by
            # solving a degraded problem -- surface it, never hide it.
            extra["overflow"] = overflow
        elif overflow.get("add_deferred"):
            extra["add_deferred"] = overflow["add_deferred"]
        # Start-up transient (unconverged map, the r4 headline condition):
        # on record next to the converged-map headline.
        for k in ("cold_start_hz", "cold_add_deferred"):
            if k in overflow:
                extra[k] = overflow[k]
        if sweep:
            extra["per_iteration_hz"] = round(measure_step(
                args, args.mesh_step_size, "per_iteration",
                args.reps)[0] / args.streams, 3)
            if not args.no_dense and args.mesh_step_size > 16:
                try:
                    dense_hz, dense_of = measure_step(
                        args, 16, "per_frame", max(6, args.reps // 5))
                    extra["dense_mesh16_hz"] = round(
                        dense_hz / args.streams, 3)
                    if any(dense_of.get(k) for k in ("tuple", "pair",
                                                     "free")):
                        extra["dense_overflow"] = dense_of
                except Exception as e:  # noqa: BLE001 -- report, keep line
                    extra["dense_mesh16_error"] = type(e).__name__
            try:
                extra["semantic_hz"] = round(
                    measure_semantic(args, max(6, args.reps // 3)), 3)
            except Exception as e:  # noqa: BLE001 -- report, keep line
                extra["semantic_error"] = type(e).__name__
            try:
                extra.update(measure_perception(args))
            except Exception as e:  # noqa: BLE001 -- report, keep line
                extra["perception_error"] = type(e).__name__
            try:
                extra["e2e_depth_hz"] = round(measure_e2e_depth(
                    args, max(6, args.reps // 3)), 3)
            except Exception as e:  # noqa: BLE001 -- report, keep line
                extra["e2e_depth_error"] = type(e).__name__
        import os
        sol_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "SOL.json")
        if args.sol:
            # Live per-stage speed-of-light accounting (adds ~5 stage
            # compiles); persisted so plain bench runs can embed it.
            sol_rep = measure_sol(args)
            with open(sol_path, "w") as f:
                json.dump(sol_rep, f, indent=1)
            extra["sol"] = sol_rep
        elif os.path.exists(sol_path):
            with open(sol_path) as f:
                extra["sol"] = json.load(f)
            extra["sol"]["note"] = "committed SOL.json; refresh: --sol"

    per_stream_hz = frames_per_s / args.streams
    print(json.dumps({
        "metric": metric,
        "value": round(frames_per_s, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(per_stream_hz / 30.0, 4),
        "streams": args.streams,
        "per_stream_hz": round(per_stream_hz, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
