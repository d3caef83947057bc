"""SuPer tracking pipeline: init + per-frame step.

Orchestrates the per-frame flow of the reference ``SuPer.forward``
(super/super.py:23-83): preprocessing happens upstream (FrameData in),
then frame 0 builds the ED graph + surfel map, and frame t solves the
warp field, applies it, fuses the new observations, prunes, and updates
tracked points.

Everything here is a pure function of (config-static, state, frame); the
whole ``step`` jits once and is ``vmap``-able over a stream axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core import fusion as fusion_mod
from super_tpu.core.anchoring import anchor_points, update_graph_knn
from super_tpu.core.graph import build_graph
from super_tpu.core.lm import LMResult, lm_solve
from super_tpu.core.losses import prepare_lm
from super_tpu.core.state import (
    FrameData,
    GraphState,
    SurfelState,
    TrackState,
    TrackerState,
    empty_surfels,
    empty_track,
)
from super_tpu.core.warp import apply_deformation
from super_tpu.geometry.camera import Intrinsics, project_points


def init_surfels_from_frame(cfg: SuPerConfig, graph: GraphState,
                            frame: FrameData) -> SurfelState:
    """Frame-0 surfel map: every valid candidate becomes a surfel in its
    pixel-indexed slot (Surfels.__init__, super/nodes.py:93-152).

    Requires surfel_capacity >= H*W; the candidate id doubles as the slot id
    so frame-0 ``index_map`` lookups are identities.
    """
    n = cfg.capacity.surfel_capacity
    p = frame.points.shape[-1]
    if n < p:
        raise ValueError(f"surfel_capacity {n} < pixel count {p}")

    def pad(x):
        cfgpad = [(0, 0)] * (x.ndim - 1) + [(0, n - p)]
        return jnp.pad(x, cfgpad)

    knn_idx, knn_w, stable = anchor_points(
        cfg, graph, frame.points, frame.valid,
        seg=frame.seg, seg_conf=frame.seg_conf)

    h, w = cfg.height, cfg.width
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    proj_uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=0)

    return SurfelState(
        points=pad(frame.points),
        norms=pad(frame.norms),
        colors=pad(frame.colors),
        radii=pad(frame.radii),
        confs=pad(jnp.where(frame.valid, frame.confs, 0.0)),
        time_stamp=pad(jnp.full((p,), frame.time, dtype=jnp.float32)),
        active=pad(stable),
        knn_idx=pad(knn_idx),
        knn_w=pad(knn_w),
        proj_uv=pad(proj_uv),
        seg=pad(frame.seg),
        seg_conf=pad(frame.seg_conf),
        dist2edge=pad(frame.dist2edge),
    )


def init_tracker(cfg: SuPerConfig, frame: FrameData) -> TrackerState:
    """Frame-0 initialization: ED graph from the valid grid, surfels from
    candidates, node KNN weights (super/super.py:47-52,60-63)."""
    graph = build_graph(cfg, frame)
    graph = update_graph_knn(cfg, graph)
    surfels = init_surfels_from_frame(cfg, graph, frame)
    return TrackerState(
        surfels=surfels,
        graph=graph,
        track=empty_track(cfg),
        time=frame.time,
    )


class StepOutputs(NamedTuple):
    """Per-frame diagnostics surfaced to the host.

    The overflow counters expose silent capacity degradation (dropped
    residuals / deferred adds / deleted projections) so an undersized
    config is visible instead of quietly losing accuracy."""

    lm_cost: jnp.ndarray
    lm_damping: jnp.ndarray
    num_surfels: jnp.ndarray
    num_nodes: jnp.ndarray
    tuple_overflow: jnp.ndarray    # surfels dropped from the JTJ assembly
    pair_overflow: jnp.ndarray     # distinct node pairs beyond pair_cap
    #   (their JTJ blocks are lost; raise solver.assembly_pair_cap)
    proj_overflow: jnp.ndarray     # surfels deleted beyond proj_map_depth
    add_overflow: jnp.ndarray      # add candidates deferred (capacity)
    free_exhausted: jnp.ndarray    # adds dropped: no free surfel slot
    dup_skipped: jnp.ndarray       # duplicate merges deferred (compact cap)


def track_step(cfg: SuPerConfig, intr: Intrinsics, state: TrackerState,
               frame: FrameData, models=None,
               prev_color=None) -> Tuple[TrackerState, StepOutputs]:
    """One frame of tracking: solve warp -> apply -> fuse -> prune.

    Parity: SuPer.fusion + Surfels.fuseInputData + prune
    (super/super.py:66-83, nodes.py:270-627), LM path.

    ``models``/``prev_color`` feed the sf_corr optical-flow plumbing of the
    autograd path (optimizer.graph_fit); close ``models`` over the jit
    (make_jit_step) -- it carries flax modules, not traced arrays.
    """
    zero_i = jnp.asarray(0, jnp.int32)
    if cfg.solver.use_derived_gradient:
        ctx = prepare_lm(cfg, state.surfels, state.graph, frame)
        result: LMResult = lm_solve(cfg, ctx, intr)
        surfels, graph = apply_deformation(cfg, state.surfels, state.graph,
                                           result.beta)
        solve_cost, damping = result.cost, result.final_damping
        tuple_overflow = (ctx.layout.overflow_count
                          if ctx.layout is not None else zero_i)
        pair_overflow = (ctx.layout.pair_overflow
                         if ctx.layout is not None
                         and ctx.layout.pair_overflow is not None else zero_i)
    else:
        from super_tpu.core.optimizer import graph_fit

        deform, solve_cost = graph_fit(cfg, state.surfels, state.graph,
                                       frame, intr, models=models,
                                       prev_color=prev_color)
        surfels, graph = apply_deformation(cfg, state.surfels, state.graph,
                                           deform[:-1], global_dq=deform[-1])
        damping = jnp.asarray(0.0, jnp.float32)
        tuple_overflow = zero_i
        pair_overflow = zero_i
    surfels, remap, fdiag = fusion_mod.fuse_frame(cfg, intr, surfels, graph,
                                                  frame)
    # Tracked surfels merged into another slot follow the merge
    # (nodes.py:443-447).
    track = state.track
    tid = jnp.clip(track.track_id, 0, surfels.capacity - 1)
    track = track._replace(track_id=jnp.where(
        track.track_id >= 0, remap[tid], track.track_id))
    surfels, track = fusion_mod.prune_surfels(cfg, surfels, track, frame.time)

    # Refresh screen-space projections of all surfels (nodes.py:540-541).
    v, u, _, _ = project_points(surfels.points, intr, cfg.height, cfg.width)
    surfels = surfels._replace(proj_uv=jnp.stack([u, v], axis=0))

    new_state = TrackerState(surfels=surfels, graph=graph, track=track,
                             time=frame.time)
    outs = StepOutputs(
        lm_cost=solve_cost,
        lm_damping=damping,
        num_surfels=surfels.num_active,
        num_nodes=graph.num_active,
        tuple_overflow=tuple_overflow,
        pair_overflow=pair_overflow,
        proj_overflow=fdiag.proj_overflow,
        add_overflow=fdiag.add_overflow,
        free_exhausted=fdiag.free_exhausted,
        dup_skipped=fdiag.dup_skipped,
    )
    return new_state, outs


def make_jit_step(cfg: SuPerConfig, models=None):
    """jit-compiled step closure (config + models static).

    With sf_corr enabled and no prev_color yet (frame 1), pass the frame's
    own color -- zero flow, zero corr contribution, one compile."""
    if models is None or not cfg.losses.sf_corr:
        return jax.jit(functools.partial(track_step, cfg))
    step = functools.partial(track_step, cfg, models=models)
    return jax.jit(lambda intr, state, frame, prev_color: step(
        intr, state, frame, prev_color=prev_color))
