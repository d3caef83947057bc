"""Multi-chip SPMD step: streams data-parallel, LM residuals surfel-sharded.

The batched tracking step runs under ``shard_map`` over a
``('stream', 'shard')`` mesh:

- the stream-batch dimension of states/frames is partitioned over 'stream'
  (independent trackers, zero cross-traffic);
- within each stream, the point-plane residual/Jacobian work (the N-surfel
  hot loop) is partitioned over 'shard': each chip assembles the normal
  equations of its surfel slice and the (JTJ, JTr) blocks are ``psum``-ed
  over ICI every LM iteration -- the TPU equivalent of the solver data flow
  in reference super/LM.py:61-65.  Fusion (cheap, scatter-bound) runs
  replicated across the shard group.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from super_tpu.config import SuPerConfig
from super_tpu.core import fusion as fusion_mod
from super_tpu.core.lm import lm_solve
from super_tpu.core.losses import LMContext, prepare_lm
from super_tpu.core.state import FrameData, TrackerState
from super_tpu.core.tracker import StepOutputs
from super_tpu.core.warp import apply_deformation
from super_tpu.geometry.camera import Intrinsics, project_points

_SURFEL_FIELDS = ("sf_mask", "sf_knn_idx", "sf_knn_w", "sf_points",
                  "sf_knn", "sf_diff")


def shard_ctx(ctx: LMContext, axis_name: str, num_shards: int) -> LMContext:
    """Slice the surfel-dimension (last-axis) fields of the LM context.

    Works for both assembly modes: the tuple layout's padded slot order is
    sliced together with the surfel fields, and ``block_tuple`` (one id per
    G-block) is sliced to the shard's block range -- every shard then
    reduces its own blocks into the full (T, ...) tuple accumulators and
    the cross-chip ``psum`` of (JTJ, JTr) recovers the exact whole-frame
    normal equations.  Slice boundaries always fall on G-block boundaries
    because the padded capacity is a multiple of the streaming chunk
    (core/assembly.py:build_tuple_layout) and chunk % (G * num_shards) == 0
    for power-of-two shard counts.
    """
    idx = jax.lax.axis_index(axis_name)
    repl = {}
    for name in _SURFEL_FIELDS:
        arr = getattr(ctx, name)
        if arr is None:   # tuple mode: anchors live in per-tuple tables
            continue
        local = arr.shape[-1] // num_shards
        repl[name] = jax.lax.dynamic_slice_in_dim(arr, idx * local, local,
                                                  arr.ndim - 1)
    if ctx.layout is not None:
        bt = ctx.layout.block_tuple
        local_b = bt.shape[0] // num_shards
        bt_local = jax.lax.dynamic_slice_in_dim(bt, idx * local_b, local_b, 0)
        layout = ctx.layout._replace(block_tuple=bt_local)
        if layout.live_end is not None:
            # Shard-local live content end: the chunk-skip bound
            # (losses._live_chunk_count) is relative to this shard's slice.
            local_np = ctx.sf_mask.shape[-1] // num_shards
            layout = layout._replace(live_end=jnp.clip(
                layout.live_end - idx * local_np, 0, local_np))
        repl["layout"] = layout
    return ctx._replace(**repl)


def track_step_sharded(cfg: SuPerConfig, intr: Intrinsics, num_shards: int,
                       state: TrackerState, frame: FrameData
                       ) -> Tuple[TrackerState, StepOutputs]:
    """track_step with the LM solve sharded over the 'shard' mesh axis.

    The tuple-grouped MXU assembly shards directly: shard_ctx slices the
    padded slot order and the per-shard block->tuple map, so each chip
    reduces its G-blocks into full-size tuple accumulators and the psum of
    (JTJ, JTr, cost) is exact (no scatter-assembly fallback)."""
    ctx = prepare_lm(cfg, state.surfels, state.graph, frame)
    zero_i = jnp.asarray(0, jnp.int32)
    tuple_overflow = (ctx.layout.overflow_count if ctx.layout is not None
                      else zero_i)
    pair_overflow = (ctx.layout.pair_overflow if ctx.layout is not None
                     and ctx.layout.pair_overflow is not None else zero_i)
    if num_shards > 1:
        ctx = shard_ctx(ctx, "shard", num_shards)
        result = lm_solve(cfg, ctx, intr, axis_name="shard")
    else:
        result = lm_solve(cfg, ctx, intr)
    surfels, graph = apply_deformation(cfg, state.surfels, state.graph,
                                       result.beta)
    surfels, remap, fdiag = fusion_mod.fuse_frame(cfg, intr, surfels, graph,
                                                  frame)
    track = state.track
    tid = jnp.clip(track.track_id, 0, surfels.capacity - 1)
    track = track._replace(track_id=jnp.where(
        track.track_id >= 0, remap[tid], track.track_id))
    surfels, track = fusion_mod.prune_surfels(cfg, surfels, track, frame.time)
    v, u, _, _ = project_points(surfels.points, intr, cfg.height, cfg.width)
    surfels = surfels._replace(proj_uv=jnp.stack([u, v], axis=0))
    new_state = TrackerState(surfels=surfels, graph=graph, track=track,
                             time=frame.time)
    outs = StepOutputs(lm_cost=result.cost, lm_damping=result.final_damping,
                       num_surfels=surfels.num_active,
                       num_nodes=graph.num_active,
                       tuple_overflow=tuple_overflow,
                       pair_overflow=pair_overflow,
                       proj_overflow=fdiag.proj_overflow,
                       add_overflow=fdiag.add_overflow,
                       free_exhausted=fdiag.free_exhausted,
                       dup_skipped=fdiag.dup_skipped)
    return new_state, outs


def make_multichip_step(cfg: SuPerConfig, intr: Intrinsics, mesh):
    """Batched multi-stream step over the ('stream', 'shard') mesh.

    Inputs/outputs carry a leading stream-batch dimension partitioned over
    'stream'; surfel arrays are replicated across 'shard' with the residual
    work split by axis index inside.
    """
    num_shards = mesh.shape["shard"]

    def local(states, frames):
        step = functools.partial(track_step_sharded, cfg, intr, num_shards)
        return jax.vmap(step)(states, frames)

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P("stream"), P("stream")),
        out_specs=(P("stream"), P("stream")),
        check_rep=False,
    )
    compiler_options = None
    if jax.default_backend() == "cpu":
        # Virtual-device CPU meshes oversubscribe host cores (8 device
        # threads on a 4-core box), so shard threads can skew past XLA's
        # default in-process rendezvous timeouts (warn 20 s / terminate
        # 40 s -- the round-3 MULTICHIP rc=134) purely from scheduling.
        # Generous timeouts make the gate load-immune; real TPU meshes
        # keep the defaults.
        compiler_options = {
            "xla_cpu_collective_call_warn_stuck_seconds": 300,
            "xla_cpu_collective_call_terminate_timeout_seconds": 600,
        }
    return jax.jit(mapped, compiler_options=compiler_options)


def make_batched_step(cfg: SuPerConfig, intr: Intrinsics):
    """Single-chip multi-stream step (plain vmap)."""
    step = functools.partial(track_step_sharded, cfg, intr, 1)
    return jax.jit(jax.vmap(step))
