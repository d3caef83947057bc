"""Shared test fixtures: tiny synthetic scenes + small-capacity configs."""

import jax.numpy as jnp
import numpy as np

from super_tpu.config import CapacityConfig, SolverConfig, SuPerConfig
from super_tpu.core.preprocess import preprocess_frame
from super_tpu.data.synthetic import default_intrinsics, generate


def tiny_config(h=48, w=64, step=8, proj_depth=4):
    return SuPerConfig(
        height=h, width=w, mesh_step_size=step,
        solver=SolverConfig(
            assembly_tuple_cap=1024,
            assembly_pad_group=8,
            assembly_chunk=4096,
        ),
        capacity=CapacityConfig(
            surfel_capacity=2 * h * w,
            node_capacity=64,
            edge_capacity=256,
            triangle_capacity=128,
            new_surfel_capacity=h * w,
            proj_map_depth=proj_depth,
        ),
    )


def tiny_scene(num_frames=6, h=48, w=64, step=8, seed=0):
    cfg = tiny_config(h=h, w=w, step=step)
    intr = default_intrinsics(h, w)
    seq = generate(num_frames, h, w, intr=intr, seed=seed)
    frames = [
        preprocess_frame(cfg, intr, jnp.asarray(seq.depths[t]),
                         jnp.asarray(seq.colors[t].transpose(2, 0, 1)),
                         float(t))
        for t in range(num_frames)
    ]
    return cfg, intr, seq, frames
