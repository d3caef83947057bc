"""Apply an estimated deformation to the surfel map and ED graph.

Parity: Surfels.update (super/nodes.py:193-223), including the reference's
quirk of passing the full 7-vector to the normal transform on the surfel
path (the blended normal receives the node translations before
renormalization, nodes.py:207-210); node normals are rotated only.

Surfel arrays are feature-major; the warp streams row-major chunks through
``lax.scan`` so no (N, K, 3) buffer is materialized (TPU tile padding --
see core/state.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.state import GraphState, SurfelState
from super_tpu.geometry.quaternion import blend_warp, transform_quat_t


def _warp_chunk(cfg, graph_points_t, beta, global_dq, chunk):
    """Row-major warp of one surfel chunk.

    chunk: (points (3, C), norms (3, C), idx (K, C), w (K, C)).
    Returns (new_points (3, C), new_norms (3, C)).
    """
    pts_fm, nrm_fm, idx_fm, w_fm = chunk
    c = pts_fm.shape[-1]
    pts = pts_fm.T                       # (C, 3)
    idx = idx_fm.T                       # (C, K)
    w = w_fm.T                           # (C, K)
    anchors = jnp.moveaxis(jnp.take(graph_points_t, idx, axis=-1),
                           0, -1)        # (C, K, 3)
    diff = pts[:, None, :] - anchors
    beta_k = beta[idx]                   # (C, K, 7)

    new_points = blend_warp(diff, anchors, beta_k, w)
    norms_k = jnp.broadcast_to(nrm_fm.T[:, None, :], diff.shape)
    new_norms = transform_quat_t(norms_k, beta_k)
    new_norms = jnp.sum(w[..., None] * new_norms, axis=-2)

    if global_dq is not None:
        # Reference parity (nodes.py:203-222, autograd path): the global T_g
        # row adds only its *translation* to positions but applies its
        # *rotation* to normals.
        new_points = new_points + global_dq[4:7]
        new_norms = transform_quat_t(new_norms, global_dq[0:4])

    new_norms = new_norms / jnp.maximum(
        jnp.linalg.norm(new_norms, axis=-1, keepdims=True), 1e-12)
    return new_points.T, new_norms.T


def apply_deformation(
    cfg: SuPerConfig,
    surfels: SurfelState,
    graph: GraphState,
    beta,                      # (J_cap, 7)
    global_dq=None,            # (7,) autograd path's T_g row, or None (LM)
) -> Tuple[SurfelState, GraphState]:
    n = surfels.capacity
    chunk = min(n, 32768)
    while n % chunk != 0:
        chunk //= 2
    nc = n // chunk
    gp_t = graph.points.T

    def split(a):
        return jnp.moveaxis(a.reshape(a.shape[0], nc, chunk), 1, 0)

    xs = (split(surfels.points), split(surfels.norms),
          split(surfels.knn_idx), split(surfels.knn_w))
    if nc == 1:
        new_p, new_n = _warp_chunk(cfg, gp_t, beta, global_dq,
                                   jax.tree.map(lambda a: a[0], xs))
    else:
        def body(_, xe):
            return None, _warp_chunk(cfg, gp_t, beta, global_dq, xe)

        _, (ps, ns) = jax.lax.scan(body, None, xs)    # (nc, 3, C)
        new_p = jnp.moveaxis(ps, 0, 1).reshape(3, n)
        new_n = jnp.moveaxis(ns, 0, 1).reshape(3, n)

    act = surfels.active[None, :]
    surfels = surfels._replace(
        points=jnp.where(act, new_p, surfels.points),
        norms=jnp.where(act, new_n, surfels.norms),
    )

    # ED nodes (row-major, small).
    new_node_points = graph.points + beta[:, 4:7]
    new_node_norms = transform_quat_t(graph.norms, beta[:, 0:4])
    if global_dq is not None:
        new_node_points = new_node_points + global_dq[4:7]
        new_node_norms = transform_quat_t(new_node_norms, global_dq[0:4])
    new_node_norms = new_node_norms / jnp.maximum(
        jnp.linalg.norm(new_node_norms, axis=-1, keepdims=True), 1e-12)
    gact = graph.active[:, None]
    graph = graph._replace(
        points=jnp.where(gact, new_node_points, graph.points),
        norms=jnp.where(gact, new_node_norms, graph.norms),
    )
    return surfels, graph
