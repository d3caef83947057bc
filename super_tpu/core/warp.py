"""Apply an estimated deformation to the surfel map and ED graph.

Parity: Surfels.update (super/nodes.py:193-223), including the reference's
quirk of passing the full 7-vector to the normal transform on the surfel
path (the blended normal receives the node translations before
renormalization, nodes.py:207-210); node normals are rotated only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.state import GraphState, SurfelState
from super_tpu.geometry.quaternion import blend_warp, transform_quat_t


def apply_deformation(
    cfg: SuPerConfig,
    surfels: SurfelState,
    graph: GraphState,
    beta,                      # (J_cap, 7)
    global_dq=None,            # (7,) autograd path's T_g row, or None (LM path)
) -> Tuple[SurfelState, GraphState]:
    k = cfg.num_neighbors
    sf_knn = graph.points[surfels.knn_idx]
    sf_diff = surfels.points[:, None, :] - sf_knn
    beta_k = beta[surfels.knn_idx]  # (N, K, 7)

    new_points = blend_warp(sf_diff, sf_knn, beta_k, surfels.knn_w)
    # Blended "rotation" of normals -- the reference transforms with the full
    # 7-vector (translation included) then renormalizes (nodes.py:207-213).
    norms_k = jnp.broadcast_to(surfels.norms[:, None, :], sf_diff.shape)
    new_norms = transform_quat_t(norms_k, beta_k)
    new_norms = jnp.sum(surfels.knn_w[..., None] * new_norms, axis=-2)

    new_node_points = graph.points + beta[:, 4:7]
    new_node_norms = transform_quat_t(graph.norms, beta[:, 0:4])

    if global_dq is not None:
        # Reference parity (nodes.py:203-222, autograd path): the global T_g
        # row adds only its *translation* to point positions but applies its
        # *rotation* to normals.
        new_points = new_points + global_dq[4:7]
        new_norms = transform_quat_t(new_norms, global_dq[0:4])
        new_node_points = new_node_points + global_dq[4:7]
        new_node_norms = transform_quat_t(new_node_norms, global_dq[0:4])

    new_norms = new_norms / jnp.maximum(
        jnp.linalg.norm(new_norms, axis=-1, keepdims=True), 1e-12)
    new_node_norms = new_node_norms / jnp.maximum(
        jnp.linalg.norm(new_node_norms, axis=-1, keepdims=True), 1e-12)

    act = surfels.active[:, None]
    gact = graph.active[:, None]
    surfels = surfels._replace(
        points=jnp.where(act, new_points, surfels.points),
        norms=jnp.where(act, new_norms, surfels.norms),
    )
    graph = graph._replace(
        points=jnp.where(gact, new_node_points, graph.points),
        norms=jnp.where(gact, new_node_norms, graph.norms),
    )
    return surfels, graph
