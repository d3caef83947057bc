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
from super_tpu.geometry.quaternion import transform_quat_t


def _cross_fm(x, y):
    return jnp.stack([x[1] * y[2] - x[2] * y[1],
                      x[2] * y[0] - x[0] * y[2],
                      x[0] * y[1] - x[1] * y[0]])


def _rot_fm(qw, qv, v):
    """R(q) v for feature-major (3, C) vectors (qw: (1, C))."""
    c = _cross_fm(qv, v)
    return v + 2.0 * qw * c + 2.0 * _cross_fm(qv, c)


def _warp_chunk(cfg, bank, global_dq, chunk):
    """Feature-major warp of one surfel chunk.

    bank: (10, J) packed [anchor xyz; q(4); b(3)] per node -- ONE minor-axis
    gather per chunk fetches everything (the row-major variant's
    ``beta[idx]`` materialized (C, K, 7) whose trailing (4, 7) dims pad to
    (8, 128) TPU tiles).

    chunk: (points (3, C), norms (3, C), idx (K, C), w (K, C)).
    Returns (new_points (3, C), new_norms (3, C)).
    """
    pts_fm, nrm_fm, idx_fm, w_fm = chunk
    k = idx_fm.shape[0]
    g = jnp.take(bank, idx_fm, axis=-1)  # (10, K, C)
    p_acc = 0.0
    n_acc = 0.0
    for a in range(k):
        ga = g[0:3, a]
        qw = g[3:4, a]
        qv = g[4:7, a]
        b = g[7:10, a]
        wa = w_fm[a][None]
        v = pts_fm - ga
        p_acc = p_acc + wa * (_rot_fm(qw, qv, v) + b + ga)
        # Reference quirk (nodes.py:207-210): the surfel-path normal blend
        # passes the full 7-vector, so translations land on the normals
        # before renormalization.
        n_acc = n_acc + wa * (_rot_fm(qw, qv, nrm_fm) + b)

    if global_dq is not None:
        # Reference parity (nodes.py:203-222, autograd path): the global T_g
        # row adds only its *translation* to positions but applies its
        # *rotation* to normals.
        p_acc = p_acc + global_dq[4:7, None]
        n_acc = _rot_fm(global_dq[0:1, None], global_dq[1:4, None], n_acc)

    n_acc = n_acc / jnp.maximum(
        jnp.sqrt(jnp.sum(n_acc * n_acc, axis=0, keepdims=True)), 1e-12)
    return p_acc, n_acc


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
    bank = jnp.concatenate([graph.points.T, beta.T.astype(
        surfels.points.dtype)], axis=0)               # (10, J)

    def split(a):
        return jnp.moveaxis(a.reshape(a.shape[0], nc, chunk), 1, 0)

    xs = (split(surfels.points), split(surfels.norms),
          split(surfels.knn_idx), split(surfels.knn_w))
    if nc == 1:
        new_p, new_n = _warp_chunk(cfg, bank, global_dq,
                                   jax.tree.map(lambda a: a[0], xs))
    else:
        def body(_, xe):
            return None, _warp_chunk(cfg, bank, global_dq, xe)

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
