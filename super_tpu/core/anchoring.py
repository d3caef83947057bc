"""KNN anchoring: node-node neighbor weights and surfel-node anchors.

Parity:
- ``Surfels.update_ed`` (super/nodes.py:154-168): K+1 self-excluded KNN over
  ED nodes, distances normalized by the node's own radius,
  ``knn_w = softmax(exp(-d))``.
- ``Surfels.update_sfed_knn`` (super/nodes.py:170-191): K nearest nodes per
  surfel; surfels farther than every anchor's radius are de-stabilized;
  weights ``softmax(exp(-d / r))``, with the Semantic-SuPer JSD blend
  ``softmax(exp(-JSD)^0.5 * exp(-d/r)^0.5)`` (nodes.py:183-189).
- The weight *recomputation* with fixed indices inside fusion
  (nodes.py:466-484).

Masked semantics: softmax runs over the finite-distance neighbors only, so a
graph with fewer than K active nodes degrades gracefully (the reference
would crash).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.state import GraphState, SurfelState
from super_tpu.geometry.divergence import jsd
from super_tpu.ops.knn import class_masked_knn, masked_knn

_NEG_INF = -jnp.inf


def _softmax_exp_neg(scores, finite_mask):
    """softmax(exp(-scores)) over the last axis, restricted to finite rows."""
    z = jnp.where(finite_mask, jnp.exp(-scores), _NEG_INF)
    return _stable_softmax(z)


def _stable_softmax(z):
    zmax = jnp.max(z, axis=-1, keepdims=True)
    zmax = jnp.where(jnp.isfinite(zmax), zmax, 0.0)
    e = jnp.exp(z - zmax)
    e = jnp.where(jnp.isfinite(z), e, 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)


def update_graph_knn(cfg: SuPerConfig, graph: GraphState) -> GraphState:
    """Node-node neighbor graph + ARAP blend weights (update_ed parity)."""
    k = cfg.num_ed_neighbors
    if cfg.hard_seg:
        dists, idx = class_masked_knn(
            graph.points, graph.points, k + 1, graph.seg, graph.seg,
            query_mask=graph.active, ref_mask=graph.active,
            chunk=min(8192, graph.capacity))
    else:
        dists, idx = masked_knn(
            graph.points, graph.points, k + 1,
            query_mask=graph.active, ref_mask=graph.active,
            chunk=min(8192, graph.capacity))
    dists, idx = dists[:, 1:], idx[:, 1:]  # drop self-match
    nd = dists / jnp.maximum(graph.radii[:, None], 1e-12)
    finite = jnp.isfinite(dists)
    w = _softmax_exp_neg(nd, finite)
    return graph._replace(knn_idx=idx, knn_w=w)


def anchor_points(
    cfg: SuPerConfig,
    graph: GraphState,
    points,                    # (N, 3)
    mask,                      # (N,) bool candidate validity
    seg=None,                  # (N,) int, for hard_seg
    seg_conf=None,             # (N, C), for semantic soft weights
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K nearest ED nodes per point + blend weights + stability mask.

    Returns (knn_idx (N, K), knn_w (N, K), stable (N,)).
    """
    k = cfg.num_neighbors
    if cfg.hard_seg:
        dists, idx = class_masked_knn(
            points, graph.points, k, seg, graph.seg,
            query_mask=mask, ref_mask=graph.active)
    else:
        dists, idx = masked_knn(points, graph.points, k,
                                query_mask=mask, ref_mask=graph.active)
    radii = graph.radii[idx]
    finite = jnp.isfinite(dists)
    # Too far from every anchor -> unstable (nodes.py:181-182).
    stable = mask & jnp.any(finite & (dists <= radii), axis=1)
    w = _anchor_weights(cfg, graph, idx, dists, radii, finite, seg_conf)
    return idx, w, stable


def _anchor_weights(cfg, graph, idx, dists, radii, finite, seg_conf):
    nd = dists / jnp.maximum(radii, 1e-12)
    if cfg.method == "semantic-super" and not cfg.hard_seg and seg_conf is not None:
        p = graph.seg_conf[idx]            # (N, K, C)
        q = seg_conf[:, None, :]           # (N, 1, C)
        scores = 0.5 * jsd(p, q) + 0.5 * nd  # log of the geometric blend
        return _softmax_exp_neg(scores, finite)
    return _softmax_exp_neg(nd, finite)


def recompute_surfel_weights(cfg: SuPerConfig, surfels: SurfelState,
                             graph: GraphState) -> SurfelState:
    """Refresh knn_w from current positions, keeping anchor indices
    (fusion step, nodes.py:466-484)."""
    anchors = graph.points[surfels.knn_idx]
    dists = jnp.linalg.norm(surfels.points[:, None, :] - anchors, axis=-1)
    radii = graph.radii[surfels.knn_idx]
    finite = jnp.ones_like(dists, dtype=bool)
    w = _anchor_weights(cfg, graph, surfels.knn_idx, dists, radii, finite,
                        surfels.seg_conf)
    return surfels._replace(knn_w=w)
