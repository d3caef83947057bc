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

Surfel-side arrays are feature-major ((3, N) points, (K, N) anchors); the
small ED graph stays row-major.  Masked semantics: softmax runs over the
finite-distance neighbors only, so a graph with fewer than K active nodes
degrades gracefully (the reference would crash).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.state import GraphState, SurfelState
from super_tpu.ops.knn import masked_knn, self_knn

_NEG_INF = -jnp.inf
_JSD_EPS = 1e-13  # utils/utils.py:244-254 epsilon convention


def _stable_softmax0(z):
    """Softmax over axis 0 with -inf masking."""
    zmax = jnp.max(z, axis=0, keepdims=True)
    zmax = jnp.where(jnp.isfinite(zmax), zmax, 0.0)
    e = jnp.exp(z - zmax)
    e = jnp.where(jnp.isfinite(z), e, 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=0, keepdims=True), 1e-20)


def _softmax_exp_neg0(scores, finite_mask):
    """softmax(exp(-scores)) over axis 0, restricted to finite entries."""
    z = jnp.where(finite_mask, jnp.exp(-scores), _NEG_INF)
    return _stable_softmax0(z)


def _jsd_channelwise(graph_conf_t, idx, q_conf, ps=None):
    """JSD between anchor-node class confidences and per-point confidences.

    graph_conf_t: (C, J); idx: (K, N) anchor ids; q_conf: (C, N).
    Returns (K, N).  Channel-wise rank-1 gathers keep buffers compact.
    ``ps`` (C, K, N) passes pre-gathered anchor confidences in (the fusion
    reweight folds them into its pair-packed gather).
    """
    c = graph_conf_t.shape[0]
    if ps is None:
        ps = jnp.take(graph_conf_t, idx, axis=-1)  # (C, K, N), one gather
    kl_pm = 0.0
    kl_qm = 0.0
    for ch in range(c):
        p = ps[ch]                         # (K, N)
        q = q_conf[ch][None, :]            # (1, N)
        m = 0.5 * (p + q)
        kl_pm = kl_pm + p * jnp.log(p / (m + _JSD_EPS) + _JSD_EPS)
        kl_qm = kl_qm + q * jnp.log(q / (m + _JSD_EPS) + _JSD_EPS)
    return 0.5 * (kl_pm + kl_qm)


def update_graph_knn(cfg: SuPerConfig, graph: GraphState) -> GraphState:
    """Node-node neighbor graph + ARAP blend weights (update_ed parity)."""
    k = cfg.num_ed_neighbors
    dists, idx = self_knn(
        graph.points.T, k, mask=graph.active,
        seg=graph.seg if cfg.hard_seg else None)  # (k, J)
    nd = dists / jnp.maximum(graph.radii[None, :], 1e-12)
    finite = jnp.isfinite(dists)
    w = _softmax_exp_neg0(nd, finite)
    return graph._replace(knn_idx=idx.T, knn_w=w.T)


# Optimal compare-exchange sorting networks for small K (pairs applied in
# order; each swaps rows a, b when key_a > key_b).
_SORT_NETS = {
    2: [(0, 1)],
    3: [(0, 1), (1, 2), (0, 1)],
    4: [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)],
    5: [(0, 1), (3, 4), (2, 4), (2, 3), (1, 4), (0, 3), (0, 2), (1, 3),
        (1, 2)],
    6: [(1, 2), (4, 5), (0, 2), (3, 5), (0, 1), (3, 4), (2, 5), (0, 3),
        (1, 4), (2, 4), (1, 3), (2, 3)],
}


def _sort_anchors_by_id(idx, dists):
    """Sort the K anchor rows by node id, carrying distances along.

    A compare-exchange network in registers: jnp.take_along_axis pays the
    ~1 ms fixed gather cost TWICE per call on TPU (idx + dists) while the
    K <= 6 network is pure vector selects.  Exact vs argsort: top_k returns
    distinct ids per query, so strict-greater exchanges give the unique
    ascending order.
    """
    k = idx.shape[0]
    if k not in _SORT_NETS:
        order = jnp.argsort(idx, axis=0)
        return (jnp.take_along_axis(idx, order, axis=0),
                jnp.take_along_axis(dists, order, axis=0))
    ids = [idx[i] for i in range(k)]
    ds = [dists[i] for i in range(k)]
    for a, b in _SORT_NETS[k]:
        swap = ids[a] > ids[b]
        ids[a], ids[b] = (jnp.where(swap, ids[b], ids[a]),
                          jnp.where(swap, ids[a], ids[b]))
        ds[a], ds[b] = (jnp.where(swap, ds[b], ds[a]),
                        jnp.where(swap, ds[a], ds[b]))
    return jnp.stack(ids), jnp.stack(ds)


def anchor_points(
    cfg: SuPerConfig,
    graph: GraphState,
    points,                    # (3, N) feature-major
    mask,                      # (N,) bool candidate validity
    seg=None,                  # (N,) int, for hard_seg
    seg_conf=None,             # (C, N), for semantic soft weights
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K nearest ED nodes per point + blend weights + stability mask.

    Returns (knn_idx (K, N), knn_w (K, N), stable (N,)).
    """
    k = cfg.num_neighbors
    dists, idx = masked_knn(
        points, graph.points.T, k, query_mask=mask, ref_mask=graph.active,
        query_seg=seg if cfg.hard_seg else None,
        ref_seg=graph.seg if cfg.hard_seg else None)
    # Canonicalize anchor order (ascending node id): the blend is
    # order-invariant, and order-free anchor tuples group ~4x better in the
    # JTJ tuple assembly (fewer distinct tuples = less padding + no
    # capacity overflow).
    idx, dists = _sort_anchors_by_id(idx, dists)

    radii = graph.radii[idx]               # (K, N) rank-1 gather per row
    finite = jnp.isfinite(dists)
    # Too far from every anchor -> unstable (nodes.py:181-182).
    stable = mask & jnp.any(finite & (dists <= radii), axis=0)
    w = _anchor_weights(cfg, graph, idx, dists, radii, finite, seg_conf)
    return idx, w, stable


def _anchor_weights(cfg, graph, idx, dists, radii, finite, seg_conf,
                    conf_ps=None):
    nd = dists / jnp.maximum(radii, 1e-12)
    if cfg.method == "semantic-super" and not cfg.hard_seg and seg_conf is not None:
        div = _jsd_channelwise(graph.seg_conf.T, idx, seg_conf, ps=conf_ps)
        scores = 0.5 * div + 0.5 * nd  # log of the geometric blend
        return _softmax_exp_neg0(scores, finite)
    return _softmax_exp_neg0(nd, finite)


# Pair-packing threshold: the (2F, J^2) pair table costs J^2 * 2F * 4 B to
# build per call (J = 336 -> 3.6 MB, ~free); past ~1<<19 columns the table
# build overtakes the index savings, so dense graphs keep the plain gather.
_PAIR_BANK_MAX_COLS = 1 << 19


def recompute_surfel_weights(cfg: SuPerConfig, surfels: SurfelState,
                             graph: GraphState) -> SurfelState:
    """Refresh knn_w from current positions, keeping anchor indices
    (fusion step, nodes.py:466-484)."""
    idx = surfels.knn_idx                   # (K, N)
    k, n = idx.shape
    j = graph.radii.shape[0]
    rows = [graph.points.T, graph.radii[None]]        # (4, J)
    semantic = (cfg.method == "semantic-super" and not cfg.hard_seg
                and surfels.seg_conf is not None)
    if semantic:
        rows.append(graph.seg_conf.T)                 # + (C, J)
    bank = jnp.concatenate(rows, axis=0)              # (F, J)
    f = bank.shape[0]
    conf_ps = None
    if k % 2 == 0 and j * j <= _PAIR_BANK_MAX_COLS:
        # Pair-packed gather: gathers cost per INDEX (CLAUDE.md cost
        # model), so folding each anchor PAIR (a, b) into one column of a
        # precomputed (2F, J^2) table halves the index count (K*N = 1.6M
        # -> K*N/2 at 480p) for the exact same f32 values.
        a_side = jnp.broadcast_to(bank[:, :, None], (f, j, j))
        b_side = jnp.broadcast_to(bank[:, None, :], (f, j, j))
        bank2 = jnp.concatenate([a_side, b_side],
                                axis=0).reshape(2 * f, j * j)
        pidx = (idx.reshape(k // 2, 2, n)[:, 0] * j
                + idx.reshape(k // 2, 2, n)[:, 1])    # (K/2, N)
        g2 = jnp.take(bank2, pidx, axis=-1)           # (2F, K/2, N)
        # De-interleave pairs back to anchor-major (F, K, N).
        g = jnp.stack([g2[:f], g2[f:]],
                      axis=2).reshape(f, k, n)
    else:
        g = jnp.take(bank, idx, axis=-1)              # (F, K, N)
    anchors, radii = g[:3], g[3]
    if semantic:
        conf_ps = g[4:]                               # (C, K, N)
    diff = surfels.points[:, None, :] - anchors
    dists = jnp.sqrt(jnp.sum(diff * diff, axis=0))    # (K, N)
    finite = jnp.ones_like(dists, dtype=bool)
    w = _anchor_weights(cfg, graph, idx, dists, radii, finite,
                        surfels.seg_conf, conf_ps=conf_ps)
    return surfels._replace(knn_w=w)
