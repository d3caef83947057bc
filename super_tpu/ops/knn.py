"""K-nearest-neighbor search (MXU all-pairs distances + top-k).

Replaces the pytorch3d CUDA ``knn_points`` / ``ball_query`` dependency of the
reference (utils/utils.py:212-242, ``find_knn``) with a TPU-native design:
the pairwise distance matrix is a single matmul (MXU), chunked over queries
to bound memory, followed by ``lax.top_k``.  Masked variants support the
fixed-capacity state (invalid refs/queries excluded by +inf distances) and
the Semantic-SuPer hard-seg class-restricted search.

Feature-major interface: point sets are ``(3, N)``; results are ``(k, N)``
(TPU tile padding makes (N, small) layouts 32-42x oversized -- see
core/state.py docstring).

Distances returned are Euclidean (the reference sqrt's the squared distances
from knn_points).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.inf


def _pairwise_sqdist_fm(q, r):
    """(3, C) x (3, M) -> (C, M) squared distances via one matmul."""
    qq = jnp.sum(q * q, axis=0)[:, None]
    rr = jnp.sum(r * r, axis=0)[None, :]
    cross = jnp.einsum("dc,dm->cm", q, r)
    return jnp.maximum(qq + rr - 2.0 * cross, 0.0)


def masked_knn(queries, refs, k, *, query_mask=None, ref_mask=None,
               query_seg=None, ref_seg=None, chunk: int = 8192):
    """K nearest refs for each query, honoring validity (and class) masks.

    Args:
      queries: (3, N); refs: (3, M), feature-major.
      query_mask: (N,) bool or None; invalid queries get dist=+inf, idx=0.
      ref_mask: (M,) bool or None; invalid refs are never selected.
      query_seg / ref_seg: optional (N,)/(M,) int class labels; when given,
        only same-class refs are eligible (hard-seg find_knn,
        utils/utils.py:222-242).
      chunk: query tile size.
    Returns:
      dists: (k, N) float Euclidean distances (inf for invalid).
      idx:   (k, N) int32 ref indices.
    """
    n = queries.shape[-1]
    k = int(k)
    if ref_mask is None:
        ref_mask = jnp.ones(refs.shape[-1], dtype=bool)

    pad = (-n) % chunk
    qp = jnp.pad(queries, ((0, 0), (0, pad)))
    nchunks = qp.shape[-1] // chunk
    q_tiles = jnp.moveaxis(qp.reshape(3, nchunks, chunk), 1, 0)  # (nc, 3, C)
    if query_seg is not None:
        seg_tiles = jnp.pad(query_seg, (0, pad)).reshape(nchunks, chunk)
        xs = (q_tiles, seg_tiles)
    else:
        xs = (q_tiles,)

    def one_tile(args):
        q = args[0]
        d2 = _pairwise_sqdist_fm(q, refs)
        eligible = ref_mask[None, :]
        if query_seg is not None:
            eligible = eligible & (ref_seg[None, :] == args[1][:, None])
        d2 = jnp.where(eligible, d2, _BIG)
        neg, idx = jax.lax.top_k(-d2, k)
        # (C, k) -> (k, C) feature-major outputs.
        return jnp.sqrt(jnp.maximum(-neg, 0.0)).T, idx.astype(jnp.int32).T

    dists, idx = jax.lax.map(one_tile, xs)          # (nc, k, C)
    dists = jnp.moveaxis(dists, 0, 1).reshape(k, -1)[:, :n]
    idx = jnp.moveaxis(idx, 0, 1).reshape(k, -1)[:, :n]
    if query_mask is not None:
        dists = jnp.where(query_mask[None, :], dists, _BIG)
        idx = jnp.where(query_mask[None, :], idx, 0)
    return dists, idx


def knn(queries, refs, k, chunk: int = 8192):
    """Unmasked KNN (reference find_knn num_classes<=0 path)."""
    return masked_knn(queries, refs, k, chunk=chunk)


def class_masked_knn(queries, refs, k, query_seg, ref_seg, *,
                     query_mask=None, ref_mask=None, chunk: int = 8192):
    """KNN restricted to refs of the query's semantic class."""
    return masked_knn(queries, refs, k, query_mask=query_mask,
                      ref_mask=ref_mask, query_seg=query_seg,
                      ref_seg=ref_seg, chunk=chunk)


def self_knn(points, k, *, mask=None, exclude_self: bool = True,
             seg=None, chunk: int = 8192):
    """KNN of a point set against itself (ED-node neighbor graph).

    Matches the reference pattern of querying k+1 and dropping the first
    column (update_ed, super/nodes.py:154-165).
    """
    kk = k + 1 if exclude_self else k
    dists, idx = masked_knn(points, points, kk, query_mask=mask,
                            ref_mask=mask, query_seg=seg, ref_seg=seg,
                            chunk=min(chunk, max(points.shape[-1], 8)))
    if exclude_self:
        dists, idx = dists[1:], idx[1:]
    return dists, idx
