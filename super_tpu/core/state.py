"""Fixed-capacity, mask-carried state pytrees (feature-major layout).

The reference keeps the surfel map as a mutable Python object whose tensors
grow/shrink every frame (super/nodes.py:36-152).  On TPU, dynamic shapes force
recompilation, so the state here is a struct-of-arrays at *fixed capacity*
with an ``active`` mask; fusion adds surfels into free slots and pruning just
clears mask bits.  A pleasant consequence: surfel slot ids are *stable* across
frames, so tracked-point ids never need the remapping dance of
``prepareStableIndexNSwapAllModel`` (super/nodes.py:577-580).

LAYOUT RULE (load-bearing for HBM footprint): TPU tiles pad the last two
dimensions of every materialized buffer to (8, 128).  A row-major point
array ``(N, 3)`` therefore occupies 42x its logical size; at N ~ 4e5 that
is ~250 MB *per array*.  All large per-surfel arrays here are stored
feature-major -- ``(3, N)``, ``(K, N)``, ``(C, N)`` -- which pads the small
axis 3 -> 8 (2.7x worst case) instead of the minor axis 3 -> 128.  The ED
graph (J <= a few thousand) stays row-major; its padding is bytes.

All states are NamedTuples (pytrees): they flow through ``jax.jit``,
``lax.scan``, ``vmap`` (stream axis) and ``shard_map`` unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from super_tpu.config import SuPerConfig


class GraphState(NamedTuple):
    """Embedded-deformation graph (reference: super/graph_encoder.py Data).

    Row-major: J is small, tile padding is negligible.
    """

    points: jnp.ndarray        # (J, 3) node positions g_i
    norms: jnp.ndarray         # (J, 3)
    radii: jnp.ndarray         # (J,)  mean incident edge length
    active: jnp.ndarray        # (J,)  bool
    knn_idx: jnp.ndarray       # (J, K_ed) neighbor node ids
    knn_w: jnp.ndarray         # (J, K_ed) ARAP blend weights
    edges: jnp.ndarray         # (E, 2) node id pairs
    edge_active: jnp.ndarray   # (E,) bool
    edge_lens: jnp.ndarray     # (E,) rest lengths
    triangles: jnp.ndarray     # (T, 3) node id triples
    tri_active: jnp.ndarray    # (T,) bool
    tri_areas: jnp.ndarray     # (T,) rest areas
    seg: jnp.ndarray           # (J,) int32 semantic class (0 if unused)
    seg_conf: jnp.ndarray      # (J, C) class confidences

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def num_active(self):
        return jnp.sum(self.active)

    @property
    def param_dim(self) -> int:
        """Length of the flattened decision vector (7 per node slot)."""
        return 7 * self.capacity


class SurfelState(NamedTuple):
    """Surfel map, feature-major (reference: super/nodes.py:37-91)."""

    points: jnp.ndarray      # (3, N)
    norms: jnp.ndarray       # (3, N)
    colors: jnp.ndarray      # (3, N)
    radii: jnp.ndarray       # (N,)
    confs: jnp.ndarray       # (N,)
    time_stamp: jnp.ndarray  # (N,) last-update frame time
    active: jnp.ndarray      # (N,) bool ("isStable" in the reference)
    knn_idx: jnp.ndarray     # (K, N) anchor ED node ids
    knn_w: jnp.ndarray       # (K, N) anchor weights
    proj_uv: jnp.ndarray     # (2, N) last screen-space (u, v) ("projdata")
    seg: jnp.ndarray         # (N,) int32
    seg_conf: jnp.ndarray    # (C, N)
    dist2edge: jnp.ndarray   # (N,) distance to own-class semantic boundary

    @property
    def capacity(self) -> int:
        return self.points.shape[-1]

    @property
    def num_active(self):
        return jnp.sum(self.active)


class TrackState(NamedTuple):
    """Tracked GT control points (reference: super/nodes.py:48-52,225-265).

    track_id semantics: -1 not yet tracking, -2 lost, >=0 stable surfel slot.
    (P ~ 20: row-major is fine.)
    """

    track_id: jnp.ndarray    # (P,) int32
    coords: jnp.ndarray      # (P, 2) last predicted screen (x, y)
    coord_valid: jnp.ndarray  # (P,) bool


class TrackerState(NamedTuple):
    """Everything carried frame to frame: ``step(state, frame) -> state``."""

    surfels: SurfelState
    graph: GraphState
    track: TrackState
    time: jnp.ndarray        # () current frame time


class FrameData(NamedTuple):
    """Per-frame surfel candidates, *pixel-indexed* (P = H*W slots),
    feature-major.

    The reference compacts valid pixels to a ragged (N, .) array plus an
    ``index_map`` back-pointer (utils/data_loader.py:461-518).  Keeping the
    dense pixel indexing makes ``index_map`` the identity over valid pixels
    and removes every compaction from the hot path.
    """

    points: jnp.ndarray      # (3, P)
    norms: jnp.ndarray       # (3, P)
    colors: jnp.ndarray      # (3, P)
    radii: jnp.ndarray       # (P,)
    confs: jnp.ndarray       # (P,)
    valid: jnp.ndarray       # (P,) bool
    seg: jnp.ndarray         # (P,) int32
    seg_conf: jnp.ndarray    # (C, P)
    dist2edge: jnp.ndarray   # (P,)
    time: jnp.ndarray        # ()
    color_image: jnp.ndarray  # (3, H, W) raw RGB (for viz / render losses)

    def index_map(self, height: int, width: int):
        """(H, W) int32 pixel -> candidate id, -1 where invalid."""
        ids = jnp.arange(self.valid.shape[0], dtype=jnp.int32)
        return jnp.where(self.valid, ids, -1).reshape(height, width)


def empty_surfels(cfg: SuPerConfig, dtype=jnp.float32) -> SurfelState:
    n = cfg.capacity.surfel_capacity
    k = cfg.num_neighbors
    c = cfg.num_classes
    z = lambda *s: jnp.zeros(s, dtype=dtype)  # noqa: E731
    return SurfelState(
        points=z(3, n), norms=z(3, n), colors=z(3, n),
        radii=z(n), confs=z(n), time_stamp=z(n),
        active=jnp.zeros((n,), dtype=bool),
        knn_idx=jnp.zeros((k, n), dtype=jnp.int32),
        knn_w=z(k, n), proj_uv=z(2, n),
        seg=jnp.zeros((n,), dtype=jnp.int32), seg_conf=z(c, n),
        dist2edge=z(n),
    )


def empty_graph(cfg: SuPerConfig, dtype=jnp.float32) -> GraphState:
    j = cfg.capacity.node_capacity
    e = cfg.capacity.edge_capacity
    t = cfg.capacity.triangle_capacity
    k = cfg.num_ed_neighbors
    c = cfg.num_classes
    z = lambda *s: jnp.zeros(s, dtype=dtype)  # noqa: E731
    return GraphState(
        points=z(j, 3), norms=z(j, 3), radii=z(j),
        active=jnp.zeros((j,), dtype=bool),
        knn_idx=jnp.zeros((j, k), dtype=jnp.int32), knn_w=z(j, k),
        edges=jnp.zeros((e, 2), dtype=jnp.int32),
        edge_active=jnp.zeros((e,), dtype=bool), edge_lens=z(e),
        triangles=jnp.zeros((t, 3), dtype=jnp.int32),
        tri_active=jnp.zeros((t,), dtype=bool), tri_areas=z(t),
        seg=jnp.zeros((j,), dtype=jnp.int32), seg_conf=z(j, c),
    )


def empty_track(cfg: SuPerConfig, dtype=jnp.float32) -> TrackState:
    p = cfg.capacity.track_capacity
    return TrackState(
        track_id=jnp.full((p,), -1, dtype=jnp.int32),
        coords=jnp.zeros((p, 2), dtype=dtype),
        coord_valid=jnp.zeros((p,), dtype=bool),
    )


# ---------------------------------------------------------------------------
# Feature-major helpers
# ---------------------------------------------------------------------------

def gather_rows(fm_array, idx):
    """Gather columns of a feature-major (F, N) array by an index array of
    any shape.  One minor-axis gather: the per-index overhead amortizes over
    the F channels (~4x faster than F rank-1 gathers on TPU).

    Returns shape (F,) + idx.shape.
    """
    return jnp.take(fm_array, idx, axis=-1)


def scatter_set_rows(fm_array, idx, values, do=None):
    """Set columns of a feature-major (F, N) array at ``idx`` (any shape)
    to ``values`` ((F,) + idx.shape), optionally gated by ``do`` (idx.shape).
    Channel-wise rank-1 scatters; out-of-range indices are dropped."""
    out = []
    for f in range(fm_array.shape[0]):
        v = values[f]
        if do is not None:
            v = jnp.where(do, v, fm_array[f][jnp.clip(idx, 0, fm_array.shape[1] - 1)])
        out.append(fm_array[f].at[idx].set(v, mode="drop"))
    return jnp.stack(out)
