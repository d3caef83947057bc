"""Fixed-capacity, mask-carried state pytrees.

The reference keeps the surfel map as a mutable Python object whose tensors
grow/shrink every frame (super/nodes.py:36-152).  On TPU, dynamic shapes force
recompilation, so the state here is a struct-of-arrays at *fixed capacity*
with an ``active`` mask; fusion adds surfels into free slots and pruning just
clears mask bits.  A pleasant consequence: surfel slot ids are *stable* across
frames, so tracked-point ids never need the remapping dance of
``prepareStableIndexNSwapAllModel`` (super/nodes.py:577-580).

All states are NamedTuples (pytrees): they flow through ``jax.jit``,
``lax.scan``, ``vmap`` (stream axis) and ``shard_map`` unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from super_tpu.config import SuPerConfig


class GraphState(NamedTuple):
    """Embedded-deformation graph (reference: super/graph_encoder.py Data).

    Capacities: J nodes, E edges, T triangles (config.capacity.*).
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
    """Surfel map (reference: super/nodes.py:37-91 attribute list)."""

    points: jnp.ndarray      # (N, 3)
    norms: jnp.ndarray       # (N, 3)
    colors: jnp.ndarray      # (N, 3)
    radii: jnp.ndarray       # (N,)
    confs: jnp.ndarray       # (N,)
    time_stamp: jnp.ndarray  # (N,) last-update frame time
    active: jnp.ndarray      # (N,) bool ("isStable" in the reference)
    knn_idx: jnp.ndarray     # (N, K) anchor ED node ids
    knn_w: jnp.ndarray       # (N, K) anchor weights
    proj_uv: jnp.ndarray     # (N, 2) last screen-space (u, v) ("projdata")
    seg: jnp.ndarray         # (N,) int32
    seg_conf: jnp.ndarray    # (N, C)
    dist2edge: jnp.ndarray   # (N,) distance to own-class semantic boundary

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def num_active(self):
        return jnp.sum(self.active)


class TrackState(NamedTuple):
    """Tracked GT control points (reference: super/nodes.py:48-52,225-265).

    track_id semantics: -1 not yet tracking, -2 lost, >=0 stable surfel slot.
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
    """Per-frame surfel candidates, *pixel-indexed* (P = H*W slots).

    The reference compacts valid pixels to a ragged (N, .) array plus an
    ``index_map`` back-pointer (utils/data_loader.py:461-518).  Keeping the
    dense pixel indexing makes ``index_map`` the identity over valid pixels
    and removes every compaction from the hot path.
    """

    points: jnp.ndarray      # (P, 3)
    norms: jnp.ndarray       # (P, 3)
    colors: jnp.ndarray      # (P, 3)
    radii: jnp.ndarray       # (P,)
    confs: jnp.ndarray       # (P,)
    valid: jnp.ndarray       # (P,) bool
    seg: jnp.ndarray         # (P,) int32
    seg_conf: jnp.ndarray    # (P, C)
    dist2edge: jnp.ndarray   # (P,)
    time: jnp.ndarray        # ()
    color_image: jnp.ndarray  # (H, W, 3) raw RGB (for viz / render losses)

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
        points=z(n, 3), norms=z(n, 3), colors=z(n, 3),
        radii=z(n), confs=z(n), time_stamp=z(n),
        active=jnp.zeros((n,), dtype=bool),
        knn_idx=jnp.zeros((n, k), dtype=jnp.int32),
        knn_w=z(n, k), proj_uv=z(n, 2),
        seg=jnp.zeros((n,), dtype=jnp.int32), seg_conf=z(n, c),
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
