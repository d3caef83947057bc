"""ED-graph construction: grid-mesh sampling of the valid-pixel map.

Re-implements the live path of the reference graph builder
(``init_graph`` + ``DirectDeformGraph`` with edge_identify_method='grid_mesh',
super/graph_encoder.py:11-67,128-167) with a *static topology*: for a given
(height, width, mesh_step_size) the anchor grid, candidate edge list and
candidate triangle list are compile-time constants; per-frame validity only
toggles masks.  This is what makes the builder jit-stable on TPU.

Grid cell layout (s = anchor, step = mesh_step_size):

    s --- pt1        edges: s-pt1, s-pt2, s-pt3, pt1-pt3
    | \\  /           triangles: (s, pt1, pt2), (s, pt2, pt3)
    | /  \\
    pt3   pt2
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from super_tpu.config import SuPerConfig
from super_tpu.core.state import FrameData, GraphState


def grid_layout(height: int, width: int, step: int):
    """Static anchor/edge/triangle topology for the grid mesh.

    Returns numpy arrays:
      anchor_pix: (G,) flattened pixel index of each anchor (row-major grid).
      edges: (E0, 2) node-id pairs; triangles: (T0, 3) node-id triples.
    Anchor u in range(0, width-1, step), v in range(0, height-1, step)
    (graph_encoder.py:17-18 -- note the -1, the last row/col are excluded).
    """
    us = np.arange(0, width - 1, step)
    vs = np.arange(0, height - 1, step)
    gw, gh = len(us), len(vs)
    gx, gy = np.meshgrid(np.arange(gw), np.arange(gh))  # (gh, gw)
    node_id = (gy * gw + gx).astype(np.int32)
    anchor_pix = (vs[gy] * width + us[gx]).reshape(-1).astype(np.int32)

    def nid(y, x):
        return (y * gw + x).astype(np.int32)

    edges = []
    tris = []
    # Cells with a right neighbor / bottom neighbor / both.
    y, x = gy, gx
    has_r = x + 1 < gw
    has_d = y + 1 < gh
    has_rd = has_r & has_d
    # s - pt1 (right)
    edges.append(np.stack([nid(y, x)[has_r], nid(y, x + 1)[has_r]], axis=1))
    # s - pt2 (diag)
    edges.append(np.stack([nid(y, x)[has_rd], nid(y + 1, (x + 1) % gw)[has_rd]], axis=1))
    # s - pt3 (down)
    edges.append(np.stack([nid(y, x)[has_d], nid(y + 1, x)[has_d]], axis=1))
    # pt1 - pt3 (anti-diagonal)
    edges.append(np.stack([nid(y, (x + 1) % gw)[has_rd], nid(y + 1, x)[has_rd]], axis=1))
    edges = np.concatenate(edges, axis=0)
    # triangles (s, pt1, pt2) and (s, pt2, pt3)
    s = nid(y, x)[has_rd]
    p1 = nid(y, (x + 1) % gw)[has_rd]
    p2 = nid(y + 1, (x + 1) % gw)[has_rd]
    p3 = nid(y + 1, x)[has_rd]
    tris.append(np.stack([s, p1, p2], axis=1))
    tris.append(np.stack([s, p2, p3], axis=1))
    tris = np.concatenate(tris, axis=0)
    return anchor_pix, edges.astype(np.int32), tris.astype(np.int32)


def build_graph(cfg: SuPerConfig, frame: FrameData) -> GraphState:
    """Build the ED graph from a frame's valid map + candidate attributes.

    Parity: DirectDeformGraph.init_ED_nodes grid_mesh branch
    (super/graph_encoder.py:128-167) -- node attributes gathered at anchor
    pixels, edge rest lengths, per-node radius = mean incident edge length
    (NaN -> mean of the rest), triangle rest areas, optional hard-seg
    boundary-edge removal.
    """
    cap = cfg.capacity
    anchor_pix, edges_np, tris_np = grid_layout(cfg.height, cfg.width,
                                                cfg.mesh_step_size)
    g = len(anchor_pix)
    if g > cap.node_capacity:
        raise ValueError(
            f"grid has {g} anchors > node_capacity {cap.node_capacity}; "
            f"raise capacity or mesh_step_size")
    if len(edges_np) > cap.edge_capacity or len(tris_np) > cap.triangle_capacity:
        raise ValueError("edge/triangle capacity too small for this grid")

    pix = jnp.asarray(anchor_pix)
    active = frame.valid[pix]
    points = frame.points[:, pix].T      # (G, 3) -- graph stays row-major
    norms = frame.norms[:, pix].T
    seg_conf = frame.seg_conf[:, pix].T  # (G, C)
    seg = jnp.argmax(seg_conf, axis=1).astype(jnp.int32) if cfg.method == "semantic-super" \
        else frame.seg[pix]

    e = jnp.asarray(edges_np)
    edge_active = active[e[:, 0]] & active[e[:, 1]]
    t = jnp.asarray(tris_np)
    tri_active = active[t[:, 0]] & active[t[:, 1]] & active[t[:, 2]]

    # Hard-seg: remove class-crossing edges/triangles (graph_encoder.py:141-150).
    if cfg.hard_seg and cfg.losses.mesh_face:
        edge_active = edge_active & (seg[e[:, 0]] == seg[e[:, 1]])
        tri_active = tri_active & (seg[t[:, 0]] == seg[t[:, 1]]) \
            & (seg[t[:, 0]] == seg[t[:, 2]])

    dtype = points.dtype
    edge_lens = jnp.linalg.norm(points[e[:, 0]] - points[e[:, 1]], axis=1)
    edge_lens = jnp.where(edge_active, edge_lens, 0.0).astype(dtype)

    # Per-node radius: mean incident *active* edge length.
    len_sum = jnp.zeros((g,), dtype).at[e[:, 0]].add(edge_lens) \
        .at[e[:, 1]].add(edge_lens)
    cnt = jnp.zeros((g,), dtype).at[e[:, 0]].add(edge_active.astype(dtype)) \
        .at[e[:, 1]].add(edge_active.astype(dtype))
    radii = len_sum / jnp.maximum(cnt, 1.0)
    has_r = (cnt > 0) & active
    mean_r = jnp.sum(jnp.where(has_r, radii, 0.0)) / jnp.maximum(
        jnp.sum(has_r.astype(dtype)), 1.0)
    radii = jnp.where(has_r, radii, mean_r)

    cross = jnp.cross(points[t[:, 1]] - points[t[:, 0]],
                      points[t[:, 2]] - points[t[:, 0]])
    tri_areas = 0.5 * jnp.sqrt(jnp.sum(cross * cross, axis=1) + 1e-13)
    tri_areas = jnp.where(tri_active, tri_areas, 0.0)

    def pad_to(x, n):
        padding = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, padding)

    jcap = cap.node_capacity
    return GraphState(
        points=pad_to(points, jcap),
        norms=pad_to(norms, jcap),
        radii=pad_to(radii, jcap),
        active=pad_to(active, jcap),
        knn_idx=jnp.zeros((jcap, cfg.num_ed_neighbors), dtype=jnp.int32),
        knn_w=jnp.zeros((jcap, cfg.num_ed_neighbors), dtype=dtype),
        edges=pad_to(e, cap.edge_capacity),
        edge_active=pad_to(edge_active, cap.edge_capacity),
        edge_lens=pad_to(edge_lens, cap.edge_capacity),
        triangles=pad_to(t, cap.triangle_capacity),
        tri_active=pad_to(tri_active, cap.triangle_capacity),
        tri_areas=pad_to(tri_areas, cap.triangle_capacity),
        seg=pad_to(seg, jcap),
        seg_conf=pad_to(seg_conf, jcap),
    )
