"""Bilinear sampling of sparse per-surfel features through an index map.

The reference samples target-frame surfel attributes (points / normals /
seg-confidences) at float projection coordinates by looking up an
``index_map`` (pixel -> surfel id, -1 invalid) at the 4 surrounding integer
corners and bilinearly blending the gathered features, propagating NaN for
any invalid corner (super/loss.py:106-157 ``bilinear_intrpl_block`` and
:9-100 ``bilinear_sample``).

This masked re-implementation returns an explicit validity mask instead of
NaNs (mask-carried arithmetic is the TPU-native equivalent of the NaN
plumbing; the valid sets are identical), plus the analytic gradient of the
sampled value w.r.t. the sampling coordinates (Spatial Transformer eq. 6-7)
needed by the derived-gradient LM path.

Corner scheme: (floor, floor+1) rather than the reference's (floor, ceil) --
identical for non-integer coordinates, but correct at exact integers where
floor == ceil makes the reference double-count corners (its f64 ``+1e-8``
projection guard hides this; in f32 the guard underflows).

Feature storage is feature-major (F, M); gathers are channel-wise rank-1
(padding-free).  Queries are chunk-sized, so row-major (N, F) outputs are
cheap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _corners(v, u, h, w):
    fl_v, cl_v = jnp.floor(v), jnp.floor(v) + 1.0
    fl_u, cl_u = jnp.floor(u), jnp.floor(u) + 1.0
    n_blk = jnp.stack([fl_v, fl_v, cl_v, cl_v], axis=1)  # (N, 4) rows
    m_blk = jnp.stack([fl_u, cl_u, fl_u, cl_u], axis=1)  # (N, 4) cols
    ni = n_blk.astype(jnp.int32)
    mi = m_blk.astype(jnp.int32)
    in_bounds = (ni >= 0) & (ni < h) & (mi >= 0) & (mi < w)
    return n_blk, m_blk, jnp.clip(ni, 0, h - 1), jnp.clip(mi, 0, w - 1), in_bounds


def bilinear_sample_indexed(features_fm, index_map, v, u, *,
                            compute_grad=False):
    """Sample features through ``index_map`` at float coords (v, u).

    Args:
      features_fm: (F, M) per-surfel feature rows, feature-major.
      index_map: (H, W) int32; >=0 is a column of ``features_fm``, -1 invalid.
      v, u: (N,) float row / col coordinates (chunk-sized).
    Returns:
      values: (N, F) blended features (zeros where invalid).
      valid:  (N,) bool -- all four corners valid and in-bounds.
      grad:   (N, F, 2) with [..., 0] = d/du and [..., 1] = d/dv, or None.
        (The reference stacks [d/du, d/dv] in this order too, despite its
        comment -- see the dPi chain in super/loss.py:257-259.)
    """
    h, w = index_map.shape
    f = features_fm.shape[0]
    m = features_fm.shape[1]
    n_blk, m_blk, ni, mi, in_bounds = _corners(v, u, h, w)
    sf_idx = index_map[ni, mi]  # (N, 4)
    corner_valid = (sf_idx >= 0) & in_bounds
    safe_idx = jnp.clip(sf_idx, 0, m - 1)

    gathered = jnp.moveaxis(jnp.take(features_fm, safe_idx, axis=-1),
                            0, -1)  # (N, 4, F): one minor-axis gather
    gathered = jnp.where(corner_valid[..., None], gathered, 0.0)

    dn = n_blk - v[:, None]
    dm = m_blk - u[:, None]
    wn = jnp.maximum(1.0 - jnp.abs(dn), 0.0)  # (N, 4)
    wm = jnp.maximum(1.0 - jnp.abs(dm), 0.0)

    values = jnp.sum(gathered * (wn * wm)[..., None], axis=1)  # (N, F)
    valid = jnp.all(corner_valid, axis=1)

    if not compute_grad:
        return values, valid, None

    # d(1 - |x|)/dx = -sign(x); the reference uses where(x >= 0, 1, -1),
    # i.e. sign(+0) = +1 -- keep that convention exactly.
    sgn_n = jnp.where(dn >= 0, 1.0, -1.0)
    sgn_m = jnp.where(dm >= 0, 1.0, -1.0)
    d_du = jnp.sum(gathered * (wn * sgn_m)[..., None], axis=1)
    d_dv = jnp.sum(gathered * (wm * sgn_n)[..., None], axis=1)
    grad = jnp.stack([d_du, d_dv], axis=2)  # (N, F, 2)
    return values, valid, grad


def bilinear_sample_two(features_a, features_b, index_map, v, u, *,
                        compute_grad=False):
    """Sample two feature banks through one shared index-map lookup.

    Same semantics as two :func:`bilinear_sample_indexed` calls (the hot
    point/normal pair of the data term, loss.py:237-240) but the corner
    index gather, validity and weights are computed once.
    Returns (values_a, values_b, valid, grad_a, grad_b).
    """
    h, w = index_map.shape
    m = features_a.shape[1]
    n_blk, m_blk, ni, mi, in_bounds = _corners(v, u, h, w)
    sf_idx = index_map[ni, mi]
    corner_valid = (sf_idx >= 0) & in_bounds
    safe_idx = jnp.clip(sf_idx, 0, m - 1)

    def gath(feats):
        g = jnp.moveaxis(jnp.take(feats, safe_idx, axis=-1), 0, -1)
        return jnp.where(corner_valid[..., None], g, 0.0)

    ga, gb = gath(features_a), gath(features_b)
    dn = n_blk - v[:, None]
    dm = m_blk - u[:, None]
    wn = jnp.maximum(1.0 - jnp.abs(dn), 0.0)
    wm = jnp.maximum(1.0 - jnp.abs(dm), 0.0)
    wc = (wn * wm)[..., None]
    va = jnp.sum(ga * wc, axis=1)
    vb = jnp.sum(gb * wc, axis=1)
    valid = jnp.all(corner_valid, axis=1)
    if not compute_grad:
        return va, vb, valid, None, None
    sgn_n = jnp.where(dn >= 0, 1.0, -1.0)
    sgn_m = jnp.where(dm >= 0, 1.0, -1.0)
    wu = (wn * sgn_m)[..., None]
    wv = (wm * sgn_n)[..., None]
    grad_a = jnp.stack([jnp.sum(ga * wu, axis=1), jnp.sum(ga * wv, axis=1)],
                       axis=2)
    grad_b = jnp.stack([jnp.sum(gb * wu, axis=1), jnp.sum(gb * wv, axis=1)],
                       axis=2)
    return va, vb, valid, grad_a, grad_b


def build_corner_bank(points_fm, norms_fm, index_map):
    """Precompute the 4-corner [valid, point, norm] block of every pixel.

    The hot data-term sampler (`_project_and_sample`) gathers 4 corners x
    (index_map + two 3-row banks) per query = 12 gather indices per surfel.
    Gathers on TPU cost per *index* (~2-7 ns), so at ~400k surfels per LM
    pass that is ~20-25 ms.  This bank packs, per PIXEL p = (y, x), the
    [valid, point(3), norm(3)] rows of its four bilinear corners
    (y,x), (y,x+1), (y+1,x), (y+1,x+1) -- built once per frame with shifts
    (no gathers) -- so a sample is ONE 28-row minor-axis gather at 1 index
    per query (12x fewer indices).  Features are pre-zeroed where invalid
    (the sampler's per-corner masking is then just the valid row).

    Returns (28, H*W) float32: 4 corners x [valid, px, py, pz, nx, ny, nz].
    """
    h, w = index_map.shape
    valid = (index_map >= 0)
    vrow = valid.astype(points_fm.dtype)[None]            # (1, h, w)
    pts = jnp.where(valid[None], points_fm.reshape(3, h, w), 0.0)
    nms = jnp.where(valid[None], norms_fm.reshape(3, h, w), 0.0)
    base = jnp.concatenate([vrow, pts, nms], axis=0)      # (7, h, w)
    zc = jnp.zeros((7, h, 1), base.dtype)
    zr = jnp.zeros((7, 1, w), base.dtype)
    right = jnp.concatenate([base[:, :, 1:], zc], axis=2)       # (y, x+1)
    down = jnp.concatenate([base[:, 1:, :], zr], axis=1)        # (y+1, x)
    downright = jnp.concatenate([down[:, :, 1:], zc], axis=2)   # (y+1, x+1)
    return jnp.concatenate([base, right, down, downright],
                           axis=0).reshape(28, h * w)


def bilinear_sample_bank(bank, h: int, w: int, v, u, *, compute_grad=False):
    """Sample a :func:`build_corner_bank` bank at float coords (v, u).

    Validity-identical to :func:`bilinear_sample_two` on the same
    (points, norms, index_map) triple, and value/gradient-identical at every
    VALID query, at 1 gather index per query instead of 12 (see
    build_corner_bank).  At invalid queries (out-of-bounds / invalid-corner
    -- always masked by callers) the partial sums may differ from the
    indexed sampler's: a clamped out-of-range base index reads a shifted
    neighbor column.
    Returns (values_a, values_b, valid, grad_a, grad_b).
    """
    fl_v = jnp.floor(v)
    fl_u = jnp.floor(u)
    vi = fl_v.astype(jnp.int32)
    ui = fl_u.astype(jnp.int32)
    flat = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)

    g = jnp.moveaxis(jnp.take(bank, flat, axis=-1), 0, -1)  # (N, 28)
    g = g.reshape(g.shape[0], 4, 7)
    # Per-corner in-bounds (the shifted bank rows already carry valid=0 for
    # corners shifted in from outside, but a clamped base index can land on
    # a REAL pixel when fl is out of range -- mask those corners off).
    v0 = (vi >= 0) & (vi < h)
    v1 = (vi + 1 >= 0) & (vi + 1 < h)
    u0 = (ui >= 0) & (ui < w)
    u1 = (ui + 1 >= 0) & (ui + 1 < w)
    in_b = jnp.stack([v0 & u0, v0 & u1, v1 & u0, v1 & u1], axis=1)  # (N, 4)
    corner_valid = in_b & (g[:, :, 0] > 0.5)
    g = jnp.where(corner_valid[..., None], g, 0.0)
    ga = g[:, :, 1:4]
    gb = g[:, :, 4:7]

    n_blk = jnp.stack([fl_v, fl_v, fl_v + 1.0, fl_v + 1.0], axis=1)
    m_blk = jnp.stack([fl_u, fl_u + 1.0, fl_u, fl_u + 1.0], axis=1)
    dn = n_blk - v[:, None]
    dm = m_blk - u[:, None]
    wn = jnp.maximum(1.0 - jnp.abs(dn), 0.0)
    wm = jnp.maximum(1.0 - jnp.abs(dm), 0.0)
    wc = (wn * wm)[..., None]
    va = jnp.sum(ga * wc, axis=1)
    vb = jnp.sum(gb * wc, axis=1)
    valid = jnp.all(corner_valid, axis=1)
    if not compute_grad:
        return va, vb, valid, None, None
    sgn_n = jnp.where(dn >= 0, 1.0, -1.0)
    sgn_m = jnp.where(dm >= 0, 1.0, -1.0)
    wu = (wn * sgn_m)[..., None]
    wv = (wm * sgn_n)[..., None]
    grad_a = jnp.stack([jnp.sum(ga * wu, axis=1), jnp.sum(ga * wv, axis=1)],
                       axis=2)
    grad_b = jnp.stack([jnp.sum(gb * wu, axis=1), jnp.sum(gb * wv, axis=1)],
                       axis=2)
    return va, vb, valid, grad_a, grad_b


def bilinear_sample_bank_fm(bank, h: int, w: int, v, u, *,
                            compute_grad=False):
    """Feature-major corner-bank sampling: values returned as (3, N).

    Same values/validity as :func:`bilinear_sample_bank` at every VALID
    query (invalid queries are don't-cares, masked by all callers), but the
    gathered block stays (28, N) -- no row-major (N, 4, 7) intermediate
    whose (4, 7) trailing dims pad to (8, 128) TPU tiles.
    Returns (values_a (3, N), values_b (3, N), valid (N,)) and, with
    ``compute_grad``, additionally (da_du, da_dv, db_du, db_dv), each
    (3, N) -- the same STN gradients as bilinear_sample_bank, transposed.
    """
    fl_v = jnp.floor(v)
    fl_u = jnp.floor(u)
    vi = fl_v.astype(jnp.int32)
    ui = fl_u.astype(jnp.int32)
    flat = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    g = jnp.take(bank, flat, axis=-1)                   # (28, N)

    dn = (fl_v - v, fl_v + 1.0 - v)   # (-1, 0], (0, 1]
    dm = (fl_u - u, fl_u + 1.0 - u)
    wn = tuple(jnp.maximum(1.0 - jnp.abs(x), 0.0) for x in dn)
    wm = tuple(jnp.maximum(1.0 - jnp.abs(x), 0.0) for x in dm)
    # Corner order (n, m): (0,0), (0,1), (1,0), (1,1).
    nm = ((0, 0), (0, 1), (1, 0), (1, 1))

    va = 0.0
    vb = 0.0
    ok = (vi >= 0) & (vi + 1 < h) & (ui >= 0) & (ui + 1 < w)
    if compute_grad:
        # sign(+0) = +1, the reference's convention (see
        # bilinear_sample_indexed).
        sn = tuple(jnp.where(x >= 0, 1.0, -1.0) for x in dn)
        sm = tuple(jnp.where(x >= 0, 1.0, -1.0) for x in dm)
        ga_u = 0.0
        ga_v = 0.0
        gb_u = 0.0
        gb_v = 0.0
    for j, (jn, jm) in enumerate(nm):
        blk = g[7 * j:7 * j + 7]
        ok = ok & (blk[0] > 0.5)
        wc = (wn[jn] * wm[jm])[None]
        va = va + wc * blk[1:4]
        vb = vb + wc * blk[4:7]
        if compute_grad:
            wu = (wn[jn] * sm[jm])[None]
            wv = (wm[jm] * sn[jn])[None]
            ga_u = ga_u + wu * blk[1:4]
            ga_v = ga_v + wv * blk[1:4]
            gb_u = gb_u + wu * blk[4:7]
            gb_v = gb_v + wv * blk[4:7]
    if not compute_grad:
        return va, vb, ok
    return va, vb, ok, ga_u, ga_v, gb_u, gb_v


def build_corner_bank_z(points_fm, norms_fm, index_map):
    """Depth-only corner bank: per pixel, [z, nx, ny, nz] of its 4 bilinear
    corners -- (16, H*W) instead of :func:`build_corner_bank`'s (28, H*W).

    Target points are backprojections of KNOWN pixel centers
    (geometry/camera.py:backproject_depth: x = (u - cx) z / fx), so the
    sampler reconstructs x/y from the corner's pixel coordinate and the
    gathered z -- bit-exactly, same ops in the same order -- and the hot
    gather moves 16 rows instead of 28 (gather cost scales with bytes per
    index past the fixed cost; CLAUDE.md cost model).  Corner validity is
    folded into the normal rows: normals are unit where valid and zeroed
    where not, so ``|n|^2 > 0.5`` replaces the explicit valid row.
    """
    h, w = index_map.shape
    valid = (index_map >= 0)
    zrow = jnp.where(valid, points_fm.reshape(3, h, w)[2], 0.0)[None]
    nms = jnp.where(valid[None], norms_fm.reshape(3, h, w), 0.0)
    base = jnp.concatenate([zrow, nms], axis=0)           # (4, h, w)
    zc = jnp.zeros((4, h, 1), base.dtype)
    zr = jnp.zeros((4, 1, w), base.dtype)
    right = jnp.concatenate([base[:, :, 1:], zc], axis=2)       # (y, x+1)
    down = jnp.concatenate([base[:, 1:, :], zr], axis=1)        # (y+1, x)
    downright = jnp.concatenate([down[:, :, 1:], zc], axis=2)   # (y+1, x+1)
    return jnp.concatenate([base, right, down, downright],
                           axis=0).reshape(16, h * w)


def _zbank_corners(bank, intr, h, w, v, u):
    """Shared z-bank gather + per-corner reconstruction.

    Yields ((jn, jm), o (3, N), n (3, N), corner_ok (N,)) per corner, plus
    the floor coords; o is reconstructed x = (u_c - cx) z / fx etc. --
    bit-identical to the stored point rows of build_corner_bank at every
    in-range corner (same formula, same op order, f32).
    """
    fl_v = jnp.floor(v)
    fl_u = jnp.floor(u)
    vi = fl_v.astype(jnp.int32)
    ui = fl_u.astype(jnp.int32)
    flat = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    g = jnp.take(bank, flat, axis=-1)                   # (16, N)
    # The gather feeds many consumers (values + 4 STN gradient banks); an
    # explicit barrier stops XLA from DUPLICATING it into per-consumer
    # fusions (gathers cost ~ms each at this index count -- rematerializing
    # one is never worth it).
    g = jax.lax.optimization_barrier(g)

    corners = []
    for j, (jn, jm) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        blk = g[4 * j:4 * j + 4]
        z = blk[0]
        n = blk[1:4]
        # Unit normal where valid, zeroed where not (build_corner_bank_z).
        c_ok = jnp.sum(n * n, axis=0) > 0.5
        x = (fl_u + jm - intr.cx) * z / intr.fx
        y = (fl_v + jn - intr.cy) * z / intr.fy
        corners.append(((jn, jm), jnp.stack([x, y, z]), n, c_ok))
    return corners, fl_v, fl_u, vi, ui


def bilinear_sample_bank_z_fm(bank, intr, h: int, w: int, v, u, *,
                              compute_grad=False):
    """Feature-major sampling of a :func:`build_corner_bank_z` bank.

    Return-identical to :func:`bilinear_sample_bank_fm` on the matching
    (28, P) bank at every VALID query (invalid queries are don't-cares,
    masked by all callers): the x/y reconstruction is bit-exact and the
    validity test is equivalent (valid <=> stored unit normal)."""
    corners, fl_v, fl_u, vi, ui = _zbank_corners(bank, intr, h, w, v, u)

    dn = (fl_v - v, fl_v + 1.0 - v)
    dm = (fl_u - u, fl_u + 1.0 - u)
    wn = tuple(jnp.maximum(1.0 - jnp.abs(x), 0.0) for x in dn)
    wm = tuple(jnp.maximum(1.0 - jnp.abs(x), 0.0) for x in dm)

    va = 0.0
    vb = 0.0
    ok = (vi >= 0) & (vi + 1 < h) & (ui >= 0) & (ui + 1 < w)
    if compute_grad:
        sn = tuple(jnp.where(x >= 0, 1.0, -1.0) for x in dn)
        sm = tuple(jnp.where(x >= 0, 1.0, -1.0) for x in dm)
        ga_u = ga_v = gb_u = gb_v = 0.0
    for (jn, jm), o, n, c_ok in corners:
        ok = ok & c_ok
        wc = (wn[jn] * wm[jm])[None]
        va = va + wc * o
        vb = vb + wc * n
        if compute_grad:
            wu = (wn[jn] * sm[jm])[None]
            wv = (wm[jm] * sn[jn])[None]
            ga_u = ga_u + wu * o
            ga_v = ga_v + wv * o
            gb_u = gb_u + wu * n
            gb_v = gb_v + wv * n
    if not compute_grad:
        return va, vb, ok
    return va, vb, ok, ga_u, ga_v, gb_u, gb_v


def bilinear_sample_bank_z(bank, intr, h: int, w: int, v, u, *,
                           compute_grad=False):
    """Row-major sampling of a :func:`build_corner_bank_z` bank; returns
    ((N, 3) points, (N, 3) norms, valid, grad_a (N, 3, 2), grad_b) like
    :func:`bilinear_sample_bank` -- same values at every VALID query."""
    out = bilinear_sample_bank_z_fm(bank, intr, h, w, v, u,
                                    compute_grad=compute_grad)
    va, vb, ok = out[0].T, out[1].T, out[2]
    if not compute_grad:
        return va, vb, ok, None, None
    ga_u, ga_v, gb_u, gb_v = out[3:]
    grad_a = jnp.stack([ga_u.T, ga_v.T], axis=2)   # (N, 3, 2)
    grad_b = jnp.stack([gb_u.T, gb_v.T], axis=2)
    return va, vb, ok, grad_a, grad_b


def build_corner_bank_zx(points_fm, norms_fm, extra_fm, index_map):
    """Extended z-bank: per pixel, [z, nx, ny, nz, extra(E)] of its 4
    bilinear corners -- ((4+E)*4, H*W).

    Same design as :func:`build_corner_bank_z` with E extra feature rows
    (e.g. per-class seg confidences) riding the SAME gather; extras are
    zeroed where invalid, exactly like `bilinear_sample_indexed`'s
    corner masking on an index-map sample.
    """
    h, w = index_map.shape
    e = extra_fm.shape[0]
    valid = (index_map >= 0)
    zrow = jnp.where(valid, points_fm.reshape(3, h, w)[2], 0.0)[None]
    nms = jnp.where(valid[None], norms_fm.reshape(3, h, w), 0.0)
    ext = jnp.where(valid[None], extra_fm.reshape(e, h, w), 0.0)
    base = jnp.concatenate([zrow, nms, ext], axis=0)      # (4+E, h, w)
    f = 4 + e
    zc = jnp.zeros((f, h, 1), base.dtype)
    zr = jnp.zeros((f, 1, w), base.dtype)
    right = jnp.concatenate([base[:, :, 1:], zc], axis=2)
    down = jnp.concatenate([base[:, 1:, :], zr], axis=1)
    downright = jnp.concatenate([down[:, :, 1:], zc], axis=2)
    return jnp.concatenate([base, right, down, downright],
                           axis=0).reshape(4 * f, h * w)


def bilinear_sample_bank_zx_fm(bank, n_extra: int, intr, h: int, w: int,
                               v, u):
    """Sample a :func:`build_corner_bank_zx` bank (values only).

    Returns (o (3, N), n (3, N), extra (E, N), ok (N,)); o/n/ok are
    identical to :func:`bilinear_sample_bank_z_fm` and extra matches
    `bilinear_sample_indexed` on the same features at valid queries.
    """
    f = 4 + n_extra
    fl_v = jnp.floor(v)
    fl_u = jnp.floor(u)
    vi = fl_v.astype(jnp.int32)
    ui = fl_u.astype(jnp.int32)
    flat = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    g = jnp.take(bank, flat, axis=-1)                   # (4F, N)
    g = jax.lax.optimization_barrier(g)

    dn = (fl_v - v, fl_v + 1.0 - v)
    dm = (fl_u - u, fl_u + 1.0 - u)
    wn = tuple(jnp.maximum(1.0 - jnp.abs(x), 0.0) for x in dn)
    wm = tuple(jnp.maximum(1.0 - jnp.abs(x), 0.0) for x in dm)

    va = 0.0
    vb = 0.0
    ve = 0.0
    ok = (vi >= 0) & (vi + 1 < h) & (ui >= 0) & (ui + 1 < w)
    for j, (jn, jm) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        blk = g[f * j:f * j + f]
        z = blk[0]
        n = blk[1:4]
        ok = ok & (jnp.sum(n * n, axis=0) > 0.5)
        x = (fl_u + jm - intr.cx) * z / intr.fx
        y = (fl_v + jn - intr.cy) * z / intr.fy
        wc = (wn[jn] * wm[jm])[None]
        va = va + wc * jnp.stack([x, y, z])
        vb = vb + wc * n
        ve = ve + wc * blk[4:]
    return va, vb, ve, ok


def bilinear_sample_image(image_fm, v, u):
    """Plain bilinear sampling of a dense (F, H, W) image at float (v, u).

    Out-of-bounds corners are clamped; returns ((N, F) values, in-bounds
    mask)."""
    f, h, w = image_fm.shape
    n_blk, m_blk, ni, mi, _ = _corners(v, u, h, w)
    flat = ni * w + mi
    gathered = jnp.moveaxis(
        jnp.take(image_fm.reshape(f, h * w), flat, axis=-1), 0, -1)
    wn = jnp.maximum(1.0 - jnp.abs(n_blk - v[:, None]), 0.0)
    wm = jnp.maximum(1.0 - jnp.abs(m_blk - u[:, None]), 0.0)
    values = jnp.sum(gathered * (wn * wm)[..., None], axis=1)
    in_bounds = (v >= 0) & (v <= h - 1) & (u >= 0) & (u <= w - 1)
    return values, in_bounds


def build_corner_bank_image(image_fm):
    """(F, H, W) dense image -> (4F, H*W) corner bank: row block c*F..c*F+F
    holds the image shifted so column (n*W + m) carries corner c of the
    bilinear stencil anchored at (n, m) -- edge-replicated, which equals
    the clamped-corner convention of ``bilinear_sample_image`` for every
    query whose floor cell is in frame.

    Build cost: one streamed pass over 4F x P (XLA fuses the shifts); the
    payoff is sampling at ONE gather index per query
    (``bilinear_sample_bank_image``) instead of the (N, 4)-minor-axis
    gather of ``bilinear_sample_image``, whose (F, N, 4) result pads its
    trailing dim 4 -> 128 on TPU (32x memory) -- measured as the dominant
    cost of the bn_morph term (grad 43 ms/iteration at 480p).
    """
    f, h, w = image_fm.shape
    right = jnp.concatenate([image_fm[:, :, 1:], image_fm[:, :, -1:]],
                            axis=2)
    down = jnp.concatenate([image_fm[:, 1:], image_fm[:, -1:]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.concatenate([
        image_fm.reshape(f, h * w), right.reshape(f, h * w),
        down.reshape(f, h * w), down_right.reshape(f, h * w)], axis=0)


def bilinear_sample_bank_image(bank, f, h, w, v, u, *, stop_grad_rows=None):
    """Bilinear sampling from a ``build_corner_bank_image`` bank.

    Returns ((F, N) values feature-major, (N,) in-bounds mask).  Exact vs
    ``bilinear_sample_image`` whenever floor(v) in [0, h-1] and floor(u)
    in [0, w-1] (all four clamped corners coincide with the bank's
    edge-replicated stencil); farther out-of-bounds queries deviate and
    must be masked by the caller (``in_bounds`` is False there anyway).

    ``stop_grad_rows``: optional (start, end) half-open row range whose
    values are combined with STOP-GRADIENT bilinear weights (e.g. a
    class-confidence gate sampled alongside a differentiable field from
    the same gather).
    """
    n0 = jnp.floor(v)
    m0 = jnp.floor(u)
    ni = jnp.clip(n0.astype(jnp.int32), 0, h - 1)
    mi = jnp.clip(m0.astype(jnp.int32), 0, w - 1)
    g = jnp.take(bank, ni * w + mi, axis=-1)           # (4F, N)
    av = v - n0
    au = u - m0
    w00 = (1.0 - av) * (1.0 - au)
    w01 = (1.0 - av) * au
    w10 = av * (1.0 - au)
    w11 = av * au
    ws = (w00, w01, w10, w11)

    def combine(weights):
        return (weights[0] * g[0:f] + weights[1] * g[f:2 * f]
                + weights[2] * g[2 * f:3 * f] + weights[3] * g[3 * f:4 * f])

    vals = combine(ws)
    if stop_grad_rows is not None:
        s, e = stop_grad_rows
        sg = tuple(jax.lax.stop_gradient(x) for x in ws)
        vals_sg = combine(sg)
        vals = jnp.concatenate([vals[:s], vals_sg[s:e], vals[e:]], axis=0) \
            if (s > 0 or e < f) else vals_sg
    in_bounds = (v >= 0) & (v <= h - 1) & (u >= 0) & (u <= w - 1)
    return vals, in_bounds
