"""Quaternion warp-field math (pure jnp, dtype-polymorphic).

Implements the SuPer embedded-deformation warp, eq. (10)/(11) of the SuPer
paper: each ED node carries a 7-vector ``[qw, qx, qy, qz, tx, ty, tz]`` and a
surfel is warped by the confidence-weighted blend of its K anchor nodes'
rigid transforms.

Behavioral parity with reference super/utils.py:4-71 (``get_skew``,
``Trans_points``, ``transformQuatT``) -- including the *non-unit* quaternion
rotation formula ``R(q)v = v + 2 qw (qv x v) + 2 qv x (qv x v)`` and the
analytic Jacobian d(R(q)v)/dq used by the derived-gradient LM path.

TPU notes: everything here is elementwise/VPU work over (N, K) blocks; it is
fused by XLA into the surrounding residual kernels.  No data-dependent
control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

# Identity dual "quaternion + translation" parameter [1,0,0,0, 0,0,0].
IDENTITY_DQ = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def skew(v):
    """Standard skew-symmetric matrix ``[v]x`` with ``[v]x @ u == cross(v, u)``.

    (..., 3) -> (..., 3, 3).  Parity: super/utils.py:4-14 (note the reference
    builds columns via ``torch.stack(dim=3)``, yielding the standard [v]x).
    """
    a1, a2, a3 = v[..., 0], v[..., 1], v[..., 2]
    z = jnp.zeros_like(a1)
    return jnp.stack(
        [
            jnp.stack([z, -a3, a2], axis=-1),
            jnp.stack([a3, z, -a1], axis=-1),
            jnp.stack([-a2, a1, z], axis=-1),
        ],
        axis=-2,
    )


def quat_rotate(q, v):
    """Rotate ``v`` by (possibly non-unit) quaternion ``q``.

    q: (..., 4) as [qw, qx, qy, qz]; v: (..., 3).
    Uses the same expansion as the reference (super/utils.py:50-54):
    ``v + 2 qw (qv x v) + 2 qv x (qv x v)`` -- exactly R(q)v only when
    ``|q| == 1``; the Rot loss pulls ``|q|`` toward 1 rather than
    renormalizing, so we must keep the raw formula.
    """
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    c = jnp.cross(qv, v)
    return v + 2.0 * qw * c + 2.0 * jnp.cross(qv, c)


def transform_quat_t(v, beta):
    """Apply ``T(q, b) v = R(q) v + b``.

    beta: (..., 7) = [q; b], or (..., 4) = [q] for rotation only.
    Parity: super/utils.py:41-57.
    """
    tv = quat_rotate(beta[..., 0:4], v)
    if beta.shape[-1] == 7:
        tv = tv + beta[..., 4:7]
    return tv


def transform_quat_t_jac(v, beta, skew_v=None):
    """``T(q,b) v`` together with the analytic Jacobian d(tv)/dq, (..., 3, 4).

    Columns are [d/dqw, d/dqx, d/dqy, d/dqz]:
      d(tv)/dqw = 2 (qv x v)
      d(tv)/dqv = 2 [ (qv.v) I + qv v^T - 2 v qv^T - qw [v]x ]
    Parity: super/utils.py:59-69 (verified against jax.jacfwd in tests).
    """
    qw = beta[..., 0:1]
    qv = beta[..., 1:4]
    c = jnp.cross(qv, v)
    tv = v + 2.0 * qw * c + 2.0 * jnp.cross(qv, c)
    if beta.shape[-1] == 7:
        tv = tv + beta[..., 4:7]

    if skew_v is None:
        skew_v = skew(v)
    eye3 = jnp.eye(3, dtype=v.dtype)
    d_qw = 2.0 * c[..., :, None]  # (..., 3, 1)
    qv_dot_v = jnp.sum(qv * v, axis=-1)[..., None, None]  # (..., 1, 1)
    outer = qv[..., :, None] * v[..., None, :]  # qv v^T (..., 3, 3)
    d_qv = 2.0 * (
        qv_dot_v * eye3
        + outer
        - 2.0 * jnp.swapaxes(outer, -1, -2)
        - qw[..., :, None] * skew_v
    )
    return tv, jnp.concatenate([d_qw, d_qv], axis=-1)


def blend_warp(d_points, anchors, beta, w):
    """SuPer eq. (10): warp each surfel by its K anchor-node transforms.

    Args:
      d_points: (N, K, 3) displacements ``p - g_i`` from anchors.
      anchors:  (N, K, 3) anchor node positions ``g_i``.
      beta:     (N, K, 7) anchor transforms ``[q_i; b_i]`` (gathered).
      w:        (N, K) blend weights ``alpha_i``.
    Returns: (N, 3) warped points ``sum_i alpha_i [T(q_i,b_i)(p-g_i) + g_i]``.
    Parity: super/utils.py:17-38 (``Trans_points``, grad=False).
    """
    tv = transform_quat_t(d_points, beta) + anchors
    return jnp.sum(w[..., None] * tv, axis=-2)


def blend_warp_jac(d_points, anchors, beta, w, skew_v=None):
    """As :func:`blend_warp` but also returns the weighted per-anchor Jacobian
    d(warped)/dq_i of shape (N, K, 3, 4) (already scaled by ``alpha_i``).

    Parity: super/utils.py:17-38 (grad=True).
    """
    tv, jac = transform_quat_t_jac(d_points, beta, skew_v=skew_v)
    tv = tv + anchors
    warped = jnp.sum(w[..., None] * tv, axis=-2)
    return warped, w[..., None, None] * jac


def quat_to_matrix(q):
    """Unit quaternion (..., 4) [w,x,y,z] -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(m):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) [w,x,y,z].

    Branch-free (jnp.where over the four Shepperd cases) so it is jit/vmap
    safe on TPU.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # Case w: trace dominant.
    sw = safe_sqrt(1.0 + tr) * 2.0
    qw_w = 0.25 * sw
    qx_w = (m21 - m12) / sw
    qy_w = (m02 - m20) / sw
    qz_w = (m10 - m01) / sw
    # Case x.
    sx = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    qw_x = (m21 - m12) / sx
    qx_x = 0.25 * sx
    qy_x = (m01 + m10) / sx
    qz_x = (m02 + m20) / sx
    # Case y.
    sy = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    qw_y = (m02 - m20) / sy
    qx_y = (m01 + m10) / sy
    qy_y = 0.25 * sy
    qz_y = (m12 + m21) / sy
    # Case z.
    sz = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    qw_z = (m10 - m01) / sz
    qx_z = (m02 + m20) / sz
    qy_z = (m12 + m21) / sz
    qz_z = 0.25 * sz

    cond_w = tr > 0
    cond_x = (~cond_w) & (m00 >= m11) & (m00 >= m22)
    cond_y = (~cond_w) & (~cond_x) & (m11 >= m22)

    def pick(a, b, c, d):
        return jnp.where(cond_w, a, jnp.where(cond_x, b, jnp.where(cond_y, c, d)))

    q = jnp.stack(
        [
            pick(qw_w, qw_x, qw_y, qw_z),
            pick(qx_w, qx_x, qx_y, qx_z),
            pick(qy_w, qy_x, qy_y, qy_z),
            pick(qz_w, qz_x, qz_y, qz_z),
        ],
        axis=-1,
    )
    # Canonical sign: qw >= 0.
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def merge_transformation(dq1, dq2):
    """Compose two [q; t] transforms: apply dq1 first, then dq2.

    Parity: utils/utils.py:522-529 -- R = R2 R1, t = t2 + R2 t1.
    """
    r1 = quat_to_matrix(dq1[..., 0:4])
    r2 = quat_to_matrix(dq2[..., 0:4])
    r = r2 @ r1
    q = matrix_to_quat(r)
    t = dq2[..., 4:7] + jnp.einsum("...ij,...j->...i", r2, dq1[..., 4:7])
    return jnp.concatenate([q, t], axis=-1)
