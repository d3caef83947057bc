"""Geometry-core unit tests: analytic Jacobians vs autodiff, round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_tpu.geometry import (
    blend_warp,
    blend_warp_jac,
    matrix_to_quat,
    merge_transformation,
    quat_rotate,
    quat_to_matrix,
    skew,
    transform_quat_t,
    transform_quat_t_jac,
)


def random_quat(rng, n, unit=False):
    q = rng.normal(size=(n, 4))
    if unit:
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def test_skew_cross_identity(rng):
    v = jnp.asarray(rng.normal(size=(5, 3)))
    u = jnp.asarray(rng.normal(size=(5, 3)))
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", skew(v), u), jnp.cross(v, u), atol=1e-12
    )


def test_quat_rotate_matches_matrix_for_unit_quats(rng):
    q = random_quat(rng, 8, unit=True)
    v = jnp.asarray(rng.normal(size=(8, 3)))
    rv = quat_rotate(q, v)
    rm = jnp.einsum("nij,nj->ni", quat_to_matrix(q), v)
    np.testing.assert_allclose(rv, rm, atol=1e-12)


def test_transform_quat_t_jacobian_vs_autodiff(rng):
    """The hand-derived d(T(q,b)v)/dq must match jax.jacfwd (f64).

    This is the Jacobian driving the LM normal equations
    (reference super/utils.py:59-69)."""
    n = 16
    # Near-identity quats as in the LM init, plus fully random ones.
    beta_id = jnp.concatenate(
        [
            jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n // 2, 1))
            + 0.1 * jnp.asarray(rng.normal(size=(n // 2, 4))),
            random_quat(rng, n // 2),
        ]
    )
    beta = jnp.concatenate([beta_id, jnp.asarray(rng.normal(size=(n, 3)))], axis=-1)
    v = jnp.asarray(rng.normal(size=(n, 3)))

    _, jac = transform_quat_t_jac(v, beta)

    def f(q, vv, b):
        return quat_rotate(q, vv) + b

    jac_ad = jax.vmap(jax.jacfwd(f))(beta[:, 0:4], v, beta[:, 4:7])
    np.testing.assert_allclose(jac, jac_ad, atol=1e-10)


def test_blend_warp_jacobian_vs_autodiff(rng):
    n, k = 6, 4
    pts = jnp.asarray(rng.normal(size=(n, 3)))
    anchors = jnp.asarray(rng.normal(size=(n, k, 3)))
    d = pts[:, None, :] - anchors
    beta = jnp.concatenate(
        [random_quat(rng, n * k).reshape(n, k, 4), jnp.asarray(rng.normal(size=(n, k, 3)))],
        axis=-1,
    )
    w = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, k))), axis=-1)

    warped, jac = blend_warp_jac(d, anchors, beta, w)
    np.testing.assert_allclose(warped, blend_warp(d, anchors, beta, w), atol=1e-12)

    def f(q):
        b = jnp.concatenate([q, beta[..., 4:7]], axis=-1)
        return blend_warp(d, anchors, b, w)

    # jacfwd gives (N, 3, N, K, 4); diagonal over the first/third axes.
    jac_full = jax.jacfwd(f)(beta[..., 0:4])
    jac_ad = jnp.stack([jac_full[i, :, i] for i in range(n)])  # (N, K, 3, 4) transposed
    jac_ad = jnp.transpose(jac_ad, (0, 2, 1, 3))
    np.testing.assert_allclose(jac, jac_ad, atol=1e-10)


def test_quat_matrix_roundtrip(rng):
    q = random_quat(rng, 64, unit=True)
    q = q * jnp.where(q[:, 0:1] < 0, -1.0, 1.0)  # canonical sign
    q2 = matrix_to_quat(quat_to_matrix(q))
    np.testing.assert_allclose(q, q2, atol=1e-9)


def test_merge_transformation_composes(rng):
    n = 10
    dq1 = jnp.concatenate([random_quat(rng, n, unit=True), jnp.asarray(rng.normal(size=(n, 3)))], -1)
    dq2 = jnp.concatenate([random_quat(rng, n, unit=True), jnp.asarray(rng.normal(size=(n, 3)))], -1)
    v = jnp.asarray(rng.normal(size=(n, 3)))
    merged = merge_transformation(dq1, dq2)
    out_seq = transform_quat_t(transform_quat_t(v, dq1), dq2)
    out_merged = transform_quat_t(v, merged)
    np.testing.assert_allclose(out_seq, out_merged, atol=1e-9)


def test_transform_accepts_rotation_only(rng):
    q = random_quat(rng, 4)
    v = jnp.asarray(rng.normal(size=(4, 3)))
    np.testing.assert_allclose(transform_quat_t(v, q), quat_rotate(q, v), atol=1e-12)
