"""Camera projection/backprojection tests."""

import jax.numpy as jnp
import numpy as np

from super_tpu.geometry import Intrinsics, backproject_depth, project_points
from super_tpu.geometry.divergence import jsd, kld


def test_backproject_project_roundtrip(rng):
    intr = Intrinsics.superv1()
    h, w = 48, 64
    depth = jnp.asarray(0.5 + rng.uniform(size=(h, w)))
    pts = backproject_depth(depth, intr)       # (3, H, W)
    v, u, coords, valid = project_points(pts.reshape(3, -1), intr, h, w)
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=depth.dtype),
                          jnp.arange(h, dtype=depth.dtype), indexing="xy")
    # The reference's `Z + 1e-8` projection guard (utils/utils.py:172) shifts
    # coordinates by ~(u - cx) * 1e-8 / Z, i.e. up to ~1e-5 px here.
    np.testing.assert_allclose(u, uu.reshape(-1), atol=1e-4)
    np.testing.assert_allclose(v, vv.reshape(-1), atol=1e-4)


def test_project_valid_margin():
    intr = Intrinsics(fx=jnp.array(10.0), fy=jnp.array(10.0),
                      cx=jnp.array(5.0), cy=jnp.array(5.0))
    h = w = 11
    # Point projecting exactly to (u, v) = (5, 5): center, valid.
    pts = jnp.array([[0.0, 0.0, 1.0],      # center -> (5, 5)
                     [0.5, 0.0, 1.0],      # -> (10, 5): u == w-1 -> invalid (u < w-1-margin)
                     [-0.5, 0.0, 1.0],     # -> (0, 5): valid at margin 0, invalid margin 1
                     ]).T                   # feature-major (3, N)
    _, _, coords, valid0 = project_points(pts, intr, h, w, valid_margin=0)
    assert bool(valid0[0]) and not bool(valid0[1]) and bool(valid0[2])
    _, _, _, valid1 = project_points(pts, intr, h, w, valid_margin=1)
    assert bool(valid1[0]) and not bool(valid1[2])
    np.testing.assert_array_equal(coords, jnp.array([5 * 11 + 5, 5 * 11 + 10, 5 * 11 + 0]))


def test_jsd_properties(rng):
    p = jnp.asarray(rng.dirichlet(np.ones(3), size=16))
    q = jnp.asarray(rng.dirichlet(np.ones(3), size=16))
    # Symmetric, non-negative (up to the reference's eps conventions).
    np.testing.assert_allclose(jsd(p, q), jsd(q, p), atol=1e-10)
    assert np.all(np.asarray(jsd(p, q)) > -1e-9)
    # Self-divergence ~ 0.
    np.testing.assert_allclose(jsd(p, p), 0.0, atol=1e-9)
    # KLD against itself ~ 0.
    np.testing.assert_allclose(kld(p, p), 0.0, atol=1e-9)
