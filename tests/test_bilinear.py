"""Corner-bank sampler vs the indexed two-bank reference sampler.

The hot data-term path samples via a per-frame (28, P) corner bank
(ops/bilinear.py:build_corner_bank) -- 1 gather index per query instead of
12.  It must be value-, validity-, and gradient-identical to
bilinear_sample_two on the same (points, norms, index_map) triple,
including out-of-bounds and invalid-corner cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from super_tpu.ops.bilinear import (
    bilinear_sample_bank,
    bilinear_sample_two,
    build_corner_bank,
)


@pytest.fixture
def setup(rng):
    h, w = 17, 23
    p = h * w
    points = jnp.asarray(rng.normal(size=(3, p)), jnp.float32)
    norms = jnp.asarray(rng.normal(size=(3, p)), jnp.float32)
    # ~25% invalid pixels, stored as garbage (NaN) to catch missing masking.
    valid = rng.uniform(size=(h, w)) > 0.25
    index_map = jnp.where(jnp.asarray(valid),
                          jnp.arange(p, dtype=jnp.int32).reshape(h, w), -1)
    points = jnp.where(jnp.asarray(valid.reshape(-1))[None], points,
                       jnp.nan)
    norms = jnp.where(jnp.asarray(valid.reshape(-1))[None], norms, jnp.nan)
    n = 500
    # Queries spanning interior, exact-integer, and out-of-bounds coords.
    v = jnp.asarray(rng.uniform(-2.0, h + 1.0, size=n), jnp.float32)
    u = jnp.asarray(rng.uniform(-2.0, w + 1.0, size=n), jnp.float32)
    v = v.at[:20].set(jnp.floor(v[:20]))  # exact integers
    u = u.at[10:30].set(jnp.floor(u[10:30]))
    return h, w, points, norms, index_map, v, u


def _ref(points, norms, index_map, v, u, grad):
    # The reference sampler zeroes invalid corners AFTER the gather, so NaN
    # payloads at invalid pixels never propagate; feed it zeros there to
    # keep the comparison free of 0*NaN.
    pz = jnp.nan_to_num(points)
    nz = jnp.nan_to_num(norms)
    return bilinear_sample_two(pz, nz, index_map, v, u, compute_grad=grad)


@pytest.mark.parametrize("grad", [False, True])
def test_bank_matches_two(setup, grad):
    h, w, points, norms, index_map, v, u = setup
    ra = _ref(points, norms, index_map, v, u, grad)
    bank = build_corner_bank(points, norms, index_map)
    assert not bool(jnp.any(jnp.isnan(bank)))
    rb = bilinear_sample_bank(bank, h, w, v, u, compute_grad=grad)
    np.testing.assert_array_equal(np.asarray(ra[2]), np.asarray(rb[2]))
    # Values/gradients are contractual only at VALID queries (invalid ones
    # are masked by every caller; the two samplers' partial sums differ
    # there -- see bilinear_sample_bank docstring).
    sel = np.asarray(ra[2])
    assert sel.sum() > 50  # the comparison must actually cover something
    for i in (0, 1):
        np.testing.assert_allclose(np.asarray(ra[i])[sel],
                                   np.asarray(rb[i])[sel], atol=1e-6)
    if grad:
        for i in (3, 4):
            np.testing.assert_allclose(np.asarray(ra[i])[sel],
                                       np.asarray(rb[i])[sel], atol=1e-6)
    else:
        assert rb[3] is None and rb[4] is None


def test_bank_fm_matches_bank(setup):
    from super_tpu.ops.bilinear import bilinear_sample_bank_fm

    h, w, points, norms, index_map, v, u = setup
    bank = build_corner_bank(points, norms, index_map)
    ra = bilinear_sample_bank(bank, h, w, v, u)
    va, vb, ok = bilinear_sample_bank_fm(bank, h, w, v, u)
    np.testing.assert_array_equal(np.asarray(ra[2]), np.asarray(ok))
    sel = np.asarray(ok)
    assert sel.sum() > 50
    np.testing.assert_allclose(np.asarray(ra[0])[sel],
                               np.asarray(va.T)[sel], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ra[1])[sel],
                               np.asarray(vb.T)[sel], atol=1e-6)
