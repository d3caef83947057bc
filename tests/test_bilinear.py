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


def test_zbank_matches_full_bank_on_backprojected_frame(rng):
    """The depth-only (16, P) z-bank must reproduce the (28, P) bank's
    values/validity/gradients BIT-EXACTLY at every valid query -- its x/y
    reconstruction (x = (u - cx) z / fx) is the same formula, same op
    order, as backproject_depth, which is how frame corner points are
    built in the tracker."""
    from super_tpu.geometry.camera import Intrinsics, backproject_depth
    from super_tpu.ops.bilinear import (
        bilinear_sample_bank_fm,
        bilinear_sample_bank_z_fm,
        build_corner_bank_z,
    )

    h, w = 19, 29
    p = h * w
    intr = Intrinsics(fx=jnp.float32(57.0), fy=jnp.float32(61.0),
                      cx=jnp.float32(w / 2 - 0.37),
                      cy=jnp.float32(h / 2 + 0.21))
    depth = jnp.asarray(0.4 + 0.3 * rng.random((h, w)), jnp.float32)
    points = backproject_depth(depth, intr).reshape(3, p)
    nr = rng.normal(size=(3, p))
    norms = jnp.asarray(nr / np.linalg.norm(nr, axis=0), jnp.float32)
    valid = rng.uniform(size=(h, w)) > 0.25
    index_map = jnp.where(jnp.asarray(valid),
                          jnp.arange(p, dtype=jnp.int32).reshape(h, w), -1)

    n = 700
    v = jnp.asarray(rng.uniform(-2.0, h + 1.0, size=n), jnp.float32)
    u = jnp.asarray(rng.uniform(-2.0, w + 1.0, size=n), jnp.float32)
    v = v.at[:20].set(jnp.floor(v[:20]))
    u = u.at[10:30].set(jnp.floor(u[10:30]))

    bank28 = build_corner_bank(points, norms, index_map)
    bank16 = build_corner_bank_z(points, norms, index_map)
    assert bank16.shape == (16, p)

    ref = bilinear_sample_bank_fm(bank28, h, w, v, u, compute_grad=True)
    out = bilinear_sample_bank_z_fm(bank16, intr, h, w, v, u,
                                    compute_grad=True)
    ok_ref = np.asarray(ref[2])
    ok_out = np.asarray(out[2])
    np.testing.assert_array_equal(ok_out, ok_ref)
    for a, b in zip(out[:2] + out[3:], ref[:2] + ref[3:]):
        np.testing.assert_array_equal(np.asarray(a)[:, ok_ref],
                                      np.asarray(b)[:, ok_ref])


def test_zxbank_matches_indexed_samplers(rng):
    """The extended z-bank (points+normals+extras in one gather) must
    match bilinear_sample_two + bilinear_sample_indexed at valid queries."""
    from super_tpu.geometry.camera import Intrinsics, backproject_depth
    from super_tpu.ops.bilinear import (
        bilinear_sample_bank_zx_fm,
        bilinear_sample_indexed,
        build_corner_bank_zx,
    )

    h, w, c = 19, 29, 3
    p = h * w
    intr = Intrinsics(fx=jnp.float32(57.0), fy=jnp.float32(61.0),
                      cx=jnp.float32(w / 2 - 0.37),
                      cy=jnp.float32(h / 2 + 0.21))
    depth = jnp.asarray(0.4 + 0.3 * rng.random((h, w)), jnp.float32)
    points = backproject_depth(depth, intr).reshape(3, p)
    nr = rng.normal(size=(3, p))
    norms = jnp.asarray(nr / np.linalg.norm(nr, axis=0), jnp.float32)
    extra = jnp.asarray(rng.random((c, p)), jnp.float32)
    valid = rng.uniform(size=(h, w)) > 0.25
    index_map = jnp.where(jnp.asarray(valid),
                          jnp.arange(p, dtype=jnp.int32).reshape(h, w), -1)

    n = 600
    v = jnp.asarray(rng.uniform(-2.0, h + 1.0, size=n), jnp.float32)
    u = jnp.asarray(rng.uniform(-2.0, w + 1.0, size=n), jnp.float32)

    bank = build_corner_bank_zx(points, norms, extra, index_map)
    o, nn, ex, ok = bilinear_sample_bank_zx_fm(bank, c, intr, h, w, v, u)

    o_ref, n_ref, ok2, _, _ = bilinear_sample_two(points, norms, index_map,
                                                  v, u)
    ex_ref, ok3, _ = bilinear_sample_indexed(extra, index_map, v, u)
    okr = np.asarray(ok2 & ok3)
    np.testing.assert_array_equal(np.asarray(ok), okr)
    np.testing.assert_allclose(np.asarray(o.T)[okr], np.asarray(o_ref)[okr],
                               rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(nn.T)[okr],
                               np.asarray(n_ref)[okr], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ex.T)[okr],
                               np.asarray(ex_ref)[okr], rtol=1e-6)
