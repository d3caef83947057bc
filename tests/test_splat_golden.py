"""Golden tests for the soft splat (render/splat.py:render_soft).

The soft splat replaces the pulsar CUDA sphere renderer
(renderer/renderer.py:50-78, gamma=1e-5, sub-pixel radius).  These tests pin
its behavior contract to analytic expectations on fixed scenes: bilinear
footprint weights, occlusion ordering at pulsar-like small gamma,
equal-depth blending, background compositing, and the gradient direction on
screen position that the render loss relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np

from super_tpu.geometry.camera import Intrinsics
from super_tpu.render.splat import render_soft, render_zbuffer

H, W = 16, 20
# fx=fy=1, cx=cy=0 and z=1 makes screen coords equal camera x/y: u=x, v=y.
INTR = Intrinsics(fx=jnp.float32(1.0), fy=jnp.float32(1.0),
                  cx=jnp.float32(0.0), cy=jnp.float32(0.0))


def _pts(xyz):
    return jnp.asarray(np.asarray(xyz, np.float32).T)  # (3, N) feature-major


def _render(points, colors, gamma=1e-2, bg=0.0):
    mask = jnp.ones(points.shape[1], bool)
    return np.asarray(render_soft(points, colors, mask, INTR, H, W,
                                  gamma=gamma, bg_color=bg))


def test_bilinear_footprint_weights():
    """One splat at a fractional position deposits bilinearly into its 4
    neighbors; after normalization + alpha compositing over bg=0, each
    pixel shows color * w (w = the bilinear weight)."""
    # u = 5.25, v = 7.5 at z=1.
    pts = _pts([[5.25, 7.5, 1.0]])
    col = jnp.asarray([[1.0], [0.5], [0.25]], jnp.float32)
    img = _render(pts, col)
    # Bilinear weights: rows (7, 8) x cols (5, 6).
    wv = {7: 0.5, 8: 0.5}
    wu = {5: 0.75, 6: 0.25}
    for r, wr in wv.items():
        for c, wc in wu.items():
            np.testing.assert_allclose(
                img[:, r, c], np.array([1.0, 0.5, 0.25]) * wr * wc,
                rtol=1e-5)
    # Nothing else lit.
    lit = np.zeros((H, W), bool)
    lit[7:9, 5:7] = True
    assert np.abs(img[:, ~lit]).max() == 0.0


def test_integer_position_single_pixel():
    """A splat on an exact pixel center fully saturates that pixel."""
    pts = _pts([[4.0, 3.0, 1.0]])
    col = jnp.asarray([[0.2], [0.9], [0.6]], jnp.float32)
    img = _render(pts, col)
    np.testing.assert_allclose(img[:, 3, 4], [0.2, 0.9, 0.6], rtol=1e-6)
    assert np.count_nonzero(img.sum(0)) == 1


def test_occlusion_ordering_small_gamma():
    """Two splats on the same pixel: at pulsar-like small gamma the nearer
    one wins (exp(-dz / (gamma*z)) -> 0), matching render_zbuffer."""
    z_near, z_far = 1.0, 1.2
    pts = _pts([[4.0 * z_near, 3.0 * z_near, z_near],
                [4.0 * z_far, 3.0 * z_far, z_far]])  # same (u,v)=(4,3)
    col = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]], jnp.float32)
    img = _render(pts, col, gamma=1e-3)
    np.testing.assert_allclose(img[:, 3, 4], [1.0, 0.0, 0.0], atol=1e-6)
    mask = jnp.ones(2, bool)
    hard = np.asarray(render_zbuffer(pts, col, mask, INTR, H, W))
    np.testing.assert_allclose(img[:, 3, 4], hard[:, 3, 4], atol=1e-6)


def test_equal_depth_blend():
    """Two equal-depth splats on one pixel blend 50/50 (weight-normalized
    volumetric blend, the gamma->large limit of pulsar's eq. 2)."""
    pts = _pts([[4.0, 3.0, 1.0], [4.0, 3.0, 1.0]])
    col = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]], jnp.float32)
    img = _render(pts, col)
    np.testing.assert_allclose(img[:, 3, 4], [0.5, 0.5, 0.0], rtol=1e-6)


def test_background_compositing():
    """Uncovered pixels show bg; a half-weight splat alpha-blends with bg."""
    pts = _pts([[5.0, 7.5, 1.0]])  # v=7.5: rows 7 and 8 get w=0.5 each
    col = jnp.asarray([[1.0], [1.0], [1.0]], jnp.float32)
    img = _render(pts, col, bg=0.25)
    np.testing.assert_allclose(img[:, 0, 0], [0.25] * 3, rtol=1e-6)
    # alpha = 0.5: 0.5 * color + 0.5 * bg = 0.625.
    np.testing.assert_allclose(img[:, 7, 5], [0.625] * 3, rtol=1e-5)


def test_gradient_direction_on_screen_position():
    """d(loss)/d(x) must pull the splat toward a brighter target to its
    right -- the property the render loss (deform_mesh.py:112-123 analogue)
    needs from a differentiable renderer."""
    col = jnp.asarray([[1.0], [1.0], [1.0]], jnp.float32)
    target = np.zeros((3, H, W), np.float32)
    target[:, 3, 5] = 1.0  # bright pixel one column right of the splat

    def loss(x):
        pts = jnp.stack([x, jnp.asarray([3.0], jnp.float32),
                         jnp.asarray([1.0], jnp.float32)])
        img = render_soft(pts, col, jnp.ones(1, bool), INTR, H, W,
                          gamma=1e-2)
        return jnp.sum((img - target) ** 2)

    # Start between the pixels so the bilinear footprint is active.
    g = jax.grad(loss)(jnp.asarray([4.3], jnp.float32))
    assert np.isfinite(g).all()
    assert float(g[0]) < 0.0  # loss decreases as x grows toward u=5


def test_gradient_flows_to_colors():
    pts = _pts([[4.0, 3.0, 1.0]])

    def loss(c):
        img = render_soft(pts, c, jnp.ones(1, bool), INTR, H, W)
        return jnp.sum(img)

    g = jax.grad(loss)(jnp.asarray([[0.3], [0.3], [0.3]], jnp.float32))
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-5)


def test_masked_points_invisible():
    pts = _pts([[4.0, 3.0, 1.0], [8.0, 9.0, 1.0]])
    col = jnp.ones((3, 2), jnp.float32)
    mask = jnp.asarray([True, False])
    img = np.asarray(render_soft(pts, col, mask, INTR, H, W))
    assert img[:, 3, 4].sum() > 0
    assert img[:, 9, 8].sum() == 0
