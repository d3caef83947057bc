"""RAFT optical flow (flax) -- 2D variant for the sf_corr loss.

The reference uses torchvision's pretrained raft_small/raft_large
(utils/shared_functions.py:6,131-134) to supply dense correspondences to
the surfel-correspondence loss (deform_mesh.py:19-23,302-311).  This is a
TPU-native RAFT: shared feature encoder, 2D all-pairs correlation pyramid
(einsum on the MXU), ConvGRU refinement under lax.scan, convex upsampling.

Weights are trained/loaded separately (torchvision is not available in this
image); the architecture and interface match what the corr loss needs:
``flow = model.apply(params, img1, img2)`` -> (N, H, W, 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from super_tpu.models.raft_stereo import (
    BasicEncoder,
    ConvGRU,
    MultiBasicEncoder,
    convex_upsample,
)

CORR_LEVELS = 4
CORR_RADIUS = 4


def build_corr_pyramid_2d(fmap1, fmap2, num_levels=CORR_LEVELS):
    """(N, H, W, D) x 2 -> list of (N, H, W, H/2^l, W/2^l)."""
    d = fmap1.shape[-1]
    corr = jnp.einsum("nhwd,nuvd->nhwuv", fmap1, fmap2) / jnp.sqrt(
        jnp.asarray(d, fmap1.dtype))
    pyr = [corr]
    for _ in range(num_levels - 1):
        n, h, w, u, v = corr.shape
        corr = corr[..., : u // 2 * 2, : v // 2 * 2]
        corr = corr.reshape(n, h, w, u // 2, 2, v // 2, 2).mean((4, 6))
        pyr.append(corr)
    return pyr


def lookup_corr_2d(pyr, cx, cy, radius=CORR_RADIUS):
    """Bilinear window lookup around (cx, cy)/2^l; returns
    (N, H, W, levels*(2r+1)^2)."""
    outs = []
    for lvl, corr in enumerate(pyr):
        n, h, w, u, v = corr.shape
        x = cx / (2 ** lvl)
        y = cy / (2 ** lvl)
        flat = corr.reshape(n, h, w, u * v)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                xq = x + dx
                yq = y + dy
                x0 = jnp.floor(xq)
                y0 = jnp.floor(yq)
                ax = xq - x0
                ay = yq - y0
                val = 0.0
                for oy, wy in ((0, (1 - ay)), (1, ay)):
                    for ox, wx in ((0, (1 - ax)), (1, ax)):
                        xi = x0 + ox
                        yi = y0 + oy
                        inb = (xi >= 0) & (xi <= v - 1) & (yi >= 0) & (yi <= u - 1)
                        idx = (jnp.clip(yi, 0, u - 1) * v
                               + jnp.clip(xi, 0, v - 1)).astype(jnp.int32)
                        c = jnp.take_along_axis(flat, idx[..., None],
                                                axis=-1)[..., 0]
                        val = val + jnp.where(inb, c, 0.0) * wy * wx
                outs.append(val)
    return jnp.stack(outs, axis=-1)


class MotionEncoder2D(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(96, (1, 1), name="convc1")(corr))
        cor = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convc2")(cor))
        flo = nn.relu(nn.Conv(64, (7, 7), padding=3, name="convf1")(flow))
        flo = nn.relu(nn.Conv(32, (3, 3), padding=1, name="convf2")(flo))
        out = nn.relu(nn.Conv(126, (3, 3), padding=1, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class RAFTFlow(nn.Module):
    iters: int = 12
    downsample: int = 3   # RAFT's 1/8 resolution

    @nn.compact
    def __call__(self, image1, image2):
        x1 = 2.0 * image1 - 1.0
        x2 = 2.0 * image2 - 1.0
        f = BasicEncoder(output_dim=256, norm_fn="instance",
                         downsample=self.downsample, name="fnet")(
            jnp.concatenate([x1, x2], axis=0))
        b = image1.shape[0]
        fmap1, fmap2 = f[:b], f[b:]
        pyr = build_corr_pyramid_2d(fmap1, fmap2)

        c = BasicEncoder(output_dim=256, norm_fn="none",
                         downsample=self.downsample, name="cnet")(x1)
        net = nn.tanh(c[..., :128])
        inp = nn.relu(c[..., 128:])

        n, h, w, _ = fmap1.shape
        gx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :],
                              (n, h, w))
        gy = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :, None],
                              (n, h, w))
        gru = ConvGRU(hidden=128, name="gru")
        menc = MotionEncoder2D(name="motion")
        head1 = nn.Conv(256, (3, 3), padding=1, name="flow_head_1")
        head2 = nn.Conv(2, (3, 3), padding=1, name="flow_head_2")
        mask1 = nn.Conv(256, (3, 3), padding=1, name="mask_1")
        mask2 = nn.Conv((2 ** self.downsample) ** 2 * 9, (1, 1), name="mask_2")

        def step(net, fx, fy):
            corr = lookup_corr_2d(pyr, gx + fx, gy + fy)
            flow = jnp.stack([fx, fy], axis=-1)
            motion = menc(flow, corr)
            net = gru(net, jnp.concatenate([motion, inp], axis=-1))
            delta = head2(nn.relu(head1(net)))
            mask = 0.25 * mask2(nn.relu(mask1(net)))
            return net, fx + delta[..., 0], fy + delta[..., 1], mask

        net, fx, fy, mask = step(net, jnp.zeros_like(gx), jnp.zeros_like(gy))
        if self.iters > 1:
            def body(carry, _):
                net, fx, fy = carry
                net, fx, fy, mask = step(net, fx, fy)
                return (net, fx, fy), mask

            (net, fx, fy), masks = jax.lax.scan(
                body, (net, fx, fy), None, length=self.iters - 1)
            mask = jax.tree.map(lambda m: m[-1], masks)

        flow = jnp.stack([fx, fy], axis=-1)
        return convex_upsample(flow, mask, 2 ** self.downsample)
