"""RAFT optical flow (flax) -- the 2D variant for the sf_corr loss.

The reference supplies dense correspondences to the surfel-correspondence
loss from a pretrained RAFT (utils/shared_functions.py:6,131-134;
deform_mesh.py:19-23,302-311).  This is a TPU-native RAFT-large: shared
feature encoder, 2D all-pairs correlation pyramid (einsum on the MXU),
SepConvGRU refinement under ``lax.scan``, convex upsampling.

The module tree mirrors the original RAFT checkpoint layout (fnet /
batch-norm cnet / update_block {encoder, gru, flow_head, mask}), loaded by
``convert_torch_raft_flow`` -- including RAFT's corr-window quirk where the
x-offset varies along the *outer* window axis (its meshgrid(dy, dx) feeds
dy into the sampler's x slot; the window is symmetric so only the channel
order matters, and conv weights are keyed to it).  Output parity vs a torch
build from the reference's own raft_core modules is tested in
tests/test_flow_parity.py.  torchvision's re-implementation renames modules
(feature_encoder/context_encoder/...); ``convert_torchvision_raft_flow``
remaps that layout onto the original one and delegates -- torchvision's
raft_large is architecturally identical to princeton-vl RAFT-large
(including the corr-window order: its meshgrid(di, dj, indexing="ij") adds
the OUTER axis to grid_sample's x slot, same as the original), so the
remap is pure renaming.

Interface: ``flow = model.apply(params, img1, img2)`` -> (N, H, W, 2),
images in [0, 1].
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from super_tpu.models.raft_stereo import (
    BasicEncoder,
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
    (N, H, W, levels*(2r+1)^2).

    Channel order matches RAFT's corr.py: within a level the x-offset is
    the OUTER axis (RAFT builds its window with meshgrid(dy, dx) whose
    first component lands in the sampler's x coordinate)."""
    outs = []
    for lvl, corr in enumerate(pyr):
        n, h, w, u, v = corr.shape
        x = cx / (2 ** lvl)
        y = cy / (2 ** lvl)
        flat = corr.reshape(n, h, w, u * v)
        for ox_off in range(-radius, radius + 1):
            for oy_off in range(-radius, radius + 1):
                xq = x + ox_off
                yq = y + oy_off
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


class SepConvGRU(nn.Module):
    """RAFT-large's separable GRU: a 1x5 then a 5x1 GRU pass
    (raft_core/update.py:34-63)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for tag, k, pad in (("1", (1, 5), ((0, 0), (2, 2))),
                            ("2", (5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden, k, padding=pad,
                                   name=f"convz{tag}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, k, padding=pad,
                                   name=f"convr{tag}")(hx))
            q = nn.tanh(nn.Conv(self.hidden, k, padding=pad,
                                name=f"convq{tag}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class MotionEncoder2D(nn.Module):
    """RAFT-large BasicMotionEncoder (324-ch corr window)."""

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=1, name="convc2")(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=3, name="convf1")(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convf2")(flo))
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

        c = BasicEncoder(output_dim=256, norm_fn="batch",
                         downsample=self.downsample, name="cnet")(x1)
        net = nn.tanh(c[..., :128])
        inp = nn.relu(c[..., 128:])

        n, h, w, _ = fmap1.shape
        gx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :],
                              (n, h, w))
        gy = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :, None],
                              (n, h, w))
        gru = SepConvGRU(hidden=128, name="gru")
        menc = MotionEncoder2D(name="encoder")
        head1 = nn.Conv(256, (3, 3), padding=1, name="flow_head_1")
        head2 = nn.Conv(2, (3, 3), padding=1, name="flow_head_2")
        mask1 = nn.Conv(256, (3, 3), padding=1, name="mask_1")
        mask2 = nn.Conv((2 ** self.downsample) ** 2 * 9, (1, 1), name="mask_2")

        def step(net, fx, fy):
            corr = lookup_corr_2d(pyr, gx + fx, gy + fy)
            flow = jnp.stack([fx, fy], axis=-1)
            motion = menc(flow, corr)
            # BasicUpdateBlock concatenates [context, motion] (update.py of
            # the original RAFT; the stereo variant pre-splits instead).
            net = gru(net, jnp.concatenate([inp, motion], axis=-1))
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


def convert_torch_raft_flow(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Original-RAFT checkpoint (princeton-vl layout, e.g. raft-things.pth)
    -> RAFTFlow flax params.

    fnet is instance-normed (no norm params); cnet carries batch-norm
    running stats; update_block holds {encoder, gru (SepConvGRU),
    flow_head, mask}.  'module.' prefixes (the released checkpoints are
    DataParallel-saved) are stripped."""
    import numpy as np

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(v.detach().cpu().numpy()
                           if hasattr(v, "detach") else v)

    def conv(key):
        out = {"kernel": jnp.asarray(sd[key + ".weight"].transpose(2, 3, 1, 0))}
        if key + ".bias" in sd:
            out["bias"] = jnp.asarray(sd[key + ".bias"])
        return out

    def bn(key):
        return {
            "scale": jnp.asarray(sd[key + ".weight"]),
            "bias": jnp.asarray(sd[key + ".bias"]),
            "mean": jnp.asarray(sd[key + ".running_mean"]),
            "var": jnp.asarray(sd[key + ".running_var"]),
        }

    def encoder(prefix, with_bn):
        enc = {"conv1": conv(prefix + ".conv1"),
               "conv2": conv(prefix + ".conv2")}
        if with_bn:
            enc["norm1"] = bn(prefix + ".norm1")
        for li in range(1, 4):
            for bi in range(2):
                t = f"{prefix}.layer{li}.{bi}"
                entry = {"conv1": conv(t + ".conv1"),
                         "conv2": conv(t + ".conv2")}
                if with_bn:
                    entry["norm1"] = bn(t + ".norm1")
                    entry["norm2"] = bn(t + ".norm2")
                if t + ".downsample.0.weight" in sd:
                    entry["downsample"] = conv(t + ".downsample.0")
                    if with_bn:
                        entry["norm3"] = bn(t + ".norm3")
                enc[f"layer{li}_{bi}"] = entry
        return enc

    params = {
        "fnet": encoder("fnet", with_bn=False),
        "cnet": encoder("cnet", with_bn=True),
        "encoder": {name: conv(f"update_block.encoder.{name}")
                    for name in ("convc1", "convc2", "convf1", "convf2",
                                 "conv")},
        "gru": {name: conv(f"update_block.gru.{name}")
                for name in ("convz1", "convr1", "convq1",
                             "convz2", "convr2", "convq2")},
        "flow_head_1": conv("update_block.flow_head.conv1"),
        "flow_head_2": conv("update_block.flow_head.conv2"),
        "mask_1": conv("update_block.mask.0"),
        "mask_2": conv("update_block.mask.2"),
    }
    return {"params": params}


def convert_torchvision_raft_flow(state_dict: Dict[str, Any]
                                  ) -> Dict[str, Any]:
    """torchvision ``raft_large`` checkpoint -> RAFTFlow flax params.

    The reference sources its sf_corr flow weights from torchvision
    (utils/shared_functions.py:131-134).  torchvision's RAFT (>= 0.12,
    torchvision/models/optical_flow/raft.py) is the original architecture
    under renamed modules; this remaps its key layout onto the
    princeton-vl one and delegates to ``convert_torch_raft_flow``:

      feature_encoder/context_encoder -> fnet/cnet, with
        convnormrelu.{0,1} -> conv1/norm1 (stem),
        layerL.B.convnormrelu{1,2}.{0,1} -> conv1/conv2 + norm1/norm2,
        layerL.B.downsample.{0,1} -> downsample.0 + norm3,
        conv -> conv2 (the final 1x1);
      update_block.motion_encoder.conv{corr1,corr2,flow1,flow2,conv}.0
        -> update_block.encoder.{convc1,convc2,convf1,convf2,conv};
      update_block.recurrent_block.convgru{1,2}.conv{z,r,q}
        -> update_block.gru.conv{z,r,q}{1,2};
      update_block.flow_head.conv{1,2} unchanged;
      mask_predictor.{convrelu.0,conv} -> update_block.mask.{0,2}.

    BatchNorm ``num_batches_tracked`` counters are dropped.  Only the
    raft_large layout is supported (raft_small uses different modules:
    SmallMotionEncoder / a single full ConvGRU / no mask predictor).
    """
    import re

    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        nk = k
        nk = nk.replace("feature_encoder.", "fnet.")
        nk = nk.replace("context_encoder.", "cnet.")
        if nk.startswith(("fnet.", "cnet.")):
            nk = nk.replace(".convnormrelu1.0.", ".conv1.")
            nk = nk.replace(".convnormrelu1.1.", ".norm1.")
            nk = nk.replace(".convnormrelu2.0.", ".conv2.")
            nk = nk.replace(".convnormrelu2.1.", ".norm2.")
            nk = nk.replace(".downsample.1.", ".norm3.")
            nk = re.sub(r"^(fnet|cnet)\.convnormrelu\.0\.", r"\1.conv1.",
                        nk)
            nk = re.sub(r"^(fnet|cnet)\.convnormrelu\.1\.", r"\1.norm1.",
                        nk)
            nk = re.sub(r"^(fnet|cnet)\.conv\.", r"\1.conv2.", nk)
        nk = re.sub(
            r"^update_block\.motion_encoder\.conv(corr1|corr2|flow1|flow2)"
            r"\.0\.",
            lambda m: "update_block.encoder.conv%s." % {
                "corr1": "c1", "corr2": "c2",
                "flow1": "f1", "flow2": "f2"}[m.group(1)], nk)
        nk = nk.replace("update_block.motion_encoder.conv.0.",
                        "update_block.encoder.conv.")
        nk = re.sub(r"^update_block\.recurrent_block\.convgru([12])"
                    r"\.conv([zrq])\.",
                    r"update_block.gru.conv\g<2>\g<1>.", nk)
        nk = nk.replace("mask_predictor.convrelu.0.",
                        "update_block.mask.0.")
        nk = nk.replace("mask_predictor.conv.", "update_block.mask.2.")
        out[nk] = v
    return convert_torch_raft_flow(out)
