"""RAFT-Stereo (flax): recurrent stereo disparity, TPU-idiomatic.

Reference: depth/raft_core/raft_stereo.py:22-141 with the default options
(options.py:120-148): corr_levels=4, corr_radius=4, n_downsample=2,
n_gru_layers=3, hidden_dims=[128]*3, context_norm='batch',
corr_implementation='reg', no shared backbone / slow-fast.

TPU-first choices:
- the GRU update loop is a ``lax.scan`` (one compiled iteration body,
  reference loops in Python, raft_stereo.py:108-136);
- the all-pairs 1D correlation volume is a single einsum (MXU) and the
  radius lookup is a linear-interp gather along the epipolar line
  (replacing the optional CUDA samplers corr.py:5-14);
- NHWC layout; instance norms are parameter-free (torch affine=False
  default); 'batch' norms are inference-mode running-stats affines
  (resnet._BN) so converted checkpoints fold exactly
  (convert_torch_raft_stereo below; tested for output parity against the
  reference torch model in tests/test_raft_parity.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_tpu.models.resnet import _BN

CORR_LEVELS = 4
CORR_RADIUS = 4
HIDDEN = 128


def _inorm(x):
    """InstanceNorm2d(affine=False): normalize over H, W per channel."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


def _norm(x, kind):
    if kind == "instance":
        return _inorm(x)
    if kind == "none":
        return x
    raise ValueError(kind)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        def norm(y, name):
            # 'batch' carries running-stats params (extractor.py:22-26,
            # eval-mode semantics); instance/none are parameter-free.
            if self.norm_fn == "batch":
                return _BN(name=name)(y)
            return _norm(y, self.norm_fn)

        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, name="conv1")(x)
        y = nn.relu(norm(y, "norm1"))
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(norm(y, "norm2"))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        name="downsample")(x)
            x = norm(x, "norm3")
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Feature encoder at 1/2^downsample resolution (extractor.py:122-198)."""

    output_dim: int = 256
    norm_fn: str = "instance"
    downsample: int = 2

    @nn.compact
    def __call__(self, x):
        d = self.downsample
        x = nn.Conv(64, (7, 7), strides=(2 if d > 2 else 1,) * 2, padding=3,
                    name="conv1")(x)
        if self.norm_fn == "batch":
            x = _BN(name="norm1")(x)
        else:
            x = _norm(x, self.norm_fn)
        x = nn.relu(x)
        for i, (dim, s) in enumerate(
                [(64, 1), (96, 2 if d > 1 else 1), (128, 2 if d > 0 else 1)]):
            x = ResidualBlock(dim, self.norm_fn, s, name=f"layer{i+1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, name=f"layer{i+1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


class MultiBasicEncoder(nn.Module):
    """Context encoder: (hidden, context) pairs at 1/8(eff), 1/16, 1/32
    relative scales (extractor.py:199-300)."""

    norm_fn: str = "batch"
    downsample: int = 2
    hidden: int = HIDDEN

    @nn.compact
    def __call__(self, x):
        d = self.downsample
        x = nn.Conv(64, (7, 7), strides=(2 if d > 2 else 1,) * 2, padding=3,
                    name="conv1")(x)
        if self.norm_fn == "batch":
            x = _BN(name="norm1")(x)
        else:
            x = _norm(x, self.norm_fn)
        x = nn.relu(x)
        for i, (dim, s) in enumerate(
                [(64, 1), (96, 2 if d > 1 else 1), (128, 2 if d > 0 else 1)]):
            x = ResidualBlock(dim, self.norm_fn, s, name=f"layer{i+1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, name=f"layer{i+1}_1")(x)
        x08 = x
        x16 = ResidualBlock(128, self.norm_fn, 2, name="layer4_0")(x08)
        x16 = ResidualBlock(128, self.norm_fn, 1, name="layer4_1")(x16)
        x32 = ResidualBlock(128, self.norm_fn, 2, name="layer5_0")(x16)
        x32 = ResidualBlock(128, self.norm_fn, 1, name="layer5_1")(x32)

        outs = []
        for si, feat in enumerate([x08, x16, x32]):
            if si < 2:
                h = ResidualBlock(128, self.norm_fn, 1,
                                  name=f"out{si}_h_res")(feat)
                h = nn.Conv(self.hidden, (3, 3), padding=1,
                            name=f"out{si}_h")(h)
                c = ResidualBlock(128, self.norm_fn, 1,
                                  name=f"out{si}_c_res")(feat)
                c = nn.Conv(self.hidden, (3, 3), padding=1,
                            name=f"out{si}_c")(c)
            else:
                h = nn.Conv(self.hidden, (3, 3), padding=1,
                            name=f"out{si}_h")(feat)
                c = nn.Conv(self.hidden, (3, 3), padding=1,
                            name=f"out{si}_c")(feat)
            outs.append((h, c))
        return outs


def build_corr_pyramid(fmap1, fmap2, num_levels=CORR_LEVELS):
    """All-pairs 1D correlation + averaged pyramid (corr.py:110-125,150-156).

    fmap1/2: (N, H, W, D).  Returns list of (N, H, W1, W2 / 2^l)."""
    d = fmap1.shape[-1]
    corr = jnp.einsum("nhwd,nhvd->nhwv", fmap1, fmap2) / jnp.sqrt(
        jnp.asarray(d, fmap1.dtype))
    pyramid = [corr]
    for _ in range(num_levels - 1):
        w2 = corr.shape[-1] // 2
        corr = 0.5 * (corr[..., : 2 * w2 : 2] + corr[..., 1 : 2 * w2 : 2])
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid, coords_x, radius=CORR_RADIUS):
    """Sample each level at x/2^l + dx, dx in [-r, r] (corr.py:127-146).

    coords_x: (N, H, W) current x-correspondence.  Returns
    (N, H, W, levels*(2r+1))."""
    outs = []
    for lvl, corr in enumerate(pyramid):
        w2 = corr.shape[-1]
        x = coords_x / (2 ** lvl)
        for dx in range(-radius, radius + 1):
            xq = x + dx
            x0 = jnp.floor(xq)
            a = xq - x0
            i0 = jnp.clip(x0.astype(jnp.int32), 0, w2 - 1)
            i1 = jnp.clip(i0 + 1, 0, w2 - 1)
            # Zero padding outside (torch grid_sample zeros).
            inb0 = (x0 >= 0) & (x0 <= w2 - 1)
            inb1 = (x0 + 1 >= 0) & (x0 + 1 <= w2 - 1)
            c0 = jnp.take_along_axis(corr, i0[..., None], axis=-1)[..., 0]
            c1 = jnp.take_along_axis(corr, i1[..., None], axis=-1)[..., 0]
            val = jnp.where(inb0, c0, 0.0) * (1 - a) + \
                jnp.where(inb1, c1, 0.0) * a
            outs.append(val)
    return jnp.stack(outs, axis=-1)


class ConvGRU(nn.Module):
    hidden: int = HIDDEN

    @nn.compact
    def __call__(self, h, x, cz=None, cr=None, cq=None):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.Conv(self.hidden, (3, 3), padding=1, name="convz")(hx)
        r = nn.Conv(self.hidden, (3, 3), padding=1, name="convr")(hx)
        if cz is not None:
            z = z + cz
            r = r + cr
        z = nn.sigmoid(z)
        r = nn.sigmoid(r)
        q = nn.Conv(self.hidden, (3, 3), padding=1, name="convq")(
            jnp.concatenate([r * h, x], axis=-1))
        if cq is not None:
            q = q + cq
        q = nn.tanh(q)
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    """update.py:64-86."""

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(64, (1, 1), name="convc1")(corr))
        cor = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convc2")(cor))
        flo = nn.relu(nn.Conv(64, (7, 7), padding=3, name="convf1")(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convf2")(flo))
        out = nn.relu(nn.Conv(126, (3, 3), padding=1, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


def _pool2x(x):
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _axis_weights(n_out: int, n_in: int, dtype):
    """Row-stochastic (n_out, n_in) bilinear weights, align_corners=True
    coordinate mapping (x_in = x_out * (n_in-1)/(n_out-1))."""
    if n_out == 1 or n_in == 1:
        pos = jnp.zeros((n_out,), dtype)
    else:
        pos = jnp.arange(n_out, dtype=dtype) * ((n_in - 1) / (n_out - 1))
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    frac = pos - i0.astype(dtype)
    rows = jnp.arange(n_out)
    w = jnp.zeros((n_out, n_in), dtype)
    return w.at[rows, i0].add(1 - frac).at[rows, i1].add(frac)


def _interp_to(x, ref):
    """Bilinear resize with torch align_corners=True semantics
    (update.py:95-97) as two separable matmuls (MXU-friendly)."""
    n, h, w, _ = ref.shape
    if x.shape[1:3] == (h, w):
        return x
    wy = _axis_weights(h, x.shape[1], x.dtype)
    wx = _axis_weights(w, x.shape[2], x.dtype)
    return jnp.einsum("oh,nhwc,pw->nopc", wy, x, wx)


class UpdateBlock(nn.Module):
    """Multi-scale GRU update + flow head + upsampling mask
    (update.py:97-138)."""

    factor: int = 4  # 2^n_downsample

    @nn.compact
    def __call__(self, nets, inps, corr, flow):
        net08, net16, net32 = nets
        (cz0, cr0, cq0), (cz1, cr1, cq1), (cz2, cr2, cq2) = inps
        net32 = ConvGRU(name="gru32")(net32, _pool2x(net16), cz2, cr2, cq2)
        net16 = ConvGRU(name="gru16")(
            net16, jnp.concatenate([_pool2x(net08), _interp_to(net32, net16)],
                                   axis=-1), cz1, cr1, cq1)
        motion = BasicMotionEncoder(name="encoder")(flow, corr)
        net08 = ConvGRU(name="gru08")(
            net08, jnp.concatenate([motion, _interp_to(net16, net08)],
                                   axis=-1), cz0, cr0, cq0)
        delta = nn.Conv(2, (3, 3), padding=1, name="flow_head_2")(
            nn.relu(nn.Conv(256, (3, 3), padding=1, name="flow_head_1")(net08)))
        mask = nn.relu(nn.Conv(256, (3, 3), padding=1, name="mask_1")(net08))
        mask = 0.25 * nn.Conv(self.factor ** 2 * 9, (1, 1),
                              name="mask_2")(mask)
        return (net08, net16, net32), mask, delta


def convex_upsample(flow, mask, factor):
    """Mask-weighted convex combination upsampling (raft_stereo.py:56-68).

    flow: (N, h, w, 2); mask: (N, h, w, 9*factor^2)."""
    n, h, w, _ = flow.shape
    mask = mask.reshape(n, h, w, 9, factor, factor)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighborhoods of the (scaled) flow.
    fpad = jnp.pad(flow * factor, ((0, 0), (1, 1), (1, 1), (0, 0)))
    stack = [fpad[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    neigh = jnp.stack(stack, axis=3)                 # (N, h, w, 9, 2)
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", mask, neigh)
    up = up.transpose(0, 1, 3, 2, 4, 5)              # (N, h, a, w, b, 2)
    return up.reshape(n, h * factor, w * factor, 2)


class RAFTStereo(nn.Module):
    """Full model; images (N, H, W, 3) in [0, 1] (the reference rescales
    from [0,255], raft_stereo.py:73-74 -- we take [0,1] and rescale to
    [-1, 1])."""

    iters: int = 32
    downsample: int = 2

    @nn.compact
    def __call__(self, image1, image2):
        x1 = 2.0 * image1 - 1.0
        x2 = 2.0 * image2 - 1.0
        fmap1 = BasicEncoder(norm_fn="instance", downsample=self.downsample,
                             name="fnet")(
            jnp.concatenate([x1, x2], axis=0))
        b = image1.shape[0]
        fmap1, fmap2 = fmap1[:b], fmap1[b:]
        pyramid = build_corr_pyramid(fmap1, fmap2)

        ctx = MultiBasicEncoder(downsample=self.downsample, name="cnet")(x1)
        nets = tuple(nn.tanh(h) for h, _ in ctx)
        inps = []
        for si, (_, c) in enumerate(ctx):
            zqr = nn.Conv(HIDDEN * 3, (3, 3), padding=1,
                          name=f"context_zqr_{si}")(nn.relu(c))
            inps.append(tuple(jnp.split(zqr, 3, axis=-1)))
        inps = tuple(inps)

        n, h, w, _ = fmap1.shape
        xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :],
                              (n, h, w))
        update = UpdateBlock(factor=2 ** self.downsample, name="update")

        def step(nets, dx):
            corr = lookup_corr(pyramid, xs + dx)
            flow = jnp.stack([dx, jnp.zeros_like(dx)], axis=-1)
            nets, mask, delta = update(nets, inps, corr, flow)
            dx = dx + delta[..., 0]  # epipolar projection: dy forced to 0
            return nets, dx, mask

        # First iteration outside the scan (creates the update-block params
        # under flax's init trace); the remaining iterations reuse them in
        # one compiled lax.scan body.
        nets, dx, mask = step(nets, jnp.zeros_like(xs))
        if self.iters > 1:
            def body(carry, _):
                nets, dx = carry
                nets, dx, mask = step(nets, dx)
                return (nets, dx), mask

            (nets, dx), masks = jax.lax.scan(body, (nets, dx), None,
                                             length=self.iters - 1)
            mask = jax.tree.map(lambda m: m[-1], masks)

        flow = jnp.stack([dx, jnp.zeros_like(dx)], axis=-1)
        up = convex_upsample(flow, mask, 2 ** self.downsample)
        return up[..., 0]  # (N, H, W) horizontal disparity flow


def depth_from_disparity(disp, fx=882.0850326, baseline=5.8513759749420302e-3,
                         cx1=445.06146749, cx2=445.061467):
    """RAFT disparity-flow -> depth (raft_core/utils/utils.py:96-113)."""
    return (fx * baseline) / (-disp + (cx2 - cx1))


class InputPadder:
    """Edge-replicate pad images so H/W are divisible by ``divis_by``.

    Parity: InputPadder (depth/raft_core/utils/utils.py:7-26).  Operates on
    NHWC arrays (this package's image layout; the reference pads NCHW).
    'sintel' mode splits the padding around both edges; otherwise rows pad
    at the bottom only.  Pad amounts are static Python ints, so padded
    shapes stay jit-constant.
    """

    def __init__(self, dims, mode: str = "sintel", divis_by: int = 8):
        self.ht, self.wd = int(dims[-3]), int(dims[-2])
        pad_ht = (((self.ht // divis_by) + 1) * divis_by - self.ht) % divis_by
        pad_wd = (((self.wd // divis_by) + 1) * divis_by - self.wd) % divis_by
        if mode == "sintel":
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2)
        else:
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)

    def pad(self, *inputs):
        l, r, t, b = self._pad
        out = [jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
               for x in inputs]
        return out if len(out) > 1 else out[0]

    def unpad(self, x):
        l, r, t, b = self._pad
        ht, wd = x.shape[-3], x.shape[-2]
        return x[..., t:ht - b, l:wd - r, :]


def convert_torch_raft_stereo(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference RAFT-Stereo checkpoint -> RAFTStereo flax params.

    Key layout: raft_core/raft_stereo.py:22-32 with the SuPer defaults
    (options.py:120-148): fnet (instance norm, no norm params), cnet
    ('batch' context_norm -> running-stats _BN), context_zqr_convs, and
    update_block {gru08/16/32, motion encoder, flow_head, mask}.  Checkpoints
    saved through nn.DataParallel carry a 'module.' prefix
    (shared_functions.py:74-82) -- stripped here.  Output parity vs the
    torch model is tested in tests/test_raft_parity.py.
    """
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

    def res_block(t, with_bn):
        entry = {"conv1": conv(t + ".conv1"), "conv2": conv(t + ".conv2")}
        if with_bn:
            entry["norm1"] = bn(t + ".norm1")
            entry["norm2"] = bn(t + ".norm2")
        if t + ".downsample.0.weight" in sd:
            entry["downsample"] = conv(t + ".downsample.0")
            if with_bn:
                entry["norm3"] = bn(t + ".norm3")
        return entry

    fnet = {"conv1": conv("fnet.conv1"), "conv2": conv("fnet.conv2")}
    for li in range(1, 4):
        for bi in range(2):
            fnet[f"layer{li}_{bi}"] = res_block(f"fnet.layer{li}.{bi}",
                                                with_bn=False)

    cnet = {"conv1": conv("cnet.conv1"), "norm1": bn("cnet.norm1")}
    for li in range(1, 6):
        for bi in range(2):
            cnet[f"layer{li}_{bi}"] = res_block(f"cnet.layer{li}.{bi}",
                                                with_bn=True)
    # outputs08/16 are [hidden, context] Sequential(ResidualBlock, Conv)
    # pairs; outputs32 plain convs (extractor.py:228-250).
    for si, scale in enumerate(("08", "16")):
        for oi, hc in enumerate(("h", "c")):
            cnet[f"out{si}_{hc}_res"] = res_block(
                f"cnet.outputs{scale}.{oi}.0", with_bn=True)
            cnet[f"out{si}_{hc}"] = conv(f"cnet.outputs{scale}.{oi}.1")
    cnet["out2_h"] = conv("cnet.outputs32.0")
    cnet["out2_c"] = conv("cnet.outputs32.1")

    update = {
        "encoder": {name: conv(f"update_block.encoder.{name}")
                    for name in ("convc1", "convc2", "convf1", "convf2",
                                 "conv")},
        "flow_head_1": conv("update_block.flow_head.conv1"),
        "flow_head_2": conv("update_block.flow_head.conv2"),
        "mask_1": conv("update_block.mask.0"),
        "mask_2": conv("update_block.mask.2"),
    }
    for g in ("gru08", "gru16", "gru32"):
        update[g] = {name: conv(f"update_block.{g}.{name}")
                     for name in ("convz", "convr", "convq")}

    params = {"fnet": fnet, "cnet": cnet, "update": update}
    for i in range(3):
        params[f"context_zqr_{i}"] = conv(f"context_zqr_convs.{i}")
    return {"params": params}
