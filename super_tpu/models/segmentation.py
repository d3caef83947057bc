"""Semantic segmentation network: DeepLabV3+ on a ResNet encoder (flax).

Reference: the segmentation model factory builds DeepLabV3+/U-Net/U-Net++/
MAnet from segmentation_models_pytorch (utils/shared_functions.py:97-123);
the Semantic-SuPer trials use DeepLabV3+ checkpoints.  The DeepLabV3Plus
here mirrors smp's architecture layer-for-layer (dilated-OS16 encoder,
separable atrous ASPP with batch norms, 48-ch high-res skip, 3x3 head +
4x align-corners upsampling) so ``convert_torch_smp_deeplab`` can load the
reference's checkpoints exactly (seg/inference.py:102-128); output parity
vs a torch build of the same decoder is tested in tests/test_seg_parity.py.
Also the inference helper matching ``generate_mask`` + ``pred_seg``
(seg/inference.py:131-139, utils/data_loader.py:319-331): softmax scores,
11x11 average smoothing, argmax labels.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_tpu.models.resnet import _BN, ResNetEncoder, convert_torch_resnet


def _upsample_align(x, factor: int):
    """UpsamplingBilinear2d(scale_factor=factor): align_corners=True, as two
    separable matmuls (smp decoder.up / segmentation head upsampling)."""
    from super_tpu.models.raft_stereo import _axis_weights

    n, h, w, _ = x.shape
    wy = _axis_weights(h * factor, h, x.dtype)
    wx = _axis_weights(w * factor, w, x.dtype)
    return jnp.einsum("oh,nhwc,pw->nopc", wy, x, wx)


class _SepConv(nn.Module):
    """smp SeparableConv2d: depthwise 3x3 + pointwise 1x1, both bias-free."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        d = self.dilation
        x = nn.Conv(cin, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), feature_group_count=cin,
                    use_bias=False, name="dw")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False, name="pw")(x)


class ASPP(nn.Module):
    """smp separable ASPP (rates 12/24/36 at OS16) with inference BNs."""

    features: int = 256
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x):
        outs = [nn.relu(_BN(name="b0_bn")(nn.Conv(
            self.features, (1, 1), use_bias=False, name="b0_conv")(x)))]
        for i, r in enumerate(self.rates):
            y = _SepConv(self.features, dilation=r, name=f"b{i+1}_sep")(x)
            outs.append(nn.relu(_BN(name=f"b{i+1}_bn")(y)))
        # Image-level pooling branch (1x1 pooled; its bilinear re-expansion
        # is a broadcast).
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = nn.relu(_BN(name="pool_bn")(nn.Conv(
            self.features, (1, 1), use_bias=False, name="pool_conv")(gp)))
        outs.append(jnp.broadcast_to(gp, outs[0].shape[:3] + (self.features,)))
        x = jnp.concatenate(outs, axis=-1)
        x = nn.relu(_BN(name="project_bn")(nn.Conv(
            self.features, (1, 1), use_bias=False, name="project_conv")(x)))
        return x  # smp's trailing Dropout(0.5) is the identity at inference


class DeepLabV3Plus(nn.Module):
    """Input (N, H, W, 3) in [0, 1] (imagenet normalization applied inside,
    matching the reference's external NormalizeBatch, seg/inference.py:84-99);
    output (N, num_classes, H, W) logits (channel-first, reference seg_conf
    layout).  Architecture == smp.DeepLabV3Plus(encoder_name=resnetN)."""

    num_classes: int = 3
    num_layers: int = 18

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        feats = ResNetEncoder(num_layers=self.num_layers,
                              normalize="imagenet", output_stride=16,
                              name="encoder")(x)
        y = ASPP(name="aspp")(feats[-1])          # 1/16 (dilated stage 5)
        y = _SepConv(256, name="aspp_sep")(y)
        y = nn.relu(_BN(name="aspp_bn")(y))
        y = _upsample_align(y, 4)                 # -> 1/4
        high = nn.relu(_BN(name="block1_bn")(nn.Conv(
            48, (1, 1), use_bias=False, name="block1_conv")(feats[1])))
        y = jnp.concatenate([y, high], axis=-1)
        y = _SepConv(256, name="block2_sep")(y)
        y = nn.relu(_BN(name="block2_bn")(y))
        y = nn.Conv(self.num_classes, (3, 3), padding=1, name="head")(y)
        y = _upsample_align(y, 4)                 # -> full resolution
        return y.transpose(0, 3, 1, 2)


def _normalize_sd(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip DataParallel/'model.' prefixes; tensors -> numpy."""
    import numpy as np

    sd = {}
    for k, v in state_dict.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = np.asarray(v.detach().cpu().numpy()
                           if hasattr(v, "detach") else v)
    return sd


def _conv_p(sd, key, bias=False):
    out = {"kernel": jnp.asarray(sd[key + ".weight"].transpose(2, 3, 1, 0))}
    if bias and key + ".bias" in sd:
        out["bias"] = jnp.asarray(sd[key + ".bias"])
    return out


def _bn_p(sd, key):
    return {
        "scale": jnp.asarray(sd[key + ".weight"]),
        "bias": jnp.asarray(sd[key + ".bias"]),
        "mean": jnp.asarray(sd[key + ".running_mean"]),
        "var": jnp.asarray(sd[key + ".running_var"]),
    }


def _encoder_p(sd, num_layers):
    return convert_torch_resnet(
        {k[len("encoder."):]: v for k, v in sd.items()
         if k.startswith("encoder.")}, num_layers)["params"]


def _cbr_p(sd, key):
    """Conv2dReLU (Sequential conv, bn) -> _ConvBnReLU params."""
    return {"conv": _conv_p(sd, key + ".0"), "bn": _bn_p(sd, key + ".1")}


def _decoder_block_p(sd, key):
    return {"conv1": _cbr_p(sd, key + ".conv1"),
            "conv2": _cbr_p(sd, key + ".conv2")}


def convert_torch_smp_deeplab(state_dict: Dict[str, Any],
                              num_layers: int = 18) -> Dict[str, Any]:
    """smp.DeepLabV3Plus checkpoint -> DeepLabV3Plus flax params.

    Key layout follows segmentation_models_pytorch: 'encoder.*' (torchvision
    resnet), 'decoder.aspp.0.convs.{0..4}' (1x1 / three separable atrous /
    pooling branches), 'decoder.aspp.{1,2}' (post-ASPP separable conv + BN),
    'decoder.block1/block2', 'segmentation_head.0'.  The reference loads
    these via checkpoint['state_dict'] (seg/inference.py:102-128).
    """
    sd = _normalize_sd(state_dict)

    def conv(key, bias=False):
        return _conv_p(sd, key, bias)

    bn = lambda key: _bn_p(sd, key)  # noqa: E731

    def sep(key):
        return {"dw": conv(key + ".0"), "pw": conv(key + ".1")}

    encoder = _encoder_p(sd, num_layers)

    aspp = {"b0_conv": conv("decoder.aspp.0.convs.0.0"),
            "b0_bn": bn("decoder.aspp.0.convs.0.1")}
    for i in range(1, 4):
        aspp[f"b{i}_sep"] = sep(f"decoder.aspp.0.convs.{i}.0")
        aspp[f"b{i}_bn"] = bn(f"decoder.aspp.0.convs.{i}.1")
    aspp["pool_conv"] = conv("decoder.aspp.0.convs.4.1")
    aspp["pool_bn"] = bn("decoder.aspp.0.convs.4.2")
    aspp["project_conv"] = conv("decoder.aspp.0.project.0")
    aspp["project_bn"] = bn("decoder.aspp.0.project.1")

    params = {
        "encoder": encoder,
        "aspp": aspp,
        "aspp_sep": sep("decoder.aspp.1"),
        "aspp_bn": bn("decoder.aspp.2"),
        "block1_conv": conv("decoder.block1.0"),
        "block1_bn": bn("decoder.block1.1"),
        "block2_sep": sep("decoder.block2.0"),
        "block2_bn": bn("decoder.block2.1"),
        "head": conv("segmentation_head.0", bias=True),
    }
    return {"params": params}


def _up2(x):
    """F.interpolate(scale_factor=2, mode='nearest'): pixel-repeat."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _ConvBnReLU(nn.Module):
    """smp md.Conv2dReLU(use_batchnorm=True): bias-free conv + BN + ReLU."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        p = k // 2
        x = nn.Conv(self.features, (k, k), padding=((p, p), (p, p)),
                    use_bias=False, name="conv")(x)
        return nn.relu(_BN(name="bn")(x))


class _DecoderBlock(nn.Module):
    """smp unet DecoderBlock: nearest 2x upsample, concat skip, two
    Conv2dReLUs (attention_type=None -> the attention gates are identity)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = _up2(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = _ConvBnReLU(self.features, name="conv1")(x)
        return _ConvBnReLU(self.features, name="conv2")(x)


class UNet(nn.Module):
    """smp.Unet(encoder_name=resnetN): stride-32 encoder, five decoder
    blocks (256/128/64/32/16), 3x3 segmentation head at full resolution
    (the reference's 'unet' arch option, shared_functions.py:104-109).

    Input (N, H, W, 3) in [0, 1] (imagenet normalization inside); output
    (N, num_classes, H, W) logits, matching DeepLabV3Plus."""

    num_classes: int = 3
    num_layers: int = 18
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, x):
        feats = ResNetEncoder(num_layers=self.num_layers,
                              normalize="imagenet", name="encoder")(x)
        # smp skips: deepest-first, the raw input level contributes none.
        skips = feats[-2::-1] + [None]
        y = feats[-1]
        for i, ch in enumerate(self.decoder_channels):
            y = _DecoderBlock(ch, name=f"block{i}")(y, skips[i])
        y = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                    name="head")(y)
        return y.transpose(0, 3, 1, 2)


class UnetPlusPlus(nn.Module):
    """smp.UnetPlusPlus(encoder_name=resnetN): the UNet++ dense-skip grid
    (the reference's 'unet++' arch option, shared_functions.py:111-116).

    Node x_{d}_{l} refines depth level d at dense layer l; each node
    upsamples its predecessor x_{d}_{l-1} and concatenates every same-level
    node x_{d+1..l}_{l} plus the encoder skip.  Block naming and channel
    widths follow smp's UnetPlusPlusDecoder so converted checkpoints map
    key-for-key."""

    num_classes: int = 3
    num_layers: int = 18
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, x):
        feats = ResNetEncoder(num_layers=self.num_layers,
                              normalize="imagenet", name="encoder")(x)
        f = feats[::-1]  # head first: [1/32, 1/16, 1/8, 1/4, 1/2]
        depth = len(self.decoder_channels) - 1
        skip_ch = [fi.shape[-1] for fi in f[1:]] + [0]
        out_ch = list(self.decoder_channels)

        def block(d, layer, ch):
            return _DecoderBlock(ch, name=f"x_{d}_{layer}")

        dense = {}
        for layer in range(depth):
            for d in range(depth - layer):
                li = d + layer
                if layer == 0:
                    ch = out_ch[0] if d == 0 else skip_ch[d]
                    dense[(d, li)] = block(d, li, ch)(f[d], f[d + 1])
                else:
                    ch = out_ch[layer] if d == 0 else skip_ch[li]
                    cat = jnp.concatenate(
                        [dense[(i, li)] for i in range(d + 1, li + 1)]
                        + [f[li + 1]], axis=-1)
                    dense[(d, li)] = block(d, li, ch)(dense[(d, li - 1)], cat)
        y = block(0, depth, out_ch[-1])(dense[(0, depth - 1)], None)
        y = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                    name="head")(y)
        return y.transpose(0, 3, 1, 2)


class _PAB(nn.Module):
    """MAnet Position-wise Attention Block (full spatial self-attention on
    the encoder head)."""

    pab_channels: int = 64

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        top = nn.Conv(self.pab_channels, (1, 1), name="top_conv")(x)
        center = nn.Conv(self.pab_channels, (1, 1), name="center_conv")(x)
        bottom = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                         name="bottom_conv")(x)
        att = jnp.einsum("npc,nqc->npq", center.reshape(n, h * w, -1),
                         top.reshape(n, h * w, -1))
        # smp softmaxes the fully flattened (hw*hw) map, not per row.
        att = jax.nn.softmax(att.reshape(n, -1), axis=-1).reshape(
            n, h * w, h * w)
        sp = jnp.einsum("npq,nqc->npc", att, bottom.reshape(n, h * w, c))
        x = x + sp.reshape(n, h, w, c)
        return nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                       name="out_conv")(x)


class _MFAB(nn.Module):
    """MAnet Multi-scale Fusion Attention Block: squeeze-excite gates on
    both the upsampled deep path and the skip, summed, applied to the deep
    path before the concat + double conv."""

    skip_features: int
    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, skip):
        x = _ConvBnReLU(x.shape[-1], name="hl0")(x)
        x = _ConvBnReLU(self.skip_features, kernel=1, name="hl1")(x)
        x = _up2(x)
        red = max(1, self.skip_features // self.reduction)

        def se(y, name):
            g = jnp.mean(y, axis=(1, 2), keepdims=True)
            g = nn.relu(nn.Conv(red, (1, 1), name=f"{name}_fc1")(g))
            return nn.sigmoid(nn.Conv(self.skip_features, (1, 1),
                                      name=f"{name}_fc2")(g))

        gate = se(x, "se_hl") + se(skip, "se_ll")
        x = jnp.concatenate([x * gate, skip], axis=-1)
        x = _ConvBnReLU(self.features, name="conv1")(x)
        return _ConvBnReLU(self.features, name="conv2")(x)


class MAnet(nn.Module):
    """smp.MAnet(encoder_name=resnetN) (the reference's 'manet' arch
    option, shared_functions.py:118-123): PAB self-attention center, MFAB
    fusion blocks at every skip level, plain DecoderBlock for the final
    skip-free upsample."""

    num_classes: int = 3
    num_layers: int = 18
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, x):
        feats = ResNetEncoder(num_layers=self.num_layers,
                              normalize="imagenet", name="encoder")(x)
        skips = feats[-2::-1] + [None]
        y = _PAB(name="center")(feats[-1])
        for i, ch in enumerate(self.decoder_channels):
            if skips[i] is not None:
                y = _MFAB(skip_features=skips[i].shape[-1], features=ch,
                          name=f"block{i}")(y, skips[i])
            else:
                y = _DecoderBlock(ch, name=f"block{i}")(y, None)
        y = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                    name="head")(y)
        return y.transpose(0, 3, 1, 2)


def convert_torch_smp_unet(state_dict: Dict[str, Any],
                           num_layers: int = 18) -> Dict[str, Any]:
    """smp.Unet checkpoint -> UNet flax params.

    Key layout: 'encoder.*', 'decoder.blocks.{0..4}.conv{1,2}.{0,1}'
    (Conv2dReLU = Sequential(conv, bn, relu)), 'segmentation_head.0'."""
    sd = _normalize_sd(state_dict)
    params = {"encoder": _encoder_p(sd, num_layers),
              "head": _conv_p(sd, "segmentation_head.0", bias=True)}
    for i in range(5):
        params[f"block{i}"] = _decoder_block_p(sd, f"decoder.blocks.{i}")
    return {"params": params}


def convert_torch_smp_unetplusplus(state_dict: Dict[str, Any],
                                   num_layers: int = 18) -> Dict[str, Any]:
    """smp.UnetPlusPlus checkpoint -> UnetPlusPlus flax params.

    Key layout: 'decoder.blocks.x_{d}_{l}.conv{1,2}.{0,1}' (ModuleDict of
    DecoderBlocks over the dense grid), 'segmentation_head.0'."""
    sd = _normalize_sd(state_dict)
    params = {"encoder": _encoder_p(sd, num_layers),
              "head": _conv_p(sd, "segmentation_head.0", bias=True)}
    depth = 4
    names = [(d, layer) for layer in range(depth)
             for d in range(layer + 1)] + [(0, depth)]
    for d, layer in names:
        params[f"x_{d}_{layer}"] = _decoder_block_p(
            sd, f"decoder.blocks.x_{d}_{layer}")
    return {"params": params}


def convert_torch_smp_manet(state_dict: Dict[str, Any],
                            num_layers: int = 18) -> Dict[str, Any]:
    """smp.MAnet checkpoint -> MAnet flax params.

    Key layout: 'decoder.center.{top,center,bottom,out}_conv' (PAB),
    'decoder.blocks.{0..3}' MFAB ('hl_conv.{0,1}.{0,1}', 'SE_hl.{1,3}',
    'SE_ll.{1,3}', 'conv{1,2}.{0,1}'), 'decoder.blocks.4' plain
    DecoderBlock, 'segmentation_head.0'."""
    sd = _normalize_sd(state_dict)
    params = {"encoder": _encoder_p(sd, num_layers),
              "head": _conv_p(sd, "segmentation_head.0", bias=True)}
    params["center"] = {
        name: _conv_p(sd, f"decoder.center.{name}", bias=True)
        for name in ("top_conv", "center_conv", "bottom_conv", "out_conv")}
    for i in range(4):
        key = f"decoder.blocks.{i}"
        params[f"block{i}"] = {
            "hl0": _cbr_p(sd, key + ".hl_conv.0"),
            "hl1": _cbr_p(sd, key + ".hl_conv.1"),
            "se_hl_fc1": _conv_p(sd, key + ".SE_hl.1", bias=True),
            "se_hl_fc2": _conv_p(sd, key + ".SE_hl.3", bias=True),
            "se_ll_fc1": _conv_p(sd, key + ".SE_ll.1", bias=True),
            "se_ll_fc2": _conv_p(sd, key + ".SE_ll.3", bias=True),
            "conv1": _cbr_p(sd, key + ".conv1"),
            "conv2": _cbr_p(sd, key + ".conv2"),
        }
    params["block4"] = _decoder_block_p(sd, "decoder.blocks.4")
    return {"params": params}


def build_seg_model(arch: str, num_classes: int, num_layers: int = 18):
    """Segmentation architecture factory, mirroring the reference's
    opt.seg_model switch (shared_functions.py:97-123): 'deeplabv3plus' |
    'unet' | 'unet++'/'unetplusplus' | 'manet'."""
    if arch == "unet":
        return UNet(num_classes=num_classes, num_layers=num_layers)
    if arch in ("unet++", "unetplusplus"):
        return UnetPlusPlus(num_classes=num_classes, num_layers=num_layers)
    if arch == "manet":
        return MAnet(num_classes=num_classes, num_layers=num_layers)
    return DeepLabV3Plus(num_classes=num_classes, num_layers=num_layers)


def predict_seg(params, model, image_chw, hard_seg: bool = False):
    """pred_seg parity (utils/data_loader.py:319-331): softmax -> 11x11
    average smoothing -> argmax labels (+ optional one-hot confidences).

    Returns (seg (H, W) int32, seg_conf (C, H, W))."""
    logits = model.apply(params, image_chw.transpose(1, 2, 0)[None])[0]
    conf = jax.nn.softmax(logits, axis=0)
    pad = 5
    smoothed = jax.lax.reduce_window(
        conf, 0.0, jax.lax.add, (1, 11, 11), (1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad)])
    counts = jax.lax.reduce_window(
        jnp.ones_like(conf), 0.0, jax.lax.add, (1, 11, 11), (1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad)])
    smoothed = smoothed / counts
    seg = jnp.argmax(smoothed, axis=0).astype(jnp.int32)
    if hard_seg:
        conf_out = jax.nn.one_hot(seg, logits.shape[0], axis=0)
    else:
        conf_out = smoothed
    return seg, conf_out
