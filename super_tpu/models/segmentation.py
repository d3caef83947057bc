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


def convert_torch_smp_deeplab(state_dict: Dict[str, Any],
                              num_layers: int = 18) -> Dict[str, Any]:
    """smp.DeepLabV3Plus checkpoint -> DeepLabV3Plus flax params.

    Key layout follows segmentation_models_pytorch: 'encoder.*' (torchvision
    resnet), 'decoder.aspp.0.convs.{0..4}' (1x1 / three separable atrous /
    pooling branches), 'decoder.aspp.{1,2}' (post-ASPP separable conv + BN),
    'decoder.block1/block2', 'segmentation_head.0'.  The reference loads
    these via checkpoint['state_dict'] (seg/inference.py:102-128).
    """
    import numpy as np

    sd = {}
    for k, v in state_dict.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = np.asarray(v.detach().cpu().numpy()
                           if hasattr(v, "detach") else v)

    def conv(key, bias=False):
        out = {"kernel": jnp.asarray(sd[key + ".weight"].transpose(2, 3, 1, 0))}
        if bias and key + ".bias" in sd:
            out["bias"] = jnp.asarray(sd[key + ".bias"])
        return out

    def bn(key):
        return {
            "scale": jnp.asarray(sd[key + ".weight"]),
            "bias": jnp.asarray(sd[key + ".bias"]),
            "mean": jnp.asarray(sd[key + ".running_mean"]),
            "var": jnp.asarray(sd[key + ".running_var"]),
        }

    def sep(key):
        return {"dw": conv(key + ".0"), "pw": conv(key + ".1")}

    encoder = convert_torch_resnet(
        {k[len("encoder."):]: v for k, v in sd.items()
         if k.startswith("encoder.")}, num_layers)["params"]

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


class UNet(nn.Module):
    """U-Net segmentation head on the ResNet pyramid (the reference's smp
    'unet' arch option, shared_functions.py:97-123).  Decoder: upsample,
    concat skip, two 3x3 convs per level."""

    num_classes: int = 3
    num_layers: int = 18

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        feats = ResNetEncoder(num_layers=self.num_layers,
                              normalize="imagenet", name="encoder")(x)
        dec_ch = (256, 128, 64, 32)
        y = feats[-1]
        for i, skip in enumerate(reversed(feats[:-1])):
            y = jax.image.resize(y, (n, skip.shape[1], skip.shape[2],
                                     y.shape[-1]), "bilinear")
            y = jnp.concatenate([y, skip], axis=-1)
            y = nn.relu(nn.Conv(dec_ch[i], (3, 3), padding=1,
                                name=f"dec{i}_1")(y))
            y = nn.relu(nn.Conv(dec_ch[i], (3, 3), padding=1,
                                name=f"dec{i}_2")(y))
        y = jax.image.resize(y, (n, h, w, y.shape[-1]), "bilinear")
        y = nn.relu(nn.Conv(16, (3, 3), padding=1, name="final_1")(y))
        y = nn.Conv(self.num_classes, (1, 1), name="classifier")(y)
        return y.transpose(0, 3, 1, 2)


def build_seg_model(arch: str, num_classes: int, num_layers: int = 18):
    """Segmentation architecture factory ('deeplabv3plus' | 'unet')."""
    if arch in ("unet", "unetplusplus", "manet"):
        # unet++ / manet collapse to the U-Net topology here (dense skips /
        # attention gates are fine-tuning refinements, same interface).
        return UNet(num_classes=num_classes, num_layers=num_layers)
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
