"""Semantic segmentation network: DeepLabV3+ on a ResNet encoder (flax).

Reference: the segmentation model factory builds DeepLabV3+/U-Net/U-Net++/
MAnet from segmentation_models_pytorch (utils/shared_functions.py:97-123);
the Semantic-SuPer trials use DeepLabV3+ checkpoints.  This is the flax
counterpart (ASPP at output stride 16, low-level 1/4 skip through a 48-ch
projection), plus the inference helper matching ``generate_mask`` +
``pred_seg`` (seg/inference.py:131-139, utils/data_loader.py:319-331):
softmax scores, 11x11 average smoothing, argmax labels.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_tpu.models.resnet import ResNetEncoder


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (rates 12/24/36 at OS16)."""

    features: int = 256
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x):
        outs = [nn.relu(nn.Conv(self.features, (1, 1), name="b0")(x))]
        for i, r in enumerate(self.rates):
            outs.append(nn.relu(nn.Conv(
                self.features, (3, 3), kernel_dilation=(r, r),
                padding=((r, r), (r, r)), name=f"b{i+1}")(x)))
        # Image-level pooling branch.
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = nn.relu(nn.Conv(self.features, (1, 1), name="bpool")(gp))
        gp = jnp.broadcast_to(gp, outs[0].shape[:3] + (self.features,))
        outs.append(gp)
        x = jnp.concatenate(outs, axis=-1)
        return nn.relu(nn.Conv(self.features, (1, 1), name="project")(x))


class DeepLabV3Plus(nn.Module):
    """Input (N, H, W, 3) in [0, 1]; output (N, num_classes, H, W) logits
    (channel-first output to match the reference's seg_conf layout)."""

    num_classes: int = 3
    num_layers: int = 18

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        feats = ResNetEncoder(num_layers=self.num_layers,
                              normalize="imagenet", name="encoder")(x)
        low = feats[1]          # 1/4 resolution
        high = feats[4]         # 1/32; resize to 1/16 for OS16 behavior
        high = jax.image.resize(
            high, (n, (h + 15) // 16, (w + 15) // 16, high.shape[-1]),
            "bilinear")
        y = ASPP(name="aspp")(high)
        y = jax.image.resize(y, (n, low.shape[1], low.shape[2], y.shape[-1]),
                             "bilinear")
        lowp = nn.relu(nn.Conv(48, (1, 1), name="low_proj")(low))
        y = jnp.concatenate([y, lowp], axis=-1)
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, name="refine1")(y))
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, name="refine2")(y))
        y = nn.Conv(self.num_classes, (1, 1), name="classifier")(y)
        y = jax.image.resize(y, (n, h, w, self.num_classes), "bilinear")
        return y.transpose(0, 3, 1, 2)


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
