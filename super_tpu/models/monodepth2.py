"""Monodepth2 depth network (flax, inference parity).

Reference: depth/monodepth2/depth_decoder.py:80-129 (U-Net decoder with
nearest upsampling, reflection-padded 3x3 convs, ELU, sigmoid disparity at
4 scales) on the ResNet encoder pyramid; plus the flip post-processing
(utils/data_loader.py:612-623) and disp -> depth conversion
(layers.py:16-25).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_tpu.core.preprocess import disp_to_depth  # noqa: F401 (re-export)
from super_tpu.models.resnet import ResNetEncoder, convert_torch_resnet

NUM_CH_DEC = (16, 32, 64, 128, 256)


def _reflect_conv3(x, features, name):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return nn.Conv(features, (3, 3), padding="VALID", name=name)(x)


def _upsample2(x):
    n, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class DepthDecoder(nn.Module):
    """U-Net depth decoder; input = encoder pyramid, output = disparity maps
    at scales {0..3} (dict scale -> (N, H/2^s, W/2^s, 1))."""

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    scales: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        x = features[-1]
        outputs = {}
        for i in range(4, -1, -1):
            x = nn.elu(_reflect_conv3(x, NUM_CH_DEC[i], f"upconv_{i}_0"))
            x = _upsample2(x)
            if i > 0:
                skip = features[i - 1]
                x = jnp.concatenate(
                    [x[:, :skip.shape[1], :skip.shape[2]], skip], axis=-1)
            x = nn.elu(_reflect_conv3(x, NUM_CH_DEC[i], f"upconv_{i}_1"))
            if i in self.scales:
                outputs[i] = nn.sigmoid(_reflect_conv3(x, 1, f"dispconv_{i}"))
        return outputs


class Monodepth2(nn.Module):
    """Encoder + decoder; input (N, H, W, 3) in [0, 1] -> full-res disparity."""

    num_layers: int = 18

    def setup(self):
        self.encoder = ResNetEncoder(num_layers=self.num_layers,
                                     normalize="monodepth2")
        widths = (64, 64, 128, 256, 512) if self.num_layers <= 34 else \
            (64, 256, 512, 1024, 2048)
        self.decoder = DepthDecoder(num_ch_enc=widths)

    def __call__(self, x):
        return self.decoder(self.encoder(x))


def batch_post_process_disparity(l_disp, r_disp):
    """Monodepth-v1 flip blending (utils/data_loader.py:612-623).

    l_disp, r_disp: (N, H, W)."""
    _, h, w = l_disp.shape
    m_disp = 0.5 * (l_disp + r_disp)
    l = jnp.arange(w, dtype=l_disp.dtype)[None, None, :] / w
    l_mask = 1.0 - jnp.clip(20 * (l - 0.05), 0.0, 1.0)
    l_mask = jnp.broadcast_to(l_mask, l_disp.shape)
    r_mask = l_mask[:, :, ::-1]
    return r_mask * l_disp + l_mask * r_disp + (1.0 - l_mask - r_mask) * m_disp


def predict_depth(params, model: Monodepth2, image_chw, min_depth: float,
                  max_depth: float, post_process: bool = True,
                  filter_kernel: int = 0):
    """pred_depth parity for monodepth2 (utils/data_loader.py:274-307).

    ``filter_kernel > 0`` Gaussian-blurs the disparity before inverting to
    depth (``--depth_filter_kernel_size``, data_loader.py:292-298: after the
    flip blend in the post_process branch, on the raw sigmoid disp before
    disp_to_depth otherwise).

    Args:
      image_chw: (3, H, W) in [0, 1].
    Returns: (disp (H, W), depth (H, W)).
    """
    from super_tpu.ops.blur import gaussian_blur

    img = image_chw.transpose(1, 2, 0)[None]          # NHWC
    if post_process:
        batch = jnp.concatenate([img, img[:, :, ::-1]], axis=0)
        disp = model.apply(params, batch)[0][..., 0]  # (2, H, W)
        disp, _ = disp_to_depth(disp, min_depth, max_depth)
        disp = batch_post_process_disparity(disp[:1], disp[1:, :, ::-1])[0]
        if filter_kernel > 0:
            disp = gaussian_blur(disp, kernel=filter_kernel)
        depth = 1.0 / disp
    else:
        disp = model.apply(params, img)[0][0, ..., 0]
        if filter_kernel > 0:
            disp = gaussian_blur(disp, kernel=filter_kernel)
        disp, depth = disp_to_depth(disp, min_depth, max_depth)
    return disp, depth


def convert_torch_monodepth2(encoder_sd: Dict[str, Any],
                             decoder_sd: Dict[str, Any], num_layers: int):
    """Torch monodepth2 checkpoints ('encoder.pth' + 'depth.pth') -> flax
    params for :class:`Monodepth2`.

    Decoder key layout: the torch module stores convs in a ModuleList
    ordered [(upconv 4..0 x2), (dispconv 0..3)] (depth_decoder.py:90-107).
    """
    import numpy as np

    enc = convert_torch_resnet(encoder_sd, num_layers)["params"]

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    def conv(idx):
        w = to_np(decoder_sd[f"decoder.{idx}.conv.conv.weight"])
        b = to_np(decoder_sd[f"decoder.{idx}.conv.conv.bias"])
        return w.transpose(2, 3, 1, 0), b

    def dispconv(idx):
        w = to_np(decoder_sd[f"decoder.{idx}.conv.weight"])
        b = to_np(decoder_sd[f"decoder.{idx}.conv.bias"])
        return w.transpose(2, 3, 1, 0), b

    dec = {}
    mi = 0
    for i in range(4, -1, -1):
        for j in range(2):
            w, b = conv(mi)
            dec[f"upconv_{i}_{j}"] = {"kernel": jnp.asarray(w),
                                      "bias": jnp.asarray(b)}
            mi += 1
    for s in range(4):
        w, b = dispconv(mi)
        dec[f"dispconv_{s}"] = {"kernel": jnp.asarray(w),
                                "bias": jnp.asarray(b)}
        mi += 1

    return {"params": {"encoder": enc, "decoder": dec}}
