"""ResNet feature-pyramid encoder (flax, inference parity with torchvision).

The reference's depth and segmentation nets are built on torchvision
ResNets (depth/monodepth2/resnet_encoder.py:62-98).  This is the flax
equivalent returning the 5-level pyramid [relu1, layer1..layer4]; BatchNorm
runs in inference mode on loaded running statistics.

Layout: NHWC internally (TPU-friendly); weight converters accept torch
state dicts (NCHW kernels).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

_LAYERS = {
    18: ([2, 2, 2, 2], "basic"),
    34: ([3, 4, 6, 3], "basic"),
    50: ([3, 4, 6, 3], "bottleneck"),
    101: ([3, 4, 23, 3], "bottleneck"),
    152: ([3, 8, 36, 3], "bottleneck"),
}


class _BN(nn.Module):
    """Inference-mode batch norm over loaded running stats."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale / jnp.sqrt(var + 1e-5)
        return x * inv + (bias - mean * inv)


def _conv(x, features, kernel, stride=1, name=None, dilation=1):
    pad = (kernel // 2) * dilation
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=False,
                   kernel_dilation=(dilation, dilation), name=name)(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(x, self.features, 3, self.stride, name="conv1",
                    dilation=self.dilation)
        out = _BN(name="bn1")(out)
        out = nn.relu(out)
        out = _conv(out, self.features, 3, 1, name="conv2",
                    dilation=self.dilation)
        out = _BN(name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(x)
            identity = _BN(name="down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int          # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.relu(_BN(name="bn1")(_conv(x, self.features, 1, 1, "conv1")))
        out = nn.relu(_BN(name="bn2")(
            _conv(out, self.features, 3, self.stride, "conv2",
                  dilation=self.dilation)))
        out = _BN(name="bn3")(_conv(out, 4 * self.features, 1, 1, "conv3"))
        if self.downsample:
            identity = nn.Conv(4 * self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(x)
            identity = _BN(name="down_bn")(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """5-level feature pyramid; input (N, H, W, 3) in [0, 1].

    ``normalize='monodepth2'`` applies the (x - 0.45)/0.225 input scaling of
    the reference encoder (resnet_encoder.py:87)."""

    num_layers: int = 18
    normalize: str = "monodepth2"
    # 32 (torchvision default) or 16: the last stage trades its stride for
    # dilation 2 in EVERY conv of the stage, matching smp's make_dilated
    # (segmentation encoders at output stride 16; weights are unchanged).
    output_stride: int = 32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        blocks, kind = _LAYERS[self.num_layers]
        if self.normalize == "monodepth2":
            x = (x - 0.45) / 0.225
        elif self.normalize == "imagenet":
            mean = jnp.array([0.485, 0.456, 0.406])
            std = jnp.array([0.229, 0.224, 0.225])
            x = (x - mean) / std
        feats = []
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = _BN(name="bn1")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = [64, 128, 256, 512]
        block_cls = BasicBlock if kind == "basic" else Bottleneck
        expansion = 1 if kind == "basic" else 4
        in_ch = 64
        for li, (w, n_blocks) in enumerate(zip(widths, blocks)):
            stride = 1 if li == 0 else 2
            dilation = 1
            if self.output_stride == 16 and li == 3:
                stride, dilation = 1, 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                need_down = bi == 0 and (stride != 1 or in_ch != w * expansion)
                x = block_cls(features=w, stride=s, downsample=need_down,
                              dilation=dilation,
                              name=f"layer{li + 1}_{bi}")(x)
                in_ch = w * expansion
            feats.append(x)
        return feats

    @property
    def num_ch_enc(self) -> Sequence[int]:
        if self.num_layers <= 34:
            return (64, 64, 128, 256, 512)
        return (64, 256, 512, 1024, 2048)


def convert_torch_resnet(state_dict: Dict[str, Any], num_layers: int,
                         prefix: str = "") -> Dict[str, Any]:
    """torchvision / monodepth2-encoder state dict -> ResNetEncoder params.

    Accepts keys either bare ('conv1.weight') or under 'encoder.' (the
    monodepth2 checkpoint layout, shared_functions.py:136-169)."""
    import numpy as np

    def get(key):
        for k in (prefix + key, "encoder." + key, key):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v)
        raise KeyError(key)

    def conv_w(key):
        return jnp.asarray(get(key).transpose(2, 3, 1, 0))

    def bn(key):
        return {
            "scale": jnp.asarray(get(key + ".weight")),
            "bias": jnp.asarray(get(key + ".bias")),
            "mean": jnp.asarray(get(key + ".running_mean")),
            "var": jnp.asarray(get(key + ".running_var")),
        }

    params = {
        "conv1": {"kernel": conv_w("conv1.weight")},
        "bn1": bn("bn1"),
    }
    blocks, kind = _LAYERS[num_layers]
    for li, n_blocks in enumerate(blocks):
        for bi in range(n_blocks):
            t = f"layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            entry = {
                "conv1": {"kernel": conv_w(f"{t}.conv1.weight")},
                "bn1": bn(f"{t}.bn1"),
                "conv2": {"kernel": conv_w(f"{t}.conv2.weight")},
                "bn2": bn(f"{t}.bn2"),
            }
            if kind == "bottleneck":
                entry["conv3"] = {"kernel": conv_w(f"{t}.conv3.weight")}
                entry["bn3"] = bn(f"{t}.bn3")
            try:
                entry["down_conv"] = {
                    "kernel": conv_w(f"{t}.downsample.0.weight")}
                entry["down_bn"] = bn(f"{t}.downsample.1")
            except KeyError:
                pass
            params[name] = entry
    return {"params": params}
