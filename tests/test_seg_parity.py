"""DeepLabV3+ converter parity against a torch build of the smp decoder.

segmentation_models_pytorch itself is not installed in this image, so the
golden model is a torch replica of smp.DeepLabV3Plus(resnet18) built here
with smp's exact module indexing (ASPP convs.{0..4}, aspp.{0,1,2},
block1/block2, segmentation_head.0) -- its state_dict keys are
byte-identical to a real smp checkpoint's, so ``convert_torch_smp_deeplab``
is exercised on the same key layout the reference loads
(seg/inference.py:102-128).  Numerical parity pins the OS16 dilated
encoder, separable atrous convs, BN folds, and align-corners upsampling.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from super_tpu.models.segmentation import (  # noqa: E402
    DeepLabV3Plus,
    convert_torch_smp_deeplab,
)

H, W, CLASSES = 64, 96, 3
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _Basic(tnn.Module):
    def __init__(self, cin, cout, stride=1, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, dilation, dilation,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, dilation, dilation,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return torch.relu(x + y)


class _Encoder(tnn.Module):
    """torchvision resnet18 with smp's make_dilated(stage 5, dilation 2)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_Basic(64, 64), _Basic(64, 64))
        self.layer2 = tnn.Sequential(_Basic(64, 128, 2), _Basic(128, 128))
        self.layer3 = tnn.Sequential(_Basic(128, 256, 2), _Basic(256, 256))
        self.layer4 = tnn.Sequential(_Basic(256, 512, 1, dilation=2),
                                     _Basic(512, 512, dilation=2))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        low = self.layer1(self.maxpool(x))
        high = self.layer4(self.layer3(self.layer2(low)))
        return low, high


def _sep(cin, cout, padding=1, dilation=1):
    return tnn.Sequential(
        tnn.Conv2d(cin, cin, 3, 1, padding, dilation, groups=cin, bias=False),
        tnn.Conv2d(cin, cout, 1, bias=False))


class _ASPP(tnn.Module):
    def __init__(self, cin, cout=256, rates=(12, 24, 36)):
        super().__init__()
        mods = [tnn.Sequential(tnn.Conv2d(cin, cout, 1, bias=False),
                               tnn.BatchNorm2d(cout), tnn.ReLU())]
        for r in rates:
            mods.append(tnn.Sequential(
                _sep(cin, cout, padding=r, dilation=r),
                tnn.BatchNorm2d(cout), tnn.ReLU()))
        mods.append(tnn.Sequential(
            tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(cin, cout, 1, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU()))
        self.convs = tnn.ModuleList(mods)
        self.project = tnn.Sequential(
            tnn.Conv2d(5 * cout, cout, 1, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU(), tnn.Dropout(0.5))

    def forward(self, x):
        size = x.shape[-2:]
        outs = [m(x) for m in self.convs[:-1]]
        pool = self.convs[-1](x)
        outs.append(torch.nn.functional.interpolate(
            pool, size=size, mode="bilinear", align_corners=False))
        return self.project(torch.cat(outs, dim=1))


class _Decoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.aspp = tnn.Sequential(_ASPP(512, 256), _sep(256, 256),
                                   tnn.BatchNorm2d(256), tnn.ReLU())
        self.up = tnn.UpsamplingBilinear2d(scale_factor=4)
        self.block1 = tnn.Sequential(tnn.Conv2d(64, 48, 1, bias=False),
                                     tnn.BatchNorm2d(48), tnn.ReLU())
        self.block2 = tnn.Sequential(_sep(48 + 256, 256),
                                     tnn.BatchNorm2d(256), tnn.ReLU())

    def forward(self, low, high):
        y = self.up(self.aspp(high))
        return self.block2(torch.cat([y, self.block1(low)], dim=1))


class _SmpDeepLab(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _Encoder()
        self.decoder = _Decoder()
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(256, CLASSES, 3, padding=1),
            tnn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        low, high = self.encoder(x)
        return self.segmentation_head(self.decoder(low, high))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = _SmpDeepLab()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0.0, 0.1)
    model.eval()
    return model


def test_deeplab_matches_torch(torch_model):
    rng = np.random.RandomState(2)
    img = rng.rand(1, H, W, 3).astype(np.float32)

    # Reference normalizes externally (seg/inference.py:84-99); our encoder
    # normalizes internally from [0, 1].
    t_in = torch.from_numpy(
        ((img - IMAGENET_MEAN) / IMAGENET_STD).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        ref = torch_model(t_in).numpy()  # (1, C, H, W)

    params = convert_torch_smp_deeplab(torch_model.state_dict())
    model = DeepLabV3Plus(num_classes=CLASSES, num_layers=18)
    ours = np.asarray(jax.jit(model.apply)(params, jnp.asarray(img)))

    assert ours.shape == ref.shape
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3)


def test_smp_converter_tree_matches_init(torch_model):
    params = convert_torch_smp_deeplab(torch_model.state_dict())
    init = DeepLabV3Plus(num_classes=CLASSES, num_layers=18).init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    flat_c = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_i = jax.tree_util.tree_flatten_with_path(init)[0]
    assert ({jax.tree_util.keystr(p): v.shape for p, v in flat_c}
            == {jax.tree_util.keystr(p): v.shape for p, v in flat_i})


# ---------------------------------------------------------------------------
# Unet / Unet++ / MAnet: torch replicas with smp's exact state_dict key
# layout (encoder.*, decoder.blocks.*, segmentation_head.0), so the
# converters are exercised on the same keys a real smp checkpoint carries.
# ---------------------------------------------------------------------------

import torch.nn.functional as _F  # noqa: E402


class _EncoderFull(tnn.Module):
    """torchvision resnet18, stride 32, full 5-level pyramid."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_Basic(64, 64), _Basic(64, 64))
        self.layer2 = tnn.Sequential(_Basic(64, 128, 2), _Basic(128, 128))
        self.layer3 = tnn.Sequential(_Basic(128, 256, 2), _Basic(256, 256))
        self.layer4 = tnn.Sequential(_Basic(256, 512, 2), _Basic(512, 512))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        f1 = self.layer1(self.maxpool(x))
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return [x, f1, f2, f3, f4]


def _c2r(cin, cout, k=3):
    return tnn.Sequential(tnn.Conv2d(cin, cout, k, padding=k // 2,
                                     bias=False),
                          tnn.BatchNorm2d(cout), tnn.ReLU())


class _TDecoderBlock(tnn.Module):
    def __init__(self, cin, cskip, cout):
        super().__init__()
        self.conv1 = _c2r(cin + cskip, cout)
        self.conv2 = _c2r(cout, cout)

    def forward(self, x, skip=None):
        x = _F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


_UNET_CH = [(512, 256, 256), (256, 128, 128), (128, 64, 64),
            (64, 64, 32), (32, 0, 16)]


class _TUnet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _EncoderFull()
        dec = tnn.Module()
        dec.blocks = tnn.ModuleList(
            [_TDecoderBlock(*chs) for chs in _UNET_CH])
        self.decoder = dec
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(16, CLASSES, 3, padding=1))

    def forward(self, x):
        feats = self.encoder(x)
        skips = feats[-2::-1] + [None]
        y = feats[-1]
        for blk, skip in zip(self.decoder.blocks, skips):
            y = blk(y, skip)
        return self.segmentation_head(y)


class _TUnetPP(tnn.Module):
    """smp UnetPlusPlusDecoder dense grid (resnet18, depth 5)."""

    def __init__(self):
        super().__init__()
        self.encoder = _EncoderFull()
        in_ch = [512, 256, 128, 64, 32]
        skip_ch = [256, 128, 64, 64, 0]
        out_ch = [256, 128, 64, 32, 16]
        blocks = {}
        for layer in range(4):
            for d in range(layer + 1):
                if d == 0:
                    ci, cs, co = (in_ch[layer], skip_ch[layer] * (layer + 1),
                                  out_ch[layer])
                else:
                    ci = skip_ch[layer - 1]
                    cs = skip_ch[layer] * (layer + 1 - d)
                    co = skip_ch[layer]
                blocks[f"x_{d}_{layer}"] = _TDecoderBlock(ci, cs, co)
        blocks["x_0_4"] = _TDecoderBlock(in_ch[-1], 0, out_ch[-1])
        dec = tnn.Module()
        dec.blocks = tnn.ModuleDict(blocks)
        self.decoder = dec
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(16, CLASSES, 3, padding=1))

    def forward(self, x):
        f = self.encoder(x)[::-1]
        blocks = self.decoder.blocks
        dense = {}
        for layer in range(4):
            for d in range(4 - layer):
                li = d + layer
                if layer == 0:
                    dense[(d, li)] = blocks[f"x_{d}_{li}"](f[d], f[d + 1])
                else:
                    cat = torch.cat(
                        [dense[(i, li)] for i in range(d + 1, li + 1)]
                        + [f[li + 1]], dim=1)
                    dense[(d, li)] = blocks[f"x_{d}_{li}"](
                        dense[(d, li - 1)], cat)
        y = blocks["x_0_4"](dense[(0, 3)])
        return self.segmentation_head(y)


class _TPAB(tnn.Module):
    def __init__(self, cin, pab=64):
        super().__init__()
        self.top_conv = tnn.Conv2d(cin, pab, 1)
        self.center_conv = tnn.Conv2d(cin, pab, 1)
        self.bottom_conv = tnn.Conv2d(cin, cin, 3, padding=1)
        self.out_conv = tnn.Conv2d(cin, cin, 3, padding=1)

    def forward(self, x):
        n, c, h, w = x.shape
        top = self.top_conv(x).flatten(2)                      # (n,p,hw)
        center = self.center_conv(x).flatten(2).transpose(1, 2)
        bottom = self.bottom_conv(x).flatten(2).transpose(1, 2)
        att = torch.matmul(center, top)                        # (n,hw,hw)
        att = torch.softmax(att.reshape(n, -1), dim=-1).reshape(n, h * w,
                                                                h * w)
        sp = torch.matmul(att, bottom)                         # (n,hw,c)
        sp = sp.transpose(1, 2).reshape(n, c, h, w)
        return self.out_conv(x + sp)


class _TMFAB(tnn.Module):
    def __init__(self, cin, cskip, cout, reduction=16):
        super().__init__()
        self.hl_conv = tnn.Sequential(_c2r(cin, cin, 3), _c2r(cin, cskip, 1))
        red = max(1, cskip // reduction)
        mk = lambda: tnn.Sequential(  # noqa: E731
            tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(cskip, red, 1),
            tnn.ReLU(), tnn.Conv2d(red, cskip, 1), tnn.Sigmoid())
        self.SE_ll = mk()
        self.SE_hl = mk()
        self.conv1 = _c2r(2 * cskip, cout)
        self.conv2 = _c2r(cout, cout)

    def forward(self, x, skip):
        x = self.hl_conv(x)
        x = _F.interpolate(x, scale_factor=2, mode="nearest")
        gate = self.SE_hl(x) + self.SE_ll(skip)
        x = torch.cat([x * gate, skip], dim=1)
        return self.conv2(self.conv1(x))


class _TMAnet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _EncoderFull()
        dec = tnn.Module()
        dec.center = _TPAB(512)
        dec.blocks = tnn.ModuleList(
            [_TMFAB(cin, cs, co) for cin, cs, co in _UNET_CH[:4]]
            + [_TDecoderBlock(*_UNET_CH[4])])
        self.decoder = dec
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(16, CLASSES, 3, padding=1))

    def forward(self, x):
        feats = self.encoder(x)
        skips = feats[-2::-1] + [None]
        y = self.decoder.center(feats[-1])
        for blk, skip in zip(self.decoder.blocks, skips):
            y = blk(y, skip) if skip is not None else blk(y)
        return self.segmentation_head(y)


def _randomize_bns(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0.0, 0.1)
    model.eval()
    return model


@pytest.mark.parametrize("arch", ["unet", "unet++", "manet"])
def test_unet_family_matches_torch(arch):
    from super_tpu.models.segmentation import (
        build_seg_model,
        convert_torch_smp_manet,
        convert_torch_smp_unet,
        convert_torch_smp_unetplusplus,
    )

    torch.manual_seed(1)
    tmodel = _randomize_bns({"unet": _TUnet, "unet++": _TUnetPP,
                             "manet": _TMAnet}[arch]())
    conv = {"unet": convert_torch_smp_unet,
            "unet++": convert_torch_smp_unetplusplus,
            "manet": convert_torch_smp_manet}[arch]

    rng = np.random.RandomState(3)
    img = rng.rand(1, H, W, 3).astype(np.float32)
    t_in = torch.from_numpy(
        ((img - IMAGENET_MEAN) / IMAGENET_STD).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        ref = tmodel(t_in).numpy()

    params = conv(tmodel.state_dict())
    model = build_seg_model(arch, num_classes=CLASSES, num_layers=18)
    ours = np.asarray(jax.jit(model.apply)(params, jnp.asarray(img)))

    assert ours.shape == ref.shape
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3)
