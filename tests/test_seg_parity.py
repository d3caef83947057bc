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
