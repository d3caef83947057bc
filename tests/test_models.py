"""Perception-model tests: shapes, finiteness, BN math, torch conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_tpu.models.monodepth2 import (
    Monodepth2,
    batch_post_process_disparity,
    predict_depth,
)
from super_tpu.models.raft_flow import RAFTFlow
from super_tpu.models.raft_stereo import RAFTStereo, depth_from_disparity
from super_tpu.models.resnet import ResNetEncoder, convert_torch_resnet
from super_tpu.models.segmentation import DeepLabV3Plus, predict_seg


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_monodepth2_shapes_and_range(key):
    img = jax.random.uniform(key, (1, 64, 96, 3))
    m = Monodepth2(num_layers=18)
    params = m.init(key, img)
    outs = m.apply(params, img)
    assert set(outs) == {0, 1, 2, 3}
    for s, d in outs.items():
        assert d.shape == (1, 64 // 2 ** s, 96 // 2 ** s, 1)
        arr = np.asarray(d)
        assert np.isfinite(arr).all() and (arr > 0).all() and (arr < 1).all()
    disp, depth = predict_depth(params, m, img[0].transpose(2, 0, 1),
                                0.1, 80.0, post_process=True)
    assert disp.shape == (64, 96)
    assert np.isfinite(np.asarray(depth)).all()


def test_post_process_blending():
    l = jnp.ones((1, 8, 16))
    r = 2 * jnp.ones((1, 8, 16))
    out = np.asarray(batch_post_process_disparity(l, r))
    # Left band ~ r_disp-dominated... blended values stay within [1, 2].
    assert out.min() >= 1.0 - 1e-6 and out.max() <= 2.0 + 1e-6


def test_raft_stereo_runs(key):
    img = jax.random.uniform(key, (1, 48, 64, 3))
    m = RAFTStereo(iters=3)
    params = m.init(key, img, img)
    flow = m.apply(params, img, img)
    assert flow.shape == (1, 48, 64)
    assert np.isfinite(np.asarray(flow)).all()
    depth = depth_from_disparity(-jnp.abs(flow) - 1.0)
    assert np.isfinite(np.asarray(depth)).all()


def test_raft_flow_runs(key):
    img = jax.random.uniform(key, (1, 48, 64, 3))
    m = RAFTFlow(iters=2)
    params = m.init(key, img, img)
    flow = m.apply(params, img, img)
    assert flow.shape == (1, 48, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_segmentation_runs(key):
    img = jax.random.uniform(key, (1, 48, 64, 3))
    m = DeepLabV3Plus(num_classes=3, num_layers=18)
    params = m.init(key, img)
    logits = m.apply(params, img)
    assert logits.shape == (1, 3, 48, 64)
    seg, conf = predict_seg(params, m, img[0].transpose(2, 0, 1))
    assert seg.shape == (48, 64)
    np.testing.assert_allclose(np.asarray(conf).sum(0), 1.0, atol=1e-4)


def test_resnet_matches_torch_block():
    """Converted torch conv+bn stem must match our encoder's stem output."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    bn = torch.nn.BatchNorm2d(64)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1, 0.2)
        bn.bias.normal_(0, 0.2)
        x_t = torch.randn(1, 3, 32, 32)
        ref = torch.relu(bn(conv(x_t))).numpy()

    # Build a state dict resembling resnet18 with our stem weights and
    # identity-ish layers is overkill; instead check the stem math directly.
    from super_tpu.models.resnet import _BN

    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, name="conv1")(x)
            return nn.relu(_BN(name="bn1")(x))

    params = {"params": {
        "conv1": {"kernel": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0))},
        "bn1": {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
            "mean": jnp.asarray(bn.running_mean.numpy()),
            "var": jnp.asarray(bn.running_var.numpy()),
        },
    }}
    out = Stem().apply(params, jnp.asarray(
        x_t.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_convert_torch_resnet_full():
    """Converter consumes a torch-style resnet18 state dict and the encoder
    runs with it."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    sd = {}

    def add_conv(name, cout, cin, k):
        sd[name + ".weight"] = torch.randn(cout, cin, k, k) * 0.05

    def add_bn(name, c):
        sd[name + ".weight"] = torch.rand(c) + 0.5
        sd[name + ".bias"] = torch.randn(c) * 0.1
        sd[name + ".running_mean"] = torch.randn(c) * 0.1
        sd[name + ".running_var"] = torch.rand(c) + 0.5

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_ch = 64
    for li, w in enumerate(widths):
        for bi in range(2):
            t = f"layer{li+1}.{bi}"
            add_conv(t + ".conv1", w, in_ch if bi == 0 else w, 3)
            add_bn(t + ".bn1", w)
            add_conv(t + ".conv2", w, w, 3)
            add_bn(t + ".bn2", w)
            if bi == 0 and (li > 0):
                add_conv(t + ".downsample.0", w, in_ch, 1)
                add_bn(t + ".downsample.1", w)
        in_ch = w

    params = convert_torch_resnet(sd, 18)
    enc = ResNetEncoder(num_layers=18)
    feats = enc.apply(params, jnp.ones((1, 32, 32, 3)))
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def test_pose_nets(key):
    from super_tpu.models.pose import (PoseCNN, PoseDecoder,
                                       transformation_from_parameters)
    from super_tpu.models.resnet import ResNetEncoder

    imgs = jax.random.uniform(key, (1, 64, 64, 6))
    cnn = PoseCNN(num_input_frames=2)
    p = cnn.init(key, imgs)
    aa, t = cnn.apply(p, imgs)
    assert aa.shape == (1, 1, 1, 3) and t.shape == (1, 1, 1, 3)
    m = transformation_from_parameters(aa[:, 0], t[:, 0])
    assert m.shape == (1, 1, 4, 4)
    # Invert composes to identity.
    mi = transformation_from_parameters(aa[:, 0], t[:, 0], invert=True)
    np.testing.assert_allclose(np.asarray(m @ mi)[0, 0], np.eye(4), atol=1e-5)

    enc = ResNetEncoder(num_layers=18)
    ep = enc.init(key, imgs[..., :3])
    feats = enc.apply(ep, imgs[..., :3])
    dec = PoseDecoder(num_input_features=1)
    dp = dec.init(key, [feats])
    aa2, t2 = dec.apply(dp, [feats])
    assert aa2.shape == (1, 1, 1, 3)


def test_gaussian_blur_normalized(key):
    from super_tpu.ops.blur import gaussian_blur

    x = jnp.ones((16, 24))
    y = gaussian_blur(x, kernel=15)
    # Interior preserved for a constant image.
    np.testing.assert_allclose(np.asarray(y)[8, 12], 1.0, atol=1e-5)
    # Smooths noise: variance shrinks.
    n = jax.random.normal(key, (32, 48))
    assert float(gaussian_blur(n, 15)[8:-8, 8:-8].var()) < float(n.var()) / 5


def test_stereo_ssim_confidence_prefers_consistent_depth():
    from super_tpu.config import SuPerConfig
    from super_tpu.core.preprocess import stereo_ssim_confidence
    from super_tpu.data.synthetic import default_intrinsics, generate
    from super_tpu.geometry.camera import backproject_depth

    h, w = 48, 64
    cfg = SuPerConfig(height=h, width=w)
    intr = default_intrinsics(h, w)
    seq = generate(1, h, w, intr=intr)
    depth = jnp.asarray(seq.depths[0])
    color = jnp.asarray(seq.colors[0].transpose(2, 0, 1))
    # Small baseline keeps the warp in-frame at this tiny test resolution
    # (the real 0.1 m baseline shifts ~90 px at fx=500).
    pts = backproject_depth(depth, intr)
    conf_good = stereo_ssim_confidence(cfg, intr, pts, color,
                                       baseline_tx=-0.01)
    pts_bad = backproject_depth(depth * (1 + 0.3 * jnp.sin(
        jnp.arange(h * w).reshape(h, w) * 0.37)), intr)
    conf_bad = stereo_ssim_confidence(cfg, intr, pts_bad, color,
                                      baseline_tx=-0.01)
    assert float(conf_good[8:-8, 8:-8].mean()) > \
        float(conf_bad[8:-8, 8:-8].mean())


def test_unet_seg_runs(key):
    # H/W divisible by 32 (smp's own constraint for the 5-level decoder).
    from super_tpu.models.segmentation import UNet, build_seg_model

    img = jax.random.uniform(key, (1, 64, 96, 3))
    m = build_seg_model("unet", num_classes=2)
    assert isinstance(m, UNet)
    params = m.init(key, img)
    logits = m.apply(params, img)
    assert logits.shape == (1, 2, 64, 96)
    assert np.isfinite(np.asarray(logits)).all()


def test_input_padder_matches_torch_replicate():
    """InputPadder parity (raft_core/utils/utils.py:7-26): replicate pad to
    divisibility-8, both modes, and unpad inverts exactly."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from super_tpu.models.raft_stereo import InputPadder

    rng = np.random.RandomState(0)
    for h, w, mode in [(47, 61, "sintel"), (47, 61, "other"),
                       (48, 64, "sintel")]:
        x = rng.rand(1, h, w, 3).astype(np.float32)
        p = InputPadder((1, h, w, 3), mode=mode)
        ours = np.asarray(p.pad(jnp.asarray(x)))
        pad_ht = (((h // 8) + 1) * 8 - h) % 8
        pad_wd = (((w // 8) + 1) * 8 - w) % 8
        tp = ([pad_wd // 2, pad_wd - pad_wd // 2,
               pad_ht // 2, pad_ht - pad_ht // 2] if mode == "sintel"
              else [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht])
        ref = F.pad(torch.tensor(x.transpose(0, 3, 1, 2)), tp,
                    mode="replicate").numpy().transpose(0, 2, 3, 1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref)
        np.testing.assert_allclose(np.asarray(p.unpad(jnp.asarray(ours))), x)


def test_compute_depth_errors_matches_torch():
    """compute_depth_errors parity (depth/monodepth2/layers.py:250-267)."""
    torch = pytest.importorskip("torch")

    from super_tpu.utils.evaluation import compute_depth_errors

    rng = np.random.RandomState(0)
    gt = rng.rand(200) * 5 + 0.1
    pred = np.abs(gt * (1 + 0.1 * rng.randn(200))) + 1e-3
    m = compute_depth_errors(gt, pred)
    g, p = torch.tensor(gt), torch.tensor(pred)
    thresh = torch.max(g / p, p / g)
    ref = {
        "abs_rel": torch.mean(torch.abs(g - p) / g),
        "sq_rel": torch.mean((g - p) ** 2 / g),
        "rmse": torch.sqrt(((g - p) ** 2).mean()),
        "rmse_log": torch.sqrt(
            ((torch.log(g) - torch.log(p)) ** 2).mean()),
        "a1": (thresh < 1.25).double().mean(),
        "a2": (thresh < 1.25 ** 2).double().mean(),
        "a3": (thresh < 1.25 ** 3).double().mean(),
    }
    for k in m:
        assert abs(m[k] - float(ref[k])) < 1e-9, (k, m[k], float(ref[k]))
