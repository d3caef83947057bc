"""Output parity of the flax RAFT optical flow against a torch RAFT-large.

The golden model is composed from the reference's own raft_core torch
modules (BasicEncoder, SepConvGRU, FlowHead -- RAFT-Stereo's code is the
original RAFT's, extractor.py/update.py) plus the original RAFT's 2D
correlation block and update wiring rebuilt here with the princeton-vl
checkpoint key layout (fnet / cnet / update_block.{encoder,gru,flow_head,
mask}).  ``convert_torch_raft_flow`` must reproduce its output from the
exported state dict, pinning the batch-norm cnet fold, the SepConvGRU, and
RAFT's corr-window channel-order quirk (meshgrid(dy, dx) with dy in the
sampler's x slot).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from super_tpu.models.raft_flow import (  # noqa: E402
    RAFTFlow,
    convert_torch_raft_flow,
)

REFERENCE_ROOT = "/root/reference"
ITERS = 3
H, W = 64, 96
RADIUS, LEVELS = 4, 4


def _ref_modules():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from depth.raft_core.extractor import BasicEncoder
    from depth.raft_core.update import FlowHead, SepConvGRU
    from depth.raft_core.utils.utils import bilinear_sampler
    return BasicEncoder, SepConvGRU, FlowHead, bilinear_sampler


class _CorrBlock2D:
    """Original RAFT CorrBlock (2D), including its window-order quirk."""

    def __init__(self, fmap1, fmap2, sampler):
        self.sampler = sampler
        b, d, h, w = fmap1.shape
        corr = torch.matmul(fmap1.view(b, d, h * w).transpose(1, 2),
                            fmap2.view(b, d, h * w))
        corr = corr.view(b * h * w, 1, h, w) / float(d) ** 0.5
        self.shape = (b, h, w)
        self.pyramid = [corr]
        for _ in range(LEVELS - 1):
            corr = F.avg_pool2d(corr, 2, stride=2)
            self.pyramid.append(corr)

    def __call__(self, coords):
        b, h, w = self.shape
        coords = coords.permute(0, 2, 3, 1)
        r = RADIUS
        out = []
        for i, corr in enumerate(self.pyramid):
            dx = torch.linspace(-r, r, 2 * r + 1)
            dy = torch.linspace(-r, r, 2 * r + 1)
            delta = torch.stack(torch.meshgrid(dy, dx), axis=-1)
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
            sampled = self.sampler(corr, centroid + delta.view(
                1, 2 * r + 1, 2 * r + 1, 2))
            out.append(sampled.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


def _build_torch_raft():
    BasicEncoder, SepConvGRU, FlowHead, sampler = _ref_modules()

    class Motion(tnn.Module):
        def __init__(self):
            super().__init__()
            cor_planes = LEVELS * (2 * RADIUS + 1) ** 2
            self.convc1 = tnn.Conv2d(cor_planes, 256, 1)
            self.convc2 = tnn.Conv2d(256, 192, 3, padding=1)
            self.convf1 = tnn.Conv2d(2, 128, 7, padding=3)
            self.convf2 = tnn.Conv2d(128, 64, 3, padding=1)
            self.conv = tnn.Conv2d(64 + 192, 126, 3, padding=1)

        def forward(self, flow, corr):
            cor = F.relu(self.convc2(F.relu(self.convc1(corr))))
            flo = F.relu(self.convf2(F.relu(self.convf1(flow))))
            out = F.relu(self.conv(torch.cat([cor, flo], dim=1)))
            return torch.cat([out, flow], dim=1)

    class Update(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Motion()
            self.gru = SepConvGRU(hidden_dim=128, input_dim=128 + 128)
            self.flow_head = FlowHead(128, hidden_dim=256)
            self.mask = tnn.Sequential(
                tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(inplace=True),
                tnn.Conv2d(256, 8 * 8 * 9, 1, padding=0))

        def forward(self, net, inp, corr, flow):
            motion = self.encoder(flow, corr)
            net = self.gru(net, torch.cat([inp, motion], dim=1))
            return net, 0.25 * self.mask(net), self.flow_head(net)

    class RAFT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                     downsample=3)
            self.cnet = BasicEncoder(output_dim=256, norm_fn="batch",
                                     downsample=3)
            self.update_block = Update()

        def forward(self, im1, im2, iters):
            im1 = 2 * (im1 / 255.0) - 1.0
            im2 = 2 * (im2 / 255.0) - 1.0
            fmap1, fmap2 = self.fnet([im1, im2])
            corr_fn = _CorrBlock2D(fmap1, fmap2, sampler)
            c = self.cnet(im1)
            net, inp = torch.split(c, [128, 128], dim=1)
            net, inp = torch.tanh(net), torch.relu(inp)
            b, _, h, w = fmap1.shape
            ys, xs = torch.meshgrid(torch.arange(h).float(),
                                    torch.arange(w).float())
            coords0 = torch.stack([xs, ys])[None].repeat(b, 1, 1, 1)
            coords1 = coords0.clone()
            for _ in range(iters):
                corr = corr_fn(coords1)
                flow = coords1 - coords0
                net, mask, delta = self.update_block(net, inp, corr, flow)
                coords1 = coords1 + delta
            return self._upsample(coords1 - coords0, mask)

        @staticmethod
        def _upsample(flow, mask):
            n, _, h, w = flow.shape
            mask = mask.view(n, 1, 9, 8, 8, h, w)
            mask = torch.softmax(mask, dim=2)
            up = F.unfold(8 * flow, [3, 3], padding=1)
            up = up.view(n, 2, 9, 1, 1, h, w)
            up = torch.sum(mask * up, dim=2)
            up = up.permute(0, 1, 4, 2, 5, 3)
            return up.reshape(n, 2, 8 * h, 8 * w)

    torch.manual_seed(3)
    model = RAFT()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0.0, 0.1)
    model.eval()
    return model


def test_raft_flow_matches_torch():
    try:
        model = _build_torch_raft()
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference raft_core modules unavailable: {exc}")

    rng = np.random.RandomState(4)
    im1 = rng.rand(1, H, W, 3).astype(np.float32)
    im2 = rng.rand(1, H, W, 3).astype(np.float32)
    t1 = torch.from_numpy(255.0 * im1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(255.0 * im2.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = model(t1, t2, iters=ITERS).numpy().transpose(0, 2, 3, 1)

    params = convert_torch_raft_flow(model.state_dict())
    ours = np.asarray(jax.jit(RAFTFlow(iters=ITERS).apply)(
        params, jnp.asarray(im1), jnp.asarray(im2)))

    assert ours.shape == ref.shape
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3)


def test_flow_converter_tree_matches_init():
    try:
        model = _build_torch_raft()
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference raft_core modules unavailable: {exc}")
    params = convert_torch_raft_flow(model.state_dict())
    init = RAFTFlow(iters=2).init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, H, W, 3)),
                                  jnp.zeros((1, H, W, 3)))
    flat_c = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_i = jax.tree_util.tree_flatten_with_path(init)[0]
    assert ({jax.tree_util.keystr(p): v.shape for p, v in flat_c}
            == {jax.tree_util.keystr(p): v.shape for p, v in flat_i})


def _to_torchvision_layout(sd):
    """Rename an original-layout (princeton-vl) RAFT state dict into
    torchvision's raft_large layout (torchvision/models/optical_flow/
    raft.py module names), the inverse of the remap inside
    ``convert_torchvision_raft_flow``."""
    import re

    out = {}
    for k, v in sd.items():
        nk = k
        nk = re.sub(r"^fnet\.", "feature_encoder.", nk)
        nk = re.sub(r"^cnet\.", "context_encoder.", nk)
        if nk.startswith(("feature_encoder.", "context_encoder.")):
            if ".norm3." in nk:
                continue  # duplicate of downsample.1 in the original dict
            nk = re.sub(r"^(\w+)\.conv1\.", r"\1.convnormrelu.0.", nk)
            nk = re.sub(r"^(\w+)\.norm1\.", r"\1.convnormrelu.1.", nk)
            nk = re.sub(r"^(\w+)\.conv2\.", r"\1.conv.", nk)
            nk = nk.replace(".conv1.", ".convnormrelu1.0.")
            nk = nk.replace(".norm1.", ".convnormrelu1.1.")
            nk = nk.replace(".conv2.", ".convnormrelu2.0.")
            nk = nk.replace(".norm2.", ".convnormrelu2.1.")
        nk = re.sub(r"^update_block\.encoder\.conv([cf])([12])\.",
                    lambda m: "update_block.motion_encoder.conv%s%s.0." % (
                        {"c": "corr", "f": "flow"}[m.group(1)], m.group(2)),
                    nk)
        nk = nk.replace("update_block.encoder.conv.",
                        "update_block.motion_encoder.conv.0.")
        nk = re.sub(r"^update_block\.gru\.conv([zrq])([12])\.",
                    r"update_block.recurrent_block.convgru\g<2>.conv\g<1>.",
                    nk)
        nk = nk.replace("update_block.mask.0.", "mask_predictor.convrelu.0.")
        nk = nk.replace("update_block.mask.2.", "mask_predictor.conv.")
        out[nk] = v
    # BatchNorm counters torchvision checkpoints carry; must be dropped.
    for bk in [k for k in out if k.endswith(".running_mean")]:
        out[bk.replace(".running_mean", ".num_batches_tracked")] = (
            torch.zeros((), dtype=torch.int64))
    return out


def test_torchvision_layout_converter_matches_original():
    """convert_torchvision_raft_flow on a torchvision-layout dict must
    produce exactly the params the original-layout converter produces (the
    original layout is output-parity-pinned above)."""
    from super_tpu.models.raft_flow import convert_torchvision_raft_flow

    try:
        model = _build_torch_raft()
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference raft_core modules unavailable: {exc}")
    sd = model.state_dict()
    p_orig = convert_torch_raft_flow(sd)
    p_tv = convert_torchvision_raft_flow(_to_torchvision_layout(sd))
    flat_o = jax.tree_util.tree_flatten_with_path(p_orig)[0]
    flat_t = dict(jax.tree_util.tree_flatten_with_path(p_tv)[0])
    assert len(flat_o) == len(flat_t)
    for path, v in flat_o:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_t[path]),
                                      err_msg=jax.tree_util.keystr(path))
