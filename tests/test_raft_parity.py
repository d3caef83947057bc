"""Output parity of the flax RAFT-Stereo against the reference torch model.

The upstream torch implementation (public RAFT-Stereo code vendored by the
reference at depth/raft_core/) is imported as the golden model: its random
conv weights and randomized batch-norm running stats are exported through
``convert_torch_raft_stereo`` and both models must produce the same
disparity field within f32 tolerance.  This pins

- the running-stats BN fold (context_norm='batch', extractor.py:205-215),
- align_corners=True cross-scale interpolation (update.py:95-97),
- the corr-pyramid lookup (corr.py:110-147) and convex upsampling
  (raft_stereo.py:56-68)

to the reference semantics under converted checkpoints.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from super_tpu.models.raft_stereo import (  # noqa: E402
    RAFTStereo,
    convert_torch_raft_stereo,
)

REFERENCE_ROOT = "/root/reference"
ITERS = 3
H, W = 64, 96


def _reference_args():
    # SuPer defaults (options.py:120-148).
    return argparse.Namespace(
        hidden_dims=[128, 128, 128], corr_levels=4, corr_radius=4,
        n_downsample=2, n_gru_layers=3, mixed_precision=False,
        shared_backbone=False, corr_implementation="reg",
        slow_fast_gru=False, context_norm="batch")


@pytest.fixture(scope="module")
def torch_model():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        from depth.raft_core.raft_stereo import RAFTStereo as TorchRAFT
    except Exception as exc:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference torch RAFT-Stereo unavailable: {exc}")

    torch.manual_seed(0)
    model = TorchRAFT(_reference_args())
    # Randomize BN running stats so the parity test actually exercises the
    # running-stats fold (freshly-built BN is the identity in eval mode).
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0.0, 0.1)
    model.eval()
    return model


def test_raft_stereo_matches_torch(torch_model):
    rng = np.random.RandomState(1)
    im1 = rng.rand(1, H, W, 3).astype(np.float32)
    im2 = rng.rand(1, H, W, 3).astype(np.float32)

    # Reference takes [0, 255] NCHW (raft_stereo.py:73-74); ours [0, 1] NHWC.
    t1 = torch.from_numpy(255.0 * im1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(255.0 * im2.transpose(0, 3, 1, 2))
    with torch.no_grad():
        _, flow_up = torch_model(t1, t2, iters=ITERS, test_mode=True)
    ref = flow_up[:, 0].numpy()  # (1, H, W) horizontal disparity flow

    params = convert_torch_raft_stereo(torch_model.state_dict())
    model = RAFTStereo(iters=ITERS)
    ours = np.asarray(jax.jit(model.apply)(params, jnp.asarray(im1),
                                           jnp.asarray(im2)))

    assert ours.shape == ref.shape
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3)


def test_converter_param_tree_matches_init(torch_model):
    """Converted params must have exactly the flax-init tree (no silently
    dropped or misnamed weights)."""
    params = convert_torch_raft_stereo(torch_model.state_dict())
    model = RAFTStereo(iters=2)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)))

    flat_c = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_i = jax.tree_util.tree_flatten_with_path(init)[0]
    paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_c}
    paths_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_i}
    assert paths_c == paths_i
