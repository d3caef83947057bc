"""Model factory: build + checkpoint-load the perception nets.

Equivalent of the reference's ``InitNets`` (utils/shared_functions.py:22-134):
instantiates the depth model (monodepth2 / RAFT-Stereo), the segmentation
model and the optical-flow model per config, and loads torch checkpoints
through the converters in super_tpu.models (state-dict key remapping like
``load_checkpoints``, shared_functions.py:136-169).
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from super_tpu.config import SuPerConfig


class Models(NamedTuple):
    depth_model: Optional[object]
    depth_params: Optional[Any]
    seg_model: Optional[object]
    seg_params: Optional[Any]
    flow_model: Optional[object]
    flow_params: Optional[Any]


def _load_torch_state(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(os.path.expanduser(path), map_location="cpu",
                    weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # Strip DataParallel / Lightning prefixes (shared_functions.py:145-158).
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def build_models(cfg: SuPerConfig,
                 depth_checkpoint: Optional[str] = None,
                 encoder_checkpoint: Optional[str] = None,
                 seg_checkpoint: Optional[str] = None,
                 flow_checkpoint: Optional[str] = None,
                 num_layers: int = 18,
                 rng_seed: int = 0) -> Models:
    """Instantiate the configured models; random init where no checkpoint."""
    key = jax.random.PRNGKey(rng_seed)
    h, w = cfg.height, cfg.width
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)

    depth_model = depth_params = None
    if cfg.depth_model == "monodepth2_stereo":
        from super_tpu.models.monodepth2 import (
            Monodepth2,
            convert_torch_monodepth2,
        )

        depth_model = Monodepth2(num_layers=num_layers)
        if depth_checkpoint and encoder_checkpoint:
            enc_sd = _load_torch_state(encoder_checkpoint)
            dec_sd = _load_torch_state(depth_checkpoint)
            depth_params = convert_torch_monodepth2(enc_sd, dec_sd,
                                                    num_layers)
        else:
            depth_params = depth_model.init(key, dummy)
    elif cfg.depth_model == "raft_stereo":
        from super_tpu.models.raft_stereo import (
            RAFTStereo,
            convert_torch_raft_stereo,
        )

        depth_model = RAFTStereo(iters=32)
        if depth_checkpoint:
            # DataParallel checkpoint load (shared_functions.py:74-82).
            depth_params = convert_torch_raft_stereo(
                _load_torch_state(depth_checkpoint))
        else:
            depth_params = depth_model.init(key, dummy, dummy)

    seg_model = seg_params = None
    if cfg.seg_model is not None:
        from super_tpu.models.segmentation import build_seg_model

        seg_model = build_seg_model(cfg.seg_model, cfg.num_classes,
                                    num_layers)
        if seg_checkpoint:
            # Full smp checkpoint (encoder + decoder + head), the layout
            # the reference loads (seg/inference.py:102-128); every arch
            # option has an exact converter (tests/test_seg_parity.py).
            sd = _load_torch_state(seg_checkpoint)
            from super_tpu.models import segmentation as seg_mod

            converter = {
                "unet": seg_mod.convert_torch_smp_unet,
                "unet++": seg_mod.convert_torch_smp_unetplusplus,
                "unetplusplus": seg_mod.convert_torch_smp_unetplusplus,
                "manet": seg_mod.convert_torch_smp_manet,
            }.get(cfg.seg_model, seg_mod.convert_torch_smp_deeplab)
            seg_params = converter(sd, num_layers)
        else:
            seg_params = seg_model.init(key, dummy)

    flow_model = flow_params = None
    if cfg.losses.sf_corr:
        from super_tpu.models.raft_flow import (
            RAFTFlow,
            convert_torch_raft_flow,
        )

        flow_model = RAFTFlow(iters=12)
        if flow_checkpoint:
            # Either the original princeton-vl layout (raft-things.pth) or
            # torchvision's raft_large layout -- the reference's actual
            # weight source (shared_functions.py:131-134) -- detected by
            # the renamed module tree.
            sd = _load_torch_state(flow_checkpoint)
            if any(k.split("module.", 1)[-1].startswith(
                    ("feature_encoder.", "context_encoder."))
                    for k in sd):
                from super_tpu.models.raft_flow import (
                    convert_torchvision_raft_flow,
                )
                flow_params = convert_torchvision_raft_flow(sd)
            else:
                flow_params = convert_torch_raft_flow(sd)
        else:
            flow_params = flow_model.init(key, dummy, dummy)

    return Models(depth_model, depth_params, seg_model, seg_params,
                  flow_model, flow_params)


def predict_frame_inputs(cfg: SuPerConfig, models: Models, color_chw,
                         right_color_chw=None):
    """Run the configured perception nets on one frame (SuPer.forward's
    pred_depth / pred_seg stage, super/super.py:36-43).

    Returns dict with 'depth' (H, W) and optionally 'seg'/'seg_conf'."""
    out = {}
    if models.depth_model is not None:
        if cfg.depth_model == "monodepth2_stereo":
            from super_tpu.models.monodepth2 import predict_depth

            _, depth = predict_depth(
                models.depth_params, models.depth_model, color_chw,
                cfg.min_depth, cfg.max_depth, post_process=cfg.post_process,
                filter_kernel=max(cfg.depth_filter_kernel_size, 0))
            out["depth"] = depth
        else:  # raft_stereo
            from super_tpu.models.raft_stereo import depth_from_disparity

            flow = models.depth_model.apply(
                models.depth_params, color_chw.transpose(1, 2, 0)[None],
                right_color_chw.transpose(1, 2, 0)[None])[0]
            out["depth"] = depth_from_disparity(flow)
    if models.seg_model is not None:
        from super_tpu.models.segmentation import predict_seg

        seg, conf = predict_seg(models.seg_params, models.seg_model,
                                color_chw, hard_seg=cfg.hard_seg)
        out["seg"] = seg
        out["seg_conf"] = conf
    return out
