#!/usr/bin/env python
"""Semantic-SuPer tracking CLI (equivalent of reference run_semantic_super.py).

Runs the semantic-aware tracker: soft/hard segmentation-weighted ICP,
face-area regularization, boundary-morph and render losses on the autograd
path (the reference's GraphFit defaults, options.py:285-350).

Examples:
  python run_semantic_super.py --synthetic --num_frames 30
  python run_semantic_super.py --data_dir ~/trial_3 --load_depth --load_seg \
      --tracking_gt_file left_pts.npy
"""

from __future__ import annotations

import dataclasses
import json
import sys

from run_super import build_argparser


def main(argv=None) -> int:
    p = build_argparser()
    p.set_defaults(method="semantic-super", data="superv2", start_id=0,
                   end_id=151, use_derived_gradient=False)
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--hard_seg", action="store_true")
    p.add_argument("--sf_soft_seg_point_plane", action="store_true",
                   default=True)
    p.add_argument("--sf_bn_morph", action="store_true", default=True)
    p.add_argument("--render_loss", action="store_true", default=False)
    p.add_argument("--mesh_face", action="store_true", default=True)
    p.add_argument("--optimizer", default="Adam")
    p.add_argument("--learning_rate", type=float, default=2e-4)
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from super_tpu.config import CapacityConfig, LossConfig, SuPerConfig
    from super_tpu.core.graph import grid_layout
    from super_tpu.pipeline import SuPerPipeline

    anchors, _, _ = grid_layout(args.height, args.width, args.mesh_step_size)

    def pow2_at_least(n):
        v = 1
        while v < n:
            v *= 2
        return v

    node_cap = pow2_at_least(len(anchors))
    cfg = SuPerConfig(
        method="semantic-super",
        data=args.data,
        height=args.height,
        width=args.width,
        mesh_step_size=args.mesh_step_size,
        num_classes=args.num_classes,
        hard_seg=args.hard_seg,
        load_seg=True,
        depth_model=args.depth_model,
        seg_model=args.seg_model,
        losses=LossConfig(
            sf_point_plane=False,
            sf_soft_seg_point_plane=not args.hard_seg,
            sf_hard_seg_point_plane=args.hard_seg,
            mesh_arap=False,
            mesh_rot=True,
            mesh_face=args.mesh_face,
            sf_bn_morph=args.sf_bn_morph,
            render_loss=args.render_loss,
            sf_corr=args.sf_corr,
            sf_corr_weight=args.sf_corr_weight,
            sf_corr_match_renderimg=args.sf_corr_match_renderimg,
        ),
        capacity=CapacityConfig(
            surfel_capacity=pow2_at_least(2 * args.height * args.width),
            node_capacity=node_cap,
            edge_capacity=4 * node_cap,
            triangle_capacity=2 * node_cap,
        ),
    )
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver,
        use_derived_gradient=False,
        optimizer=args.optimizer,
        learning_rate=args.learning_rate,
        num_iterations=args.num_optimize_iterations))

    from run_super import build_cli_models
    models = build_cli_models(cfg, args)

    if args.synthetic or args.data_dir is None:
        from super_tpu.data.synthetic import default_intrinsics, generate
        intr = default_intrinsics(args.height, args.width)
        seq = generate(args.num_frames, args.height, args.width, intr=intr,
                       num_classes=args.num_classes)
        pipe = SuPerPipeline(cfg, intr)
        metrics = pipe.run(seq.depths, seq.colors, gt_xy=seq.gt_xy,
                           gt_valid=seq.gt_valid, segs=seq.segs,
                           seg_confs=seq.seg_confs, models=models,
                           verbose=args.verbose)
    else:
        from super_tpu.data.superv1 import load_sequence
        intr, loaded = load_sequence(cfg, args)
        pipe = SuPerPipeline(cfg, intr)
        metrics = pipe.run(loaded.depths, loaded.colors,
                           gt_xy=loaded.gt_xy, gt_valid=loaded.gt_valid,
                           segs=loaded.segs, seg_confs=loaded.seg_confs,
                           models=models, verbose=args.verbose)

    print(json.dumps(metrics, indent=2))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(metrics, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
