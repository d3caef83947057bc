#!/usr/bin/env python
"""Accuracy bands over long synthetic sequences, per variant x association.

Runs the tracker for 100+ frames on each hardened synthetic variant
(data/synthetic.py: clean / occlusion / noise / specular / hard) in BOTH
association modes and reports reprojection-error bands -- the evidence base
for the accuracy claims that real trial data will eventually test
(VERDICT round-3 item 10; reference metric: super/nodes.py:754-802).

  python scripts/accuracy_bands.py --num_frames 100 --height 480 --width 640
  python scripts/accuracy_bands.py --cpu --num_frames 100 --height 96 \
      --width 128 --variants clean,noise    # ~15 min CPU
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_frames", type=int, default=100)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--mesh_step_size", type=int, default=30)
    ap.add_argument("--num_optimize_iterations", type=int, default=10)
    ap.add_argument("--variants",
                    default="clean,occlusion,noise,specular,hard")
    ap.add_argument("--associations", default="per_frame,per_iteration")
    ap.add_argument("--num_track", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--output_json", default=None)
    ap.add_argument("--solver", default=None,
                    help="override linear_solver (cholesky/pcg/pairs_fused/"
                         "pcg_pallas); dense mesh steps (node cap > 512) "
                         "also get the bench's dense assembly caps")
    ap.add_argument("--pcg_iterations", type=int, default=None)
    ap.add_argument("--gram_sum_dtype", default=None)
    ap.add_argument("--learning_rate", type=float, default=None,
                    help="override autograd learning rate (semantic mode)")
    ap.add_argument("--semantic", action="store_true",
                    help="Semantic-SuPer autograd config (soft-seg ICP + "
                         "rot + face + bn_morph, Adam) on 2-class "
                         "synthetic segs -- records the semantic accuracy "
                         "band (associations flag is ignored)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from super_tpu.config import CapacityConfig, SuPerConfig
    from super_tpu.core.graph import grid_layout
    from super_tpu.data.synthetic import default_intrinsics, generate
    from super_tpu.pipeline import SuPerPipeline

    h, w = args.height, args.width
    anchors, _, _ = grid_layout(h, w, args.mesh_step_size)
    node_cap = max(64, -(-len(anchors) // 64) * 64)
    chunk = 32768
    surfel_cap = -(-int(1.25 * h * w) // chunk) * chunk
    extra_cfg = {}
    num_classes = 2
    if args.semantic:
        from super_tpu.config import LossConfig

        extra_cfg = dict(
            method="semantic-super", num_classes=num_classes, load_seg=True,
            losses=LossConfig(
                sf_point_plane=False, sf_soft_seg_point_plane=True,
                mesh_arap=False, mesh_rot=True, mesh_face=True,
                sf_bn_morph=True))
    base_cfg = SuPerConfig(
        height=h, width=w, mesh_step_size=args.mesh_step_size,
        capacity=CapacityConfig(
            surfel_capacity=surfel_cap, node_capacity=node_cap,
            edge_capacity=4 * node_cap, triangle_capacity=2 * node_cap,
            track_capacity=args.num_track,
        ),
        **extra_cfg,
    )
    solver_kw = {}
    if args.semantic:
        solver_kw.update(use_derived_gradient=False, optimizer="Adam",
                         learning_rate=args.learning_rate or 2e-4)
    if args.solver:
        solver_kw["linear_solver"] = args.solver
    if args.pcg_iterations is not None:
        solver_kw["pcg_iterations"] = args.pcg_iterations
    if args.gram_sum_dtype:
        solver_kw["gram_sum_dtype"] = args.gram_sum_dtype
    if node_cap > 512:
        solver_kw.setdefault("assembly_tuple_cap", 8 * node_cap)
        solver_kw.setdefault("assembly_pair_cap", 16 * node_cap)
    if solver_kw:
        base_cfg = base_cfg.replace(solver=dataclasses.replace(
            base_cfg.solver, **solver_kw))
    intr = default_intrinsics(h, w)

    out = {}
    for variant in args.variants.split(","):
        gen_kw = dict(num_track=args.num_track, variant=variant)
        if args.semantic:
            gen_kw["num_classes"] = num_classes
        seq = generate(args.num_frames, h, w, intr=intr, **gen_kw)
        associations = (["autograd"] if args.semantic
                        else args.associations.split(","))
        for assoc in associations:
            cfg = base_cfg
            if not args.semantic:
                cfg = base_cfg.replace(solver=dataclasses.replace(
                    base_cfg.solver, association=assoc,
                    num_iterations=args.num_optimize_iterations))
            pipe = SuPerPipeline(cfg, intr)
            run_kw = {}
            if args.semantic:
                run_kw = dict(segs=seq.segs, seg_confs=seq.seg_confs)
            m = pipe.run(seq.depths, seq.colors, gt_xy=seq.gt_xy,
                         gt_valid=seq.gt_valid, **run_kw)
            # Per-frame error trajectory -> band (errors dict: frame -> (P,)
            # with -1 invalid).
            per_frame = []
            for t in sorted(pipe.errors):
                e = pipe.errors[t]
                e = e[e >= 0]
                if e.size:
                    per_frame.append(float(np.mean(e)))
            pf = np.asarray(per_frame)
            key = f"{variant}/{assoc}"
            out[key] = {
                "reproj_mean": round(m["reproj_mean"], 4),
                "reproj_p50": round(float(np.median(pf)), 4),
                "reproj_p90": round(float(np.percentile(pf, 90)), 4),
                "reproj_max_frame": round(float(pf.max()), 4),
                "frac_valid": round(m["frac_valid"], 4),
                "num_frames": len(pf),
            }
            print(key, json.dumps(out[key]), flush=True)

    print(json.dumps(out))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
