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
    base_cfg = SuPerConfig(
        height=h, width=w, mesh_step_size=args.mesh_step_size,
        capacity=CapacityConfig(
            surfel_capacity=surfel_cap, node_capacity=node_cap,
            edge_capacity=4 * node_cap, triangle_capacity=2 * node_cap,
            track_capacity=args.num_track,
        ),
    )
    intr = default_intrinsics(h, w)

    out = {}
    for variant in args.variants.split(","):
        seq = generate(args.num_frames, h, w, intr=intr,
                       num_track=args.num_track, variant=variant)
        for assoc in args.associations.split(","):
            cfg = base_cfg.replace(solver=dataclasses.replace(
                base_cfg.solver, association=assoc,
                num_iterations=args.num_optimize_iterations))
            pipe = SuPerPipeline(cfg, intr)
            m = pipe.run(seq.depths, seq.colors, gt_xy=seq.gt_xy,
                         gt_valid=seq.gt_valid)
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
