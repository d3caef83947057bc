"""Hardened synthetic-scene variants (occlusion / depth noise / speculars).

The clean scene is too easy to defend accuracy claims on (VERDICT round-3
item 10); these check the variants render what they promise and that the
tracker degrades gracefully (finite errors, no blow-up) under them, for
both association modes.  Full 100+-frame accuracy bands:
scripts/accuracy_bands.py.
"""

import dataclasses

import numpy as np

from helpers import tiny_scene

from super_tpu.data.synthetic import generate

H, W = 96, 128


def test_occlusion_variant_renders_and_masks_gt():
    clean = generate(6, H, W, variant="clean")
    occ = generate(6, H, W, variant="occlusion")
    # The occluder overwrites a depth patch well in front of the surface.
    for t in range(6):
        n_near = np.sum(occ.depths[t] < 0.4)
        assert n_near > 100, t
        assert np.all(clean.depths[t] > 0.4)
    # Occluded GT points are marked invalid at some point of the sweep.
    assert occ.gt_valid.sum() < clean.gt_valid.sum()
    # Un-occluded trajectories are identical to the clean scene.
    np.testing.assert_allclose(occ.gt_xy, clean.gt_xy)


def test_noise_variant_has_dropout_and_jitter():
    clean = generate(3, H, W, variant="clean", seed=1)
    noisy = generate(3, H, W, variant="noise", seed=1)
    frac_nan = np.mean(np.isnan(noisy.depths))
    assert 0.003 < frac_nan < 0.05
    both = ~np.isnan(noisy.depths)
    dz = np.abs(noisy.depths[both] - clean.depths[both])
    assert 1e-5 < np.mean(dz) < 5e-3  # jitter present but small


def test_specular_variant_saturates_color_and_blows_depth():
    spec = generate(3, H, W, variant="specular")
    # Saturated highlight pixels exist.
    sat = np.mean(spec.colors.min(axis=-1) > 0.95, axis=(1, 2))
    assert np.all(sat > 1e-4)
    assert np.isnan(spec.depths).any()


def _track(variant, association, num_frames=8):
    from super_tpu.config import CapacityConfig
    from super_tpu.data.synthetic import default_intrinsics
    from super_tpu.pipeline import SuPerPipeline

    cfg, _, _, _ = tiny_scene(num_frames=2)
    cfg = cfg.replace(
        height=H, width=W,
        mesh_step_size=12,
        capacity=CapacityConfig(
            surfel_capacity=16384, node_capacity=128, edge_capacity=512,
            triangle_capacity=256, new_surfel_capacity=H * W,
            proj_map_depth=4),
        solver=dataclasses.replace(cfg.solver, association=association,
                                   num_iterations=4))
    intr = default_intrinsics(H, W)
    seq = generate(num_frames, H, W, variant=variant)
    pipe = SuPerPipeline(cfg, intr)
    return pipe.run(seq.depths, seq.colors, gt_xy=seq.gt_xy,
                    gt_valid=seq.gt_valid)


def test_tracker_degrades_gracefully_on_hard_variants():
    # Bounds are degradation ceilings, not accuracy targets.  Occlusion
    # genuinely corrupts occluded tracks for ANY geometry-only tracker:
    # the reference's data term has no correspondence-distance gate either
    # (super/loss.py:236-249 -- only NaN validity), so surfels under the
    # occluder are dragged toward it exactly as here.
    bound = {"occlusion": 60.0, "noise": 8.0}
    for assoc in ("per_frame", "per_iteration"):
        for variant in ("occlusion", "noise"):
            m = _track(variant, assoc)
            # Graceful degradation: bounded error, not a lost track/NaN.
            assert np.isfinite(m["reproj_mean"]), (variant, assoc)
            assert m["reproj_mean"] < bound[variant], (variant, assoc, m)
