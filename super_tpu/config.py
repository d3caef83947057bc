"""Typed configuration for the SuPer-TPU pipeline.

Replaces the reference's argparse flag soup (reference: options.py:8-350) with
frozen dataclasses that are hashable, so they can be closed over as static
arguments of ``jax.jit``.  Field names and defaults mirror the reference flags
so configs translate one-to-one; TPU-specific capacity fields are new (the
reference uses dynamic shapes, we carry fixed capacities + masks).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Residual-stack toggles and weights (reference: options.py:213-250,331-350)."""

    sf_point_plane: bool = True
    sf_point_plane_weight: float = 1.0
    # Autograd-face robustness (loss.py:368-377): drop residuals above
    # sf_point_plane_max (the raft_stereo 2e-5 clip, deform_mesh.py:95) and
    # Huber-style reweighting when huber_th > 0.
    sf_point_plane_max: float = -1.0
    huber_th: float = -1.0
    mesh_arap: bool = True
    mesh_arap_weight: float = 10.0
    mesh_rot: bool = True
    mesh_rot_weight: float = 1.0
    mesh_face: bool = False
    mesh_face_weight: float = 1.0
    sf_corr: bool = False
    sf_corr_weight: float = 1e-3
    sf_corr_loss_type: str = "point-point"
    sf_corr_match_renderimg: bool = False
    render_loss: bool = False
    render_loss_weight: float = 1e-4
    # Semantic-SuPer (reference: options.py:331-343)
    sf_hard_seg_point_plane: bool = False
    sf_soft_seg_point_plane: bool = False
    sf_bn_morph: bool = False
    sf_bn_morph_weight: float = 0.1


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Per-frame warp-field solver settings (reference: options.py:26-45)."""

    use_derived_gradient: bool = True   # True -> LM path (super/LM.py), False -> autograd
    optimizer: str = "SGD"              # autograd path: "SGD" | "Adam"
    learning_rate: float = 5e-5
    num_iterations: int = 10            # --num_optimize_iterations
    # LM damping schedule (reference: super/LM.py:81,109-117)
    lm_damping_init: float = 10.0
    lm_damping_factor: float = 7.5
    # Iteration schedule:
    #   "classic": assemble at the accepted point, solve, then a separate
    #     cost pass at the candidate (the reference's loop, LM.py:81-121);
    #   "deferred": evaluate the candidate's cost from the residuals of the
    #     *next* iteration's assembly (one fused pass per iteration; the
    #     accepted (JTJ, JTr) is cached so a rejection costs no re-assembly).
    #     Same candidate sequence as "classic" whenever the cost descends
    #     monotonically; ~1.5x fewer residual passes per solve.
    lm_schedule: str = "deferred"
    # Damping hypotheses tried per iteration (>1 batches the Cholesky and
    # the candidate cost pass over {u/v, u, u*v, ...} -- the parallel
    # accept/reject axis; 1 reproduces the reference's single-test schedule).
    lm_hypotheses: int = 1
    # Linear solve: "cholesky" (dense, exact; reference super/LM.py:37-51),
    # "pcg" (block-Jacobi preconditioned CG; scales to dense ED graphs), or
    # "pcg_pallas" (same preconditioned CG, all iterations fused into ONE
    # Pallas kernel with the matrix streamed from HBM -- ~5x cheaper than
    # the XLA Cholesky at J=320, pallas_kernels/pcg.py).
    linear_solver: str = "cholesky"
    pcg_iterations: int = 64
    pcg_tol: float = 1e-12
    # Surfel-chunk size for streaming the JTJ assembly (bounds peak memory
    # of the chain-rule temporaries; no effect on results).
    assembly_chunk: int = 65536
    # Moving-target (per_iteration) assembly: hoist the corner-bank
    # sampling into one big-chunk pass (losses.moving_mix_pass) instead of
    # sampling inside every assembly chunk.  No effect on results.
    # Measured on TPU (scripts/breakdown.py asm_mv_* stages, 480p): the
    # fused one-pass form at 64k chunks is fastest (8.7 ms vs 10.1
    # premixed vs 10.1/11.3 at 128k) -- the split's (m, r, mask) HBM
    # round-trip costs more than the per-chunk gathers it avoids once the
    # z-bank shrank those to 16 rows.
    moving_premix: bool = False
    # JTJ assembly strategy: "tuple" groups surfels by anchor tuple and
    # reduces on the MXU (fast on TPU); "scatter" is the direct scatter-add
    # reference path (used by tests and the sharded dry run).
    assembly_mode: str = "tuple"
    assembly_tuple_cap: int = 4096   # max distinct anchor tuples per frame
    assembly_pad_group: int = 32     # tuple runs padded to multiples of this
    # Level-2 reduction (per-G-block partial Grams -> per-tuple Grams):
    # "matmul" rides the MXU via a one-hot segment matmul (HIGHEST
    # precision, f32-faithful); "scatter" is the sorted .at[].add (kept for
    # cross-checks; ~1.5x slower on TPU).
    assembly_combine: str = "matmul"
    # Tuple->dense expansion: "pairs" gathers the symmetric half of the
    # 7x7 blocks in node-pair-sorted order (per-frame layout), one-hot
    # matmuls duplicates together, windowed-set-scatters the distinct
    # blocks and symmetrizes -- ~4x cheaper per LM iteration than
    # "scatter" (the 16-block conflict scatter + block->dense transpose).
    assembly_expand: str = "pairs"
    # Max distinct (unordered) node pairs across anchor tuples; overflow
    # pairs lose their JTJ blocks (surfaced via StepOutputs diagnostics).
    # ~2.4k distinct at the default 480p workload.
    assembly_pair_cap: int = 4096
    # Gram-reduction backend for the tuple assembly: "xla" (batched einsum +
    # sorted scatter) or "pallas" (fused sequential-accumulation kernel,
    # super_tpu/pallas_kernels/gram.py).  Identical results; at pad_group=32
    # the XLA path is currently faster (grid-step overhead), the Pallas
    # kernel wins for long tuple runs / larger pad groups.
    assembly_backend: str = "xla"
    # Storage dtype of the dense (7J, 7J) JTJ accumulator: "f32" or "bf16".
    # bf16 halves the dominant buffer of dense ED graphs (822 MB -> 411 MB
    # at J = 2048, the config that OOMed a single v5e); the per-tuple Gram
    # reduction stays f32, only the expanded dense matrix is stored bf16
    # (~0.4% relative error absorbed by the damped accept/reject loop).
    # bf16 requires linear_solver="pcg" (the matvec accumulates in f32).
    jtj_dtype: str = "f32"
    # Dtype of the one-hot segment-sum matmuls that combine G-block Grams
    # into tuples/pairs: "f32" (3 MXU passes, faithful) or "bf16" (1 pass,
    # ~3x cheaper; noise at the same order the Gram einsums already carry
    # under default MXU precision -- accumulation stays f32).
    gram_sum_dtype: str = "f32"
    # Dtype of the data-term Jacobian ROW math + Gram einsum in the frozen
    # (per_frame) assembly: "f32" | "bf16" (residuals/cost stay f32).
    # Measured NEGATIVE at 480p/g=32 (full assembly 5.6 ms bf16 vs 5.0
    # f32: the cast traffic eats the lane gains) -- kept for other shapes.
    jac_dtype: str = "f32"
    # Data association for the point-plane term:
    #   "per_iteration": re-project + re-sample the target maps inside every
    #     LM iteration (reference semantics, super/loss.py:222-248) --
    #     gather-bound on TPU;
    #   "per_frame": projective association once per frame (classical
    #     projective ICP a la KinectFusion); iterations then re-linearize
    #     only the warp.  ~10x fewer gathers, slightly different trajectory.
    #   "per_iteration_frozen": re-associate at every candidate but keep
    #     the frozen-target Jacobian (no chain through the bilinear
    #     weights) -- the experiment isolating which half of the
    #     per_iteration accuracy gap is the sampling chain.
    association: str = "per_iteration"


@dataclasses.dataclass(frozen=True)
class CapacityConfig:
    """Fixed capacities for the mask-carried state (TPU-specific; no reference
    equivalent -- the reference grows/shrinks tensors per frame)."""

    surfel_capacity: int = 1 << 17        # max live surfels (N_max)
    node_capacity: int = 512              # max ED nodes (J_max)
    edge_capacity: int = 2048             # max ED edges
    triangle_capacity: int = 1024         # max ED triangles
    # Max surfels *added* per fusion step: add candidates are compacted to
    # this capacity before ED-anchoring (the reference anchors however many
    # unmatched candidates exist, nodes.py:486-538; after frame 1 that is a
    # few thousand -- overflow candidates wait for the next frame).
    new_surfel_capacity: int = 16384
    # Per-pixel projection layers.  The reference keeps 16 (nodes.py:379);
    # beyond ~4 the deeper layers are almost never occupied, and the layer
    # pair-merge loop is O(depth^2), so 4 is the TPU default (overflow
    # surfels are deleted exactly as the reference deletes beyond-16 ones).
    proj_map_depth: int = 4
    # Capacity of the duplicate-merge multi-layer pixel list (fusion stage
    # 3).  None -> max(image_pixels // 128, 1024).  Overflowing pixels keep
    # their duplicates one more frame (dup_skipped counter); the converged
    # 480p bench measures ZERO multi-layer pixels, so the list is static
    # headroom, and its size is the stage's whole cost.
    dup_pixel_cap: Optional[int] = None
    track_capacity: int = 20              # tracked GT points (reference: 20)


@dataclasses.dataclass(frozen=True)
class SuPerConfig:
    """Top-level pipeline config.

    Mirrors reference SuPerOptions / SemanticSuPerOptions defaults
    (options.py:8-283, 285-350).
    """

    method: str = "super"                 # "super" | "semantic-super"
    data: str = "superv1"                 # "superv1" | "superv2"
    height: int = 480
    width: int = 640

    # KNN anchoring (options.py:46-51)
    num_ed_neighbors: int = 4             # K for node-node graph weights
    num_neighbors: int = 4                # K for surfel-node anchoring

    # Fusion thresholds (options.py:52-65)
    th_dist: float = 0.1
    th_cosine_ang: float = 0.4
    th_time_steps: int = 30

    # Fusion stage toggles (options.py:66-77)
    disable_removing_unstable_surfels: bool = False
    disable_merging_new_surfels: bool = False
    disable_merging_exist_surfels: bool = False
    disable_adding_new_surfels: bool = False

    # ED graph (options.py:95-97)
    mesh_step_size: int = 30

    # Depth preprocessing (options.py:99-164 & data_loader.py:374-433)
    normal_model: str = "8neighbors"      # "naive" | "8neighbors"
    depth_model: Optional[str] = None     # None | "monodepth2_stereo" | "raft_stereo"
    load_depth: bool = True
    min_depth: float = 0.1
    max_depth: float = 80.0
    depth_width_range: Tuple[float, float] = (0.02, 0.98)
    dilate_invalid_kernel: int = 5
    depth_filter_kernel_size: int = -1
    post_process: bool = False
    load_valid_mask: bool = False
    del_seg_classes: Tuple[int, ...] = ()
    disable_ssim_conf: bool = True

    # Semantic-SuPer (options.py:285-350)
    num_classes: int = 3
    hard_seg: bool = False
    load_seg: bool = False
    seg_model: Optional[str] = None

    # Renderer (options.py:173-180)
    renderer_rad: float = 2e-4

    # Projection-map construction (core/fusion.py:build_projection_maps):
    # "scatter" peels per-pixel confidence winners with 2L element-bound
    # scatters; "sort" is the two-pass stable argsort.  Identical results.
    proj_map_mode: str = "sort"

    losses: LossConfig = dataclasses.field(default_factory=LossConfig)
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    capacity: CapacityConfig = dataclasses.field(default_factory=CapacityConfig)

    # Evaluation
    save_sample_freq: int = 10
    tracking_gt_file: Optional[str] = None
    edge_ids: Tuple[int, ...] = ()

    @property
    def image_pixels(self) -> int:
        return self.height * self.width

    def replace(self, **kw) -> "SuPerConfig":
        return dataclasses.replace(self, **kw)


def semantic_super_config(**overrides) -> SuPerConfig:
    """Semantic-SuPer defaults (reference: options.py:285-350 set_defaults;
    the semantic losses run on the autograd path like the reference's
    default GraphFit solver)."""
    base = SuPerConfig(
        method="semantic-super",
        data="superv2",
        losses=LossConfig(
            sf_point_plane=False,
            sf_soft_seg_point_plane=True,
            mesh_arap=False,
            mesh_face=True,
            sf_bn_morph=True,
            render_loss=True,
        ),
        solver=SolverConfig(
            use_derived_gradient=False,
            optimizer="SGD",
        ),
    )
    return dataclasses.replace(base, **overrides)
