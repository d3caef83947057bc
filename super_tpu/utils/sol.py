"""Speed-of-light cost model for the tracking step's hot stages.

Gives every measured stage a DENOMINATOR: a modeled floor assembled from
measured TPU primitive costs (CLAUDE.md cost model, v5e single chip) plus
physical limits, so "is it actually fast" is a number (sol_frac =
floor / achieved), not a feeling.  MXU stages additionally report MFU.

Primitive model (480p-scale measurements):
- minor-axis gathers: ~1 ms fixed per op + bytes at an effective
  ~10 GB/s random-access rate (measured: F=8/17/28 f32 at 393k indices =
  2.3/5.3/5.1 ms; bf16 halves wide-F cost);
- conflict scatters: ~5 ns/element;
- 3-key lax.sort at 393k: ~1.7 ms;
- streaming HBM: 819 GB/s; MXU: ~197 bf16 / ~49 f32 TFLOP/s.

The floors are models, not guarantees -- they exist to FLAG stages that
fall below 50% of the model so regressions and unexplored headroom are
visible in the bench JSON.
"""

from __future__ import annotations

HBM_GBPS = 819.0
MXU_TFLOPS = {"bf16": 197.0, "f32": 49.0}
RAND_GATHER_GBPS = 10.0
GATHER_FIXED_MS = 1.0
SCATTER_NS_PER_ELEM = 5.0
SORT3_MS_PER_393K = 1.7


def gather_ms(n_idx: float, rows: float, elem_bytes: float = 4.0) -> float:
    return GATHER_FIXED_MS + n_idx * rows * elem_bytes / (
        RAND_GATHER_GBPS * 1e6)


def scatter_ms(n_elem: float) -> float:
    return n_elem * SCATTER_NS_PER_ELEM * 1e-6


def stream_ms(n_bytes: float) -> float:
    return n_bytes / (HBM_GBPS * 1e6)


def matmul_ms(flops: float, dtype: str = "f32") -> float:
    return flops / (MXU_TFLOPS[dtype] * 1e9)


def sort3_ms(n: float) -> float:
    return SORT3_MS_PER_393K * n / 393216.0


def stage_floors(np_cap: int, p: int, j: int, t_cap: int, k: int = 4,
                 a_cap: int = 8192, pcg_iters: int = 32,
                 num_lm_iters: int = 10) -> dict:
    """Modeled floors (ms) for the standard per_frame workload stages.

    np_cap: surfel capacity; p: pixels; j: node capacity; t_cap: tuple cap.
    Every term cites the operation it models; see each stage's code for
    the parity anchor.
    """
    f = 4.0  # f32 bytes

    # associate (identity): one 16-row z-bank gather (ops/bilinear.py) +
    # streaming the (K..3K, Np) geometry in and (3, Np) x2 + mask out.
    assoc = (gather_ms(np_cap, 16)
             + stream_ms((7 * k + 7) * np_cap * f))

    # frozen assemble trip (losses.frozen_chunk_partial_fm + segment-sum):
    # geometry + assoc rows streamed, 28x29 Gram on the MXU per surfel,
    # plus the block->tuple segment-sum matmul (t_cap x blocks).
    gram_flops = np_cap * 28 * 29 * 2
    seg_flops = (np_cap / 256) * t_cap * 28 * 29 * 2  # pad_group=256 blocks
    assemble = (stream_ms((7 * k + 8) * np_cap * f)
                + matmul_ms(gram_flops, "f32")
                + matmul_ms(seg_flops, "bf16"))

    # pairs-CG damped solve (pallas_kernels/pcg.py): VMEM-resident band
    # matvecs; floor ~ bank build stream + kernel dispatch.
    pair_cap = 8192  # assembly_pair_cap default
    solve = stream_ms(2 * 64 * pair_cap * f) + 0.2

    # fusion (core/fusion.py), steady-state fast path: 3-key sort (stage 1;
    # the layer-map scatters are lazy, built only when a multi-layer pixel
    # exists), stage-2 9-row frame gather + consumed-pixel scatter + bank
    # select, stage-3 skipped by the same cond, stage-3.5 pair-packed
    # reweight gather, stage-4 candidate gather + KNN matmul + packed
    # column scatter.
    fuse = (sort3_ms(np_cap)                                   # stage 1
            + gather_ms(np_cap, 9) + scatter_ms(np_cap)        # stage 2
            + gather_ms(k / 2 * np_cap, 2 * 4)                 # stage 3.5
            + gather_ms(a_cap, 14) + matmul_ms(a_cap * j * 8, "f32")
            + scatter_ms(26 * a_cap))                          # stage 4

    # prepare (losses.prepare_lm): tuple-layout sorts over (K, Np) keys +
    # z-bank build (16 x P streamed twice) + per-surfel geometry gathers.
    prepare = (2 * sort3_ms(np_cap) + stream_ms(2 * 16 * p * f)
               + gather_ms(np_cap, 3 * k + k))

    floors = {
        "assoc": assoc,
        "assemble": assemble,
        "solve": solve,
        "fuse": fuse,
        "prepare": prepare,
    }
    floors["step"] = (prepare + assoc + fuse
                      + num_lm_iters * (assemble + solve))
    return floors


def sol_report(achieved_ms: dict, floors: dict,
               mxu_flops: dict = None) -> dict:
    """{stage: {ms, floor_ms, sol_frac[, mfu]}}, flagging <50% stages."""
    out = {}
    for name, ms in achieved_ms.items():
        if name not in floors or ms <= 0:
            continue
        floor = floors[name]
        entry = {"ms": round(ms, 2), "floor_ms": round(floor, 2),
                 "sol_frac": round(min(floor / ms, 1.0), 3)}
        if mxu_flops and name in mxu_flops:
            entry["mfu"] = round(
                mxu_flops[name] / (ms * 1e-3) / (MXU_TFLOPS["f32"] * 1e12),
                4)
        if entry["sol_frac"] < 0.5:
            entry["below_floor"] = True
        out[name] = entry
    return out
