"""Pallas kernel: fused conjugate-gradient solve of the damped normal system.

The LM inner solve (reference super/LM.py:100, cuSOLVER Cholesky) costs
~6.3 ms per iteration at J=320 as an XLA Cholesky: the panel factorization
is latency-serial, and an XLA-level PCG is no cheaper because every CG
iteration launches ~10 small kernels.  This kernel runs ALL CG iterations
in ONE launch: the (dim, dim) matrix stays in HBM (too big for VMEM at
20 MB) and is streamed through a double-buffered row-tile pipeline once per
matvec (~20 MB/iteration => bandwidth-floor ~25 us), while the vectors and
the scalar recurrences live in VMEM/registers.

Preconditioning is folded into the system BEFORE the kernel (see
``block_precondition`` in core/lm.py): with A-hat = L^-1 A L^-T for the
block-diagonal Cholesky L of A's 7x7 node blocks, A-hat has unit diagonal
blocks, so the in-kernel iteration is plain CG -- no preconditioner state.

Symmetry trick: the matvec accumulates ap += p[tile] @ A[tile_rows, :]
over row tiles, which computes A^T p = A p (A symmetric) with every
partial product lane-aligned to the (1, dim) vector layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pcg_kernel(a_hbm, b_ref, x_ref, r_ref, p_ref, ap_ref, a_buf, sems,
                *, iterations: int, row_block: int):
    dim_p = b_ref.shape[1]
    nb = dim_p // row_block

    x_ref[...] = jnp.zeros_like(x_ref)
    r_ref[...] = b_ref[...]
    p_ref[...] = b_ref[...]
    rz0 = jnp.sum(r_ref[...] * r_ref[...])

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            a_hbm.at[pl.ds(i * row_block, row_block), :],
            a_buf.at[slot],
            sems.at[slot],
        )

    def matvec():
        """ap <- A p, streaming A row tiles HBM -> VMEM (double-buffered)."""
        get_dma(0, 0).start()

        def tile_body(i, _):
            slot = i % 2

            @pl.when(i + 1 < nb)
            def _():
                get_dma((i + 1) % 2, i + 1).start()

            get_dma(slot, i).wait()
            part = jax.lax.dot_general(
                p_ref[:, pl.ds(i * row_block, row_block)], a_buf[slot],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (1, dim_p)

            @pl.when(i == 0)
            def _():
                ap_ref[...] = part

            @pl.when(i > 0)
            def _():
                ap_ref[...] = ap_ref[...] + part

            return 0

        jax.lax.fori_loop(0, nb, tile_body, 0)

    def cg_body(_, rz):
        matvec()
        pap = jnp.sum(p_ref[...] * ap_ref[...])
        alpha = jnp.where(jnp.abs(pap) > 1e-30, rz / pap, 0.0)
        x_ref[...] = x_ref[...] + alpha * p_ref[...]
        r_ref[...] = r_ref[...] - alpha * ap_ref[...]
        rz_new = jnp.sum(r_ref[...] * r_ref[...])
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p_ref[...] = r_ref[...] + beta * p_ref[...]
        return rz_new

    jax.lax.fori_loop(0, iterations, cg_body, rz0)


def _pairs_cg_kernel(blk_ref, blkt_ref, n1_ref, n2_ref, minv_ref, b_ref,
                     x0_ref, u_ref, x_ref, r_ref, p_ref, z_ref, ap_ref,
                     oh1_ref, oh2_ref, t_ref, g_ref, *, iterations: int):
    """PCG on the pair-sparse normal equations, fully VMEM-resident.

    Layouts (J = padded node count, P = pair capacity):
      blk_ref/blkt_ref: (64, P) pair blocks in DIAGONAL-BAND form, row
        8d+i = B[i, (i+d) % 8] (and B^T's bands) -- a 7x7-block matvec is
        then 8 aligned multiply-adds against rolled copies of the operand,
        t[i] = sum_d band_d[i] * v[(i+d) % 8], with no sublane reshapes.
      n1/n2: (1, P) int32 pair node ids (out-of-range = sink, matches no
        one-hot column).
      minv_ref: (64, J) block-Jacobi inverse in the same band form.
      b/x/r/p/z/ap: (8, J) node-major vectors (row 7 = zero).
      oh1/oh2_ref: (J, P) one-hot matrices of n1/n2, built ONCE before the
        loop (they are loop-invariant; regenerating per use cost ~3 VPU
        fills of J x P per CG iteration) -- Pallas cannot gather VMEM rows
        dynamically, so gathers/scatters between the (8, J) vectors and
        the (8, P) pair lanes are MXU one-hot products.
      t_ref: (8, P) pair-lane scratch; g_ref: (8, P) gathered-x scratch.
    """
    u = u_ref[0]

    def onehot_into(oh_ref, n_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, oh_ref.shape, 0)
        oh_ref[...] = jnp.where(rows == n_ref[...], 1.0, 0.0)

    onehot_into(oh1_ref, n1_ref)                         # rows of S
    onehot_into(oh2_ref, n2_ref)                         # columns of S

    def band_mv(band_ref, v):
        """(8, N) result: out[i] = sum_d band[8d+i] * v[(i+d) % 8]."""
        acc = band_ref[0:8] * v
        for d in range(1, 8):
            # roll by 8-d == roll by -d on the length-8 sublane axis:
            # out[i] = v[(i + d) % 8] (pltpu.roll requires shift >= 0).
            acc = acc + band_ref[8 * d:8 * d + 8] * pltpu.roll(v, 8 - d, 0)
        return acc

    def matvec():
        """ap <- (S + S^T + u I) p."""
        g_ref[...] = jax.lax.dot_general(
            p_ref[...], oh2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # p[n2] as (8, P)
        t_ref[...] = band_mv(blk_ref, g_ref[...])
        ap_ref[...] = jax.lax.dot_general(
            t_ref[...], oh1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # scatter to nodes
        g_ref[...] = jax.lax.dot_general(
            p_ref[...], oh1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # p[n1]
        t_ref[...] = band_mv(blkt_ref, g_ref[...])
        ap_ref[...] = ap_ref[...] + jax.lax.dot_general(
            t_ref[...], oh2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + u * p_ref[...]

    def precond(v):
        return band_mv(minv_ref, v)

    # Warm start: x = x0, r = b - A x0 (the LM loop passes the previous
    # iteration's delta -- the damped systems differ only mildly between
    # consecutive LM iterations, cutting CG iterations severalfold).
    x_ref[...] = x0_ref[...]
    p_ref[...] = x0_ref[...]
    matvec()
    r_ref[...] = b_ref[...] - ap_ref[...]
    z_ref[...] = precond(r_ref[...])
    p_ref[...] = z_ref[...]
    rz0 = jnp.sum(r_ref[...] * z_ref[...])

    def cg_body(_, rz):
        matvec()
        pap = jnp.sum(p_ref[...] * ap_ref[...])
        alpha = jnp.where(jnp.abs(pap) > 1e-30, rz / pap, 0.0)
        x_ref[...] = x_ref[...] + alpha * p_ref[...]
        r_ref[...] = r_ref[...] - alpha * ap_ref[...]
        z_ref[...] = precond(r_ref[...])
        rz_new = jnp.sum(r_ref[...] * z_ref[...])
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p_ref[...] = z_ref[...] + beta * p_ref[...]
        return rz_new

    jax.lax.fori_loop(0, iterations, cg_body, rz0)


def _pairs_cg_kernel_chunked(blk_ref, blkt_ref, n1_ref, n2_ref, minv_ref,
                             b_ref, x0_ref, u_ref, x_ref, r_ref, p_ref,
                             z_ref, ap_ref, oh_ref, *, iterations: int,
                             chunk: int):
    """Pair-sparse PCG for DENSE pair tables: chunked one-hot scratch.

    The persistent (J, P) one-hot pair of :func:`_pairs_cg_kernel` is
    ~100 MB at mesh-16 scale (J=1280, P~19k) -- far past VMEM.  Here ONE
    (J, chunk) scratch is regenerated per pair chunk per use (a VPU iota
    compare, ~free next to the MXU products), with the chunk loop
    statically unrolled (no dynamic VMEM indexing).  3 fills + 4 small
    MXU products per chunk; banks stay f32 VMEM-resident.  Same
    recurrence and epsilons as _pairs_cg_kernel (sum order differs by
    the chunking -- f32 reassociation only).
    """
    u = u_ref[0]
    p_cap = blk_ref.shape[1]
    jp = b_ref.shape[1]
    nc = p_cap // chunk

    def band_mv_slice(band_ref, v, c0):
        acc = band_ref[0:8, c0:c0 + chunk] * v
        for d in range(1, 8):
            acc = acc + band_ref[8 * d:8 * d + 8, c0:c0 + chunk] * \
                pltpu.roll(v, 8 - d, 0)
        return acc

    def band_mv(band_ref, v):
        acc = band_ref[0:8] * v
        for d in range(1, 8):
            acc = acc + band_ref[8 * d:8 * d + 8] * pltpu.roll(v, 8 - d, 0)
        return acc

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (jp, chunk), 0)

    def matvec():
        """ap <- (S + S^T + u I) p, accumulated over pair chunks."""
        ap_ref[...] = u * p_ref[...]
        for c in range(nc):  # static unroll: no dynamic VMEM slicing
            c0 = c * chunk
            n1c = n1_ref[0, c0:c0 + chunk][None, :]
            n2c = n2_ref[0, c0:c0 + chunk][None, :]
            # y1 = B p[n2] scattered to n1 ...
            oh_ref[...] = jnp.where(rows_iota == n2c, 1.0, 0.0)
            g = jax.lax.dot_general(
                p_ref[...], oh_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (8, chunk)
            t = band_mv_slice(blk_ref, g, c0)
            oh_ref[...] = jnp.where(rows_iota == n1c, 1.0, 0.0)
            ap_ref[...] = ap_ref[...] + jax.lax.dot_general(
                t, oh_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # ... and y2 = B^T p[n1] scattered to n2 (oh currently n1).
            g = jax.lax.dot_general(
                p_ref[...], oh_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t = band_mv_slice(blkt_ref, g, c0)
            oh_ref[...] = jnp.where(rows_iota == n2c, 1.0, 0.0)
            ap_ref[...] = ap_ref[...] + jax.lax.dot_general(
                t, oh_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    def precond(v):
        return band_mv(minv_ref, v)

    x_ref[...] = x0_ref[...]
    p_ref[...] = x0_ref[...]
    matvec()
    r_ref[...] = b_ref[...] - ap_ref[...]
    z_ref[...] = precond(r_ref[...])
    p_ref[...] = z_ref[...]
    rz0 = jnp.sum(r_ref[...] * z_ref[...])

    def cg_body(_, rz):
        matvec()
        pap = jnp.sum(p_ref[...] * ap_ref[...])
        alpha = jnp.where(jnp.abs(pap) > 1e-30, rz / pap, 0.0)
        x_ref[...] = x_ref[...] + alpha * p_ref[...]
        r_ref[...] = r_ref[...] - alpha * ap_ref[...]
        z_ref[...] = precond(r_ref[...])
        rz_new = jnp.sum(r_ref[...] * z_ref[...])
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p_ref[...] = z_ref[...] + beta * p_ref[...]
        return rz_new

    jax.lax.fori_loop(0, iterations, cg_body, rz0)


def _pairs_cg_ref(blk_pad, blkt_pad, n1, n2, minv8, b8, x08, u,
                  *, iterations: int):
    """Pure-XLA reference of _pairs_cg_kernel (identical recurrence).

    Used as the non-TPU fallback: interpreting the kernel is ~100x slower
    than compiled XLA, which skews shard_map threads enough to trip XLA's
    hardcoded 40 s in-process collective rendezvous timeout on the virtual
    CPU mesh (the round-3 MULTICHIP rc=134).  Same band matvec, same
    block-Jacobi preconditioning, same warm start, same epsilons -- the
    gathers/scatters are index ops instead of one-hot matmuls.
    """
    jp = b8.shape[1]

    def band_mv(band, v):
        acc = band[0:8] * v
        for d in range(1, 8):
            # out[i] = v[(i + d) % 8], as in the kernel's pltpu.roll(8-d).
            acc = acc + band[8 * d:8 * d + 8] * jnp.roll(v, -d, axis=0)
        return acc

    valid1 = n1 < jp
    valid2 = n2 < jp
    c1 = jnp.where(valid1, n1, 0)
    c2 = jnp.where(valid2, n2, 0)
    s1 = jnp.where(valid1, n1, jp)  # sink column for out-of-range pairs
    s2 = jnp.where(valid2, n2, jp)

    def gather(p, c, valid):
        return jnp.where(valid[None, :], p[:, c], 0.0)

    def scatter(t, s):
        out = jnp.zeros((8, jp + 1), t.dtype).at[:, s].add(t)
        return out[:, :jp]

    def matvec(p):
        t = band_mv(blk_pad, gather(p, c2, valid2))
        ap = scatter(t, s1)
        t = band_mv(blkt_pad, gather(p, c1, valid1))
        return ap + scatter(t, s2) + u * p

    def precond(v):
        return band_mv(minv8, v)

    x = x08
    r = b8 - matvec(x08)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(_, carry):
        x, r, p, rz = carry
        ap = matvec(p)
        pap = jnp.sum(p * ap)
        alpha = jnp.where(jnp.abs(pap) > 1e-30, rz / pap, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iterations, body, (x, r, p, rz))
    return x


def _pairs_cg_call(blk_pad, blkt_pad, n1, n2, minv8, b8, x08, u,
                   *, iterations: int, interpret: bool):
    """One unbatched kernel launch (shapes already 8/128-padded).

    ``sequential_vmap``: a vmapped call (multi-stream batching) lowers to a
    ``lax.map`` over the batch -- each launch's block specs stay rank-2 as
    the kernel requires.  Sequential is the honest semantics anyway: the
    kernel already fills the chip, so batched streams gain nothing from a
    batched launch here.
    """
    p_cap = blk_pad.shape[1]
    jp = b8.shape[1]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # Two persistent (J, P) one-hots fit small pair tables (headline:
    # 384 x 4096 f32 = 6.3 MB each); past the threshold, switch to the
    # chunked kernel (one (J, chunk) scratch regenerated per use).
    if 2 * jp * p_cap * 4 > _PAIRS_PERSISTENT_OH_MAX:
        chunk = _PAIRS_CHUNK
        kernel = functools.partial(_pairs_cg_kernel_chunked,
                                   iterations=iterations, chunk=chunk)
        # bf16 banks: the f32 banks alone are ~10 MB at P~19k and blow the
        # 16 MB scoped-VMEM cap; the chunked path only engages for dense
        # configs whose pair blocks are already bf16-summed.
        blk_pad = blk_pad.astype(jnp.bfloat16)
        blkt_pad = blkt_pad.astype(jnp.bfloat16)
        scratch = [
            pltpu.VMEM((8, jp), jnp.float32),    # r
            pltpu.VMEM((8, jp), jnp.float32),    # p
            pltpu.VMEM((8, jp), jnp.float32),    # z
            pltpu.VMEM((8, jp), jnp.float32),    # ap
            pltpu.VMEM((jp, chunk), jnp.float32),  # one-hot scratch
        ]
    else:
        kernel = functools.partial(_pairs_cg_kernel, iterations=iterations)
        scratch = [
            pltpu.VMEM((8, jp), jnp.float32),    # r
            pltpu.VMEM((8, jp), jnp.float32),    # p
            pltpu.VMEM((8, jp), jnp.float32),    # z
            pltpu.VMEM((8, jp), jnp.float32),    # ap
            pltpu.VMEM((jp, p_cap), jnp.float32),  # one-hot of n1
            pltpu.VMEM((jp, p_cap), jnp.float32),  # one-hot of n2
            pltpu.VMEM((8, p_cap), jnp.float32),   # pair-lane scratch
            pltpu.VMEM((8, p_cap), jnp.float32),   # gathered-x scratch
        ]
    return pl.pallas_call(
        kernel,
        in_specs=[vspec] * 7 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((8, jp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(blk_pad, blkt_pad, n1.reshape(1, p_cap), n2.reshape(1, p_cap),
      minv8, b8, x08, u.reshape(1))


_PAIRS_PERSISTENT_OH_MAX = 24 * 1024 * 1024  # bytes; tests may lower
_PAIRS_CHUNK = 512


_pairs_cg_call_seq = {}  # (iterations, interpret) -> sequential_vmap'd fn


@functools.partial(jax.jit, static_argnames=("iterations", "interpret"))
def pairs_cg_pallas(blk_pad, blkt_pad, n1, n2, minv_pad, b_fm, u, x0_fm=None,
                    *, iterations: int = 32, interpret: bool = False):
    """Block-Jacobi PCG on pair-sparse normal equations in ONE kernel.

    Args:
      blk_pad, blkt_pad: (64, P) padded pair blocks (row 8g+s = B[s,g] and
        B[g,s]; see core/lm.py:_pairs_fused_solve).
      n1, n2: (P,) int32 node ids of each pair (>= J for the sink).
      minv_pad: (64, J) padded inverse diagonal blocks.
      b_fm: (7, J) feature-major right-hand side.
      u: () damping added to the matvec diagonal.
    Returns: (7, J) solution.

    vmap-safe: batched calls run the kernel once per batch element
    (sequential_vmap) -- see _pairs_cg_call.

    Off-TPU the call runs _pairs_cg_ref (compiled XLA, same math) unless
    ``interpret=True`` is passed explicitly -- interpreting the kernel is
    ~100x slower and blows XLA's in-process collective rendezvous timeout
    under shard_map (tests keep interpret=True coverage of the kernel).
    """
    use_ref = jax.default_backend() != "tpu" and not interpret
    j = b_fm.shape[1]
    jp = -(-j // 128) * 128
    b8 = jnp.zeros((8, jp), jnp.float32).at[:7, :j].set(
        b_fm.astype(jnp.float32))
    if x0_fm is None:
        x08 = jnp.zeros((8, jp), jnp.float32)
    else:
        x08 = jnp.zeros((8, jp), jnp.float32).at[:7, :j].set(
            x0_fm.astype(jnp.float32))
    minv8 = jnp.zeros((64, jp), jnp.float32).at[:, :j].set(
        minv_pad.astype(jnp.float32))

    if use_ref:
        x = _pairs_cg_ref(
            blk_pad.astype(jnp.float32), blkt_pad.astype(jnp.float32),
            n1, n2, minv8, b8, x08, jnp.asarray(u, jnp.float32),
            iterations=iterations)
        return x[:7, :j]

    p_cap = blk_pad.shape[1]
    if (2 * jp * p_cap * 4 > _PAIRS_PERSISTENT_OH_MAX
            and p_cap % _PAIRS_CHUNK != 0):
        # Chunked kernel: pad the pair axis to a chunk multiple (sink ids
        # match no one-hot column, zero banks contribute nothing).
        pad = (-p_cap) % _PAIRS_CHUNK
        blk_pad = jnp.pad(blk_pad, ((0, 0), (0, pad)))
        blkt_pad = jnp.pad(blkt_pad, ((0, 0), (0, pad)))
        n1 = jnp.pad(n1, (0, pad), constant_values=jp)
        n2 = jnp.pad(n2, (0, pad), constant_values=jp)

    key = (iterations, interpret)
    if key not in _pairs_cg_call_seq:
        _pairs_cg_call_seq[key] = jax.custom_batching.sequential_vmap(
            functools.partial(_pairs_cg_call, iterations=iterations,
                              interpret=interpret))
    x = _pairs_cg_call_seq[key](
        blk_pad.astype(jnp.float32), blkt_pad.astype(jnp.float32),
        n1, n2, minv8, b8, x08, jnp.asarray(u, jnp.float32))
    return x[:7, :j]


def _pcg_ref(a, b2, *, iterations: int):
    """Pure-XLA reference of _pcg_kernel (same CG recurrence, same
    epsilons); the non-TPU fallback -- see _pairs_cg_ref."""
    x = jnp.zeros_like(b2)
    r = b2
    p = b2
    rz = jnp.sum(r * r)

    def body(_, carry):
        x, r, p, rz = carry
        ap = p @ a  # A symmetric: p @ A == (A p)^T, as in the kernel
        pap = jnp.sum(p * ap)
        alpha = jnp.where(jnp.abs(pap) > 1e-30, rz / pap, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rz_new = jnp.sum(r * r)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = r + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iterations, body, (x, r, p, rz))
    return x


def _pcg_call(a, b2, *, iterations: int, row_block: int, interpret: bool):
    """One unbatched dense-CG launch (sequential under vmap, as above)."""
    dim_p = a.shape[0]
    kernel = functools.partial(_pcg_kernel, iterations=iterations,
                               row_block=row_block)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # A stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, dim_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, dim_p), jnp.float32),     # r
            pltpu.VMEM((1, dim_p), jnp.float32),     # p
            pltpu.VMEM((1, dim_p), jnp.float32),     # ap
            pltpu.VMEM((2, row_block, dim_p), jnp.float32),  # A tiles
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(a, b2)


_pcg_call_seq = {}


@functools.partial(jax.jit, static_argnames=("iterations", "row_block",
                                             "interpret"))
def pcg_pallas(a, b, *, iterations: int = 32, row_block: int = 256,
               interpret: bool = False):
    """Solve ``a @ x = b`` (a symmetric PD, unit-ish diagonal) by fused CG.

    Args:
      a: (dim, dim) float32, symmetric.  Padded internally to a multiple of
        ``row_block`` (zero padding; CG iterates stay exactly zero in the
        padded coordinates because r0 = b is zero there).
      b: (dim,) float32.
    Returns: (dim,) float32 solution after ``iterations`` CG steps.

    vmap-safe via sequential_vmap (one launch per batch element).

    Off-TPU: compiled-XLA reference (_pcg_ref) unless interpret=True is
    passed explicitly (see pairs_cg_pallas).
    """
    use_ref = jax.default_backend() != "tpu" and not interpret
    dim = a.shape[0]
    lcm = max(row_block, 128)
    dim_p = -(-dim // lcm) * lcm
    if dim_p != dim:
        a = jnp.pad(a, ((0, dim_p - dim), (0, dim_p - dim)))
        b = jnp.pad(b, (0, dim_p - dim))

    if use_ref:
        x = _pcg_ref(a, b.reshape(1, dim_p), iterations=iterations)
        return x[0, :dim]

    key = (iterations, row_block, interpret)
    if key not in _pcg_call_seq:
        _pcg_call_seq[key] = jax.custom_batching.sequential_vmap(
            functools.partial(_pcg_call, iterations=iterations,
                              row_block=row_block, interpret=interpret))
    x = _pcg_call_seq[key](a, b.reshape(1, dim_p))
    return x[0, :dim]
