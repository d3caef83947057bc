"""Pallas kernel: tuple-accumulated Gram reduction for the JTJ assembly.

The level-1/level-2 reduction of core/assembly.py -- per-G-block Grams
``h^T [h | r]`` followed by a segment sum over the (sorted) block->tuple
map -- is the hottest reduction of the LM iteration.  The XLA formulation
needs a materialized (B, 812) partial buffer plus a B-row scatter-add.

This kernel fuses both levels: the grid walks the padded surfel blocks
*sequentially* (TPU grid semantics), computes each super-block's Gram on
the MXU, and accumulates it directly into the output row of its tuple,
using the scalar-prefetched block->tuple ids to drive the output
BlockSpec's index map.  Because consecutive grid steps that share a tuple
map to the same output block, the accumulation lives in VMEM and each
tuple's row is written back exactly once -- no scatter, no partial buffer.

Requires the same layout invariants as core/assembly.py: tuple runs padded
to multiples of the super-block size, block_tuple sorted ascending.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 28            # per-surfel gradient width (4 anchors x 7)
DE = 32           # D + residual column, padded to a sublane multiple


def _gram_kernel(block_tuple_ref, h_ref, r_ref, out_ref):
    i = pl.program_id(0)
    tid = block_tuple_ref[i]
    prev = block_tuple_ref[jnp.maximum(i - 1, 0)]
    is_first = (i == 0) | (tid != prev)

    h = h_ref[...]                       # (G, D)
    r = r_ref[...]                       # (G, 1) residual column
    ext = jnp.concatenate(
        [h, r, jnp.zeros((h.shape[0], DE - D - 1), h.dtype)], axis=1)
    gram = jax.lax.dot_general(
        h, ext, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (D, DE)

    @pl.when(is_first)
    def _():
        out_ref[...] = gram[None]

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[...] = out_ref[...] + gram[None]


@functools.partial(jax.jit, static_argnames=("tuple_cap", "block",
                                             "interpret"))
def tuple_gram_pallas(h, r, block_tuple, *, tuple_cap: int,
                      block: int = 512, interpret: bool = False):
    """Fused per-tuple Gram accumulation.

    Args:
      h: (Np, D) gradient rows, tuple-sorted/padded order, Np % block == 0,
        and every tuple run is a multiple of ``block`` rows (callers ensure
        this by choosing pad_group == block or padding further).
      r: (Np,) residuals.
      block_tuple: (Np // block,) int32 sorted tuple id per super-block.
      tuple_cap: number of output tuple rows.
    Returns: (gram (T, D, D), jtr_t (T, D)) like assembly.block_reduce.
    """
    np_cap, d = h.shape
    assert d == D
    nblocks = np_cap // block
    if jax.default_backend() != "tpu" and not interpret:
        # Compiled-XLA reference (same math): per-block Grams + a
        # segment-sum over the sorted block->tuple map.  Off-TPU the
        # interpreter is ~100x slower, which skews shard_map threads into
        # XLA's in-process collective rendezvous timeout (see
        # pallas_kernels/pcg.py); interpret=True still forces the kernel.
        hb = h.reshape(nblocks, block, D)
        ext = jnp.concatenate([hb, r.reshape(nblocks, block, 1)], axis=-1)
        grams = jax.lax.dot_general(
            hb, ext, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (B, D, D+1)
        out = jnp.zeros((tuple_cap, D, D + 1), jnp.float32).at[
            block_tuple].add(grams)
        return out[:, :, :D], out[:, :, D]
    # The output row index follows the prefetched block->tuple map
    # (PrefetchScalarGridSpec scalars are visible to index_maps).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block, D), lambda i, bt: (i, 0)),
            pl.BlockSpec((block, 1), lambda i, bt: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, D, DE), lambda i, bt: (bt[i], 0, 0)),
    )
    out = pl.pallas_call(
        _gram_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tuple_cap, D, DE), jnp.float32),
        interpret=interpret,
    )(block_tuple, h, r.reshape(np_cap, 1))
    # Tuples with no blocks are never visited: their rows hold garbage
    # (possibly NaN) -> select zeros, don't multiply.
    visited = jnp.zeros((tuple_cap,), bool).at[block_tuple].set(True)
    out = jnp.where(visited[:, None, None], out, 0.0)
    return out[:, :, :D], out[:, :, D]
