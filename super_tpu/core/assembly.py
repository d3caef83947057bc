"""MXU-friendly JTJ assembly via tuple grouping.

The point-plane data term contributes, per surfel, a rank-1 update
``h h^T`` (h = the 28-dim stacked per-anchor gradient) to the 16 7x7 JTJ
blocks addressed by its 4-anchor tuple.  A naive scatter of N x 16 x 49
values serializes on TPU (~400 ms at N = 300k); but surfels overwhelmingly
share anchor tuples (spatial coherence of the KNN anchoring), so:

1. *Per frame* (anchors are fixed across LM iterations): sort surfels by
   anchor tuple and pad each tuple's run to a multiple of G, G-aligned.
   Every G-block of the padded order then lies inside exactly ONE tuple.
2. *Per iteration*: compute h in the padded order; reduce each G-block with
   one tiny matmul (batched einsum, ~Np * 28 * 29 * 2 flops total); combine
   the per-block partial Grams into per-tuple Grams with a small sorted
   scatter (blocks = Np / G rows); finally expand the (T, 28, 28) tuple
   Grams into the dense JTJ with a T x 16-block scatter.

Everything is shape-static; inactive surfels sort into a masked sink tuple
with zeroed contributions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TupleLayout(NamedTuple):
    """Per-frame static structure for the tuple-grouped assembly."""

    src_of: jnp.ndarray        # (Np,) original surfel id per padded slot
    slot_valid: jnp.ndarray    # (Np,) real + in-range surfel (not padding)
    block_tuple: jnp.ndarray   # (Np / G,) tuple id of each G-block
    tuple_nodes: jnp.ndarray   # (T, K) node ids of each tuple
    overflow_count: jnp.ndarray  # () int32 active surfels dropped into the
    #   sink tuple (tuple_cap exceeded) -- their residuals are lost, so a
    #   nonzero count means assembly_tuple_cap is undersized for this frame.

    @property
    def padded_size(self):
        return self.src_of.shape[0]


def build_tuple_layout(knn_idx, active, node_cap: int, *, tuple_cap: int,
                       pad_group: int, chunk: int = 32768) -> TupleLayout:
    """Sort surfels by anchor tuple and build the G-aligned padded layout.

    Args:
      knn_idx: (K, N) anchor node ids (feature-major); active: (N,) validity.
      tuple_cap: max distinct tuples T; the last id is a masked sink for
        overflow (and for the inactive-surfel pseudo-tuple, which sorts
        last), so overflow degrades to dropped residuals, never corruption.
      pad_group: G; tuple runs padded to multiples of G.
    """
    k, n = knn_idx.shape
    assert k == 4, "tuple layout assumes K=4 anchors"
    # Lexicographic sort key (two int32 words; node_cap^2 must fit int32).
    k1 = knn_idx[0] * node_cap + knn_idx[1]
    k2 = knn_idx[2] * node_cap + knn_idx[3]
    big = node_cap * node_cap
    k1 = jnp.where(active, k1, big)  # inactive surfels sort last
    k2 = jnp.where(active, k2, big)

    # One unstable 3-key sort == the two chained stable argsorts: the slot
    # id as final key makes the order total, and XLA's non-stable variadic
    # sort is ~20x cheaper than its stable one on TPU.
    k1s, k2s, perm = jax.lax.sort(
        (k1, k2, jnp.arange(n, dtype=jnp.int32)), num_keys=3,
        is_stable=False)

    new_tuple = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1]),
    ])
    tid_raw = jnp.cumsum(new_tuple) - 1
    in_range = tid_raw < tuple_cap - 1
    tid_sorted = jnp.clip(tid_raw, 0, tuple_cap - 1).astype(jnp.int32)
    # Active surfels pushed past the sink boundary lose their residuals --
    # surface the count so undersized tuple caps are visible (StepOutputs).
    overflow_count = jnp.sum((~in_range) & active[perm]).astype(jnp.int32)

    # Tuple sizes and G-aligned padded bases.
    ones = jnp.ones((n,), dtype=jnp.int32)
    sizes = jnp.zeros((tuple_cap,), dtype=jnp.int32).at[tid_sorted].add(ones)
    padded_sizes = ((sizes + pad_group - 1) // pad_group) * pad_group
    pbase = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(padded_sizes)[:-1].astype(jnp.int32)])
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(sizes)[:-1].astype(jnp.int32)])

    pos_in_tuple = jnp.arange(n, dtype=jnp.int32) - base[tid_sorted]
    dest = pbase[tid_sorted] + pos_in_tuple

    # Padded capacity: multiple of the streaming chunk (which itself must be
    # a multiple of pad_group) so chunked scans tile exactly.
    assert chunk % pad_group == 0
    np_cap = ((n + tuple_cap * pad_group + chunk - 1) // chunk) * chunk
    src_of = jnp.full((np_cap,), n, dtype=jnp.int32).at[
        jnp.where(in_range, dest, np_cap)].set(perm.astype(jnp.int32),
                                               mode="drop")
    slot_valid = src_of < n
    src_of = jnp.where(slot_valid, src_of, 0)

    # Tuple id per G-block: block b covers slots [bG, (b+1)G) which lie in
    # one tuple; identify it via searchsorted over padded run ends.
    pend = jnp.cumsum(padded_sizes)
    block_starts = jnp.arange(np_cap // pad_group, dtype=jnp.int32) * pad_group
    block_tuple = jnp.searchsorted(pend, block_starts, side="right")
    block_tuple = jnp.clip(block_tuple, 0, tuple_cap - 1).astype(jnp.int32)

    # Node ids per tuple (channel-wise rank-1 scatters).
    cols = []
    for kk in range(k):
        cols.append(jnp.zeros((tuple_cap,), dtype=jnp.int32).at[
            tid_sorted].set(knn_idx[kk][perm], mode="drop"))
    tuple_nodes = jnp.stack(cols, axis=1)

    return TupleLayout(src_of=src_of, slot_valid=slot_valid,
                       block_tuple=block_tuple, tuple_nodes=tuple_nodes,
                       overflow_count=overflow_count)


def block_reduce(layout: TupleLayout, h, r, *, pad_group: int):
    """Per-surfel rank-1 terms -> per-tuple Grams.

    Args:
      h: (Np, D) gradient rows in padded order (zeros at padding); D = 28.
      r: (Np,) residuals in padded order.
    Returns: (gram (T, D, D), jtr_t (T, D)).
    """
    np_cap, d = h.shape
    t_cap = layout.tuple_nodes.shape[0]
    nblocks = np_cap // pad_group
    hb = h.reshape(nblocks, pad_group, d)
    ext = jnp.concatenate([hb, (r.reshape(nblocks, pad_group))[..., None]],
                         axis=-1)                          # (B, G, D+1)
    # Level 1: one tiny matmul per G-block (MXU batched), flattened to
    # (B, D*(D+1)) so neither level materializes a padded (.., 28, 29) tile.
    partial = jnp.einsum("bgi,bgj->bij", hb, ext).reshape(nblocks, d * (d + 1))
    # Level 2: combine blocks per tuple (sorted ids, B ~ Np/G rows).
    acc = jnp.zeros((t_cap, d * (d + 1)), dtype=h.dtype).at[
        layout.block_tuple].add(partial)
    acc = acc.reshape(t_cap, d, d + 1)
    return acc[..., :d], acc[..., d]


def expand_to_blocks(layout: TupleLayout, gram, jtr_t, jtj, jtr):
    """Scatter per-tuple Grams into the dense (7J, 7J) normal matrix and
    (J, 7) JTr.  The sink tuple (last id) carries only masked contributions
    (zeros), so adding it is harmless."""
    from super_tpu.core.losses import _add_blocks

    t_cap, d, _ = gram.shape
    k = layout.tuple_nodes.shape[1]
    g5 = gram.reshape(t_cap, k, 7, k, 7).transpose(0, 1, 3, 2, 4)
    nodes = layout.tuple_nodes
    jtj = _add_blocks(jtj, nodes[:, :, None], nodes[:, None, :], g5)
    jtr = jtr.at[nodes].add(-jtr_t.reshape(t_cap, k, 7))
    return jtj, jtr
