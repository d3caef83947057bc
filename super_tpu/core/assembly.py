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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class TupleLayout(NamedTuple):
    """Per-frame static structure for the tuple-grouped assembly."""

    sort_perm: jnp.ndarray     # (N,) surfel id per SORTED position
    src_pos: jnp.ndarray       # (Np,) sorted position per padded slot
    #   (clipped; don't-care where not slot_valid).  The old per-slot
    #   surfel id `src_of = sort_perm[src_pos]` cost a dedicated 1-row
    #   460k-index gather; consumers now compose two packed gathers
    #   (bank[:, sort_perm])[:, src_pos] instead (losses.prepare_lm).
    slot_valid: jnp.ndarray    # (Np,) real + in-range surfel (not padding)
    block_tuple: jnp.ndarray   # (Np / G,) tuple id of each G-block
    tuple_nodes: jnp.ndarray   # (T, K) node ids of each tuple
    overflow_count: jnp.ndarray  # () int32 active surfels dropped into the
    #   sink tuple (tuple_cap exceeded) -- their residuals are lost, so a
    #   nonzero count means assembly_tuple_cap is undersized for this frame.
    # --- pair expansion layout (expand="pairs"; see build_pair_layout) ---
    pair_rank: Optional[jnp.ndarray] = None   # (16T,) distinct-pair slot of
    #   each source row of the per-tuple block buffer (only anchor pairs
    #   a <= b are mapped -- the symmetric half; the rest carry scale 0)
    pair_scale: Optional[jnp.ndarray] = None  # (16T,) 1.0 for mapped rows,
    #   0.5 on diagonal node pairs, 0.0 for unmapped/overflow rows
    pair_dest: Optional[jnp.ndarray] = None   # (P, 2) [7 n1, 7 n2] starts,
    #   out-of-range for the overflow sink (the set-scatter drops them)
    pair_overflow: Optional[jnp.ndarray] = None  # () int32 distinct pairs
    #   beyond pair_cap (their JTJ blocks are LOST -- must stay 0)
    pair_key: Optional[jnp.ndarray] = None    # (P,) sorted distinct pair
    #   keys (p1 * node_cap + p2, p1 <= p2); sentinel where unused.  Enables
    #   pair_rank_lookup for graph-term rows (pairs_fused solve path).
    pair_rank10: Optional[jnp.ndarray] = None  # (10T,) pair rank per TRIU
    #   anchor pair (a <= b) in (T, 10) order -- the compact source layout
    #   of reduce/expand (the 16T one-hot wasted 37.5% of its bytes on
    #   zero-scaled rows; at dense pair counts the one-hot IS the cost)
    pair_swap10: Optional[jnp.ndarray] = None  # (10T,) True where the triu
    #   block must be stored transposed (node pair came out reversed)
    pair_scale10: Optional[jnp.ndarray] = None  # (10T,) 0.5 on diagonal
    #   node pairs, 0 on overflow, else 1
    diag_rank: Optional[jnp.ndarray] = None   # (J,) rank of pair (j, j)
    arap_rank: Optional[jnp.ndarray] = None   # (J, K_ed, 3) ranks of the ED
    #   edge's (nb, nb), (self, self), (min, max) pairs
    arap_swap: Optional[jnp.ndarray] = None   # (J, K_ed) True where the ED
    #   edge's off-diagonal block must be stored transposed (self < nb)
    live_end: Optional[jnp.ndarray] = None    # () int32 padded end of the
    #   non-sink content.  Inactive surfels sort into the sink (last tuple),
    #   so every slot >= live_end is sink or padding with zero contribution:
    #   chunk-streamed passes stop at ceil(live_end / chunk) chunks instead
    #   of walking the full static capacity (~15-30% of slots at 480p).

    @property
    def padded_size(self):
        return self.src_pos.shape[0]

    def pad_group_of(self, np_cap: int) -> int:
        """G, recovered from the block count (shape-static)."""
        return np_cap // self.block_tuple.shape[0]


def build_tuple_layout(knn_idx, active, node_cap: int, *, tuple_cap: int,
                       pad_group: int, chunk: int = 32768,
                       pair_cap: int = 0, extra_pairs=None) -> TupleLayout:
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
    tid_raw = (jnp.cumsum(new_tuple) - 1).astype(jnp.int32)

    # Everything below is GATHER-formulated: tid_raw is sorted ascending, so
    # per-tuple facts come from one searchsorted instead of the N-element
    # conflict scatters of the naive construction (sizes .add, tuple_nodes
    # .set, src_of .set) -- those cost ~5 ns/element on TPU and dominated
    # the layout build (~30 of 49 ms at 480p).
    tids = jnp.arange(tuple_cap, dtype=jnp.int32)
    first_pos = jnp.searchsorted(tid_raw, tids).astype(jnp.int32)   # (T,)
    sizes = jnp.diff(jnp.concatenate(
        [first_pos, jnp.asarray([n], jnp.int32)]))                  # (T,)

    # Active surfels sort strictly before inactive ones (their keys are
    # < big), so the actives past the sink boundary first_pos[T-1] are
    # exactly the overflow (their residuals are dropped -- surfaced so an
    # undersized assembly_tuple_cap is visible in StepOutputs).
    n_active = jnp.sum(active).astype(jnp.int32)
    overflow_count = jnp.maximum(n_active - jnp.minimum(
        first_pos[tuple_cap - 1], n_active), 0)

    padded_sizes = ((sizes + pad_group - 1) // pad_group) * pad_group
    pend = jnp.cumsum(padded_sizes).astype(jnp.int32)
    pbase = pend - padded_sizes

    # Padded capacity: multiple of the streaming chunk (which itself must be
    # a multiple of pad_group) so chunked scans tile exactly.
    assert chunk % pad_group == 0
    np_cap = ((n + tuple_cap * pad_group + chunk - 1) // chunk) * chunk

    # Tuple id per G-block: block b covers slots [bG, (b+1)G) which lie in
    # one tuple; identify it via searchsorted over padded run ends.
    block_starts = jnp.arange(np_cap // pad_group, dtype=jnp.int32) * pad_group
    block_tuple = jnp.searchsorted(pend, block_starts, side="right")
    block_tuple = jnp.clip(block_tuple, 0, tuple_cap - 1).astype(jnp.int32)

    # Slot -> source surfel by gather: slot i of block b (tuple t) holds the
    # sorted position first_pos[t] + (i - pbase[t]); slots past the tuple's
    # real size are padding, and every slot of the sink tuple T-1 is masked
    # (its members' residuals are dropped by design).
    rank0 = block_starts - pbase[block_tuple]              # (B,)
    pos0 = first_pos[block_tuple] + rank0
    cnt = sizes[block_tuple]
    offs = jnp.arange(pad_group, dtype=jnp.int32)
    rank = rank0[:, None] + offs[None, :]                  # (B, G)
    valid = (rank < cnt[:, None]) & \
        (block_tuple[:, None] < tuple_cap - 1)
    pos = jnp.clip(pos0[:, None] + offs[None, :], 0, n - 1)
    slot_valid = valid.reshape(-1)
    src_pos = pos.reshape(-1)

    # Node ids per tuple: all members of a tuple share the same 4 anchors
    # (that IS the tuple key), so gather any member -- the last, to match
    # the scatter formulation's last-writer-wins on the sink tuple.
    last_pos = jnp.clip(first_pos + sizes - 1, 0, n - 1)
    member = perm[last_pos]                                # (T,)
    tuple_nodes = jnp.where(sizes[:, None] > 0,
                            knn_idx[:, member].T.astype(jnp.int32), 0)

    pair_fields = (None,) * 8
    if pair_cap > 0:
        pair_fields = build_pair_layout(tuple_nodes, node_cap,
                                        pair_cap=pair_cap,
                                        extra_pairs=extra_pairs)
    return TupleLayout(sort_perm=perm.astype(jnp.int32), src_pos=src_pos,
                       slot_valid=slot_valid,
                       block_tuple=block_tuple, tuple_nodes=tuple_nodes,
                       overflow_count=overflow_count,
                       pair_rank=pair_fields[0], pair_scale=pair_fields[1],
                       pair_dest=pair_fields[2], pair_overflow=pair_fields[3],
                       pair_key=pair_fields[4],
                       pair_rank10=pair_fields[5],
                       pair_swap10=pair_fields[6],
                       pair_scale10=pair_fields[7],
                       live_end=jnp.minimum(pend[tuple_cap - 2], np_cap))


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


def build_pair_layout(tuple_nodes, node_cap: int, *, pair_cap: int,
                      extra_pairs=None):
    """Node-pair expansion layout: the per-frame sort that lets the
    per-iteration tuple->dense JTJ expansion run as one one-hot matmul and
    one unique set-scatter instead of a 16 T-block conflict scatter
    (~2-3x cheaper per iteration on TPU).

    Exploits JTJ symmetry: only anchor pairs (a, b) with a <= b are mapped
    (10 of 16 per tuple); rows whose node pair comes out reversed map the
    transposed source block (t, b, a) instead (it exists in the full
    16-block buffer), diagonal keys are halved, and the dense matrix is
    reconstituted as S + S^T.  The mapping is stored per SOURCE row
    ((16T,) rank + scale), so the per-iteration reduction is a single
    one-hot matmul over the unpermuted block buffer -- no gather.

    ``extra_pairs`` (M, 2): node pairs that must exist as distinct pairs
    even if no data-term tuple produces them (graph-term blocks for the
    pairs_fused sparse solve: ED edges + node diagonals).  They claim pair
    slots but carry no tuple source rows.

    Returns (rank_of_src, scale_of_src, dest, overflow, pair_key):
    ``pair_key`` is the (P,) sorted distinct key table (p1 * node_cap + p2;
    a huge sentinel where unused) for pair_rank_lookup.
    """
    t_cap, k = tuple_nodes.shape
    a_idx, b_idx = jnp.triu_indices(k)                 # (10,) each for k=4
    n1 = tuple_nodes[:, a_idx]                         # (T, 10)
    n2 = tuple_nodes[:, b_idx]
    p1 = jnp.minimum(n1, n2)
    p2 = jnp.maximum(n1, n2)
    key = (p1 * node_cap + p2).reshape(-1)             # (R,) R = 10 T
    fwd = (a_idx[None] * k + b_idx[None])
    rev = (b_idx[None] * k + a_idx[None])
    base = jnp.arange(t_cap, dtype=jnp.int32)[:, None] * (k * k)
    src = base + jnp.where(n1 <= n2, fwd, rev)
    src = src.reshape(-1).astype(jnp.int32)
    n_src = t_cap * k * k
    if extra_pairs is not None:
        ekey = (jnp.minimum(extra_pairs[:, 0], extra_pairs[:, 1]) * node_cap
                + jnp.maximum(extra_pairs[:, 0], extra_pairs[:, 1]))
        key = jnp.concatenate([key, ekey.astype(key.dtype)])
        # Extras carry no tuple source row: scatter to a dropped index.
        src = jnp.concatenate([
            src, jnp.full(ekey.shape, n_src, jnp.int32)])

    # 10T-order companion: rank/scale/swap per TRIU source row (the compact
    # source layout of reduce/expand -- the 16T form wastes 37.5% of the
    # one-hot bytes on zero-scaled rows).
    n_src10 = t_cap * len(a_idx)
    src10 = jnp.arange(n_src10, dtype=jnp.int32)
    swap10 = (n1 > n2).reshape(-1)
    if extra_pairs is not None:
        src10 = jnp.concatenate([
            src10, jnp.full((key.shape[0] - n_src10,), n_src10, jnp.int32)])

    key_s, src_s, src10_s = jax.lax.sort((key, src, src10), num_keys=1,
                                         is_stable=False)
    new_pair = jnp.concatenate([
        jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    rank_raw = jnp.cumsum(new_pair) - 1
    in_range = rank_raw < pair_cap - 1
    rank = jnp.clip(rank_raw, 0, pair_cap - 1).astype(jnp.int32)
    pair_overflow = jnp.sum(new_pair & ~in_range).astype(jnp.int32)

    kp1 = (key_s // node_cap).astype(jnp.int32)
    kp2 = (key_s % node_cap).astype(jnp.int32)
    dim = 7 * node_cap
    dest = jnp.full((pair_cap, 2), dim, dtype=jnp.int32)
    dest = dest.at[jnp.where(in_range, rank, pair_cap)].set(
        jnp.stack([7 * kp1, 7 * kp2], axis=1), mode="drop")
    scale_s = jnp.where(kp1 == kp2, 0.5, 1.0)
    scale_s = jnp.where(in_range, scale_s, 0.0).astype(jnp.float32)

    sentinel = jnp.asarray(node_cap * node_cap + 1, key_s.dtype)
    pair_key = jnp.full((pair_cap,), sentinel, key_s.dtype).at[
        jnp.where(in_range & new_pair, rank, pair_cap)].set(key_s,
                                                            mode="drop")

    # Scatter back to source-row order (src values are unique; extras drop).
    rank_of_src = jnp.full((n_src,), pair_cap - 1,
                           jnp.int32).at[src_s].set(rank, mode="drop")
    scale_of_src = jnp.zeros((n_src,),
                             jnp.float32).at[src_s].set(scale_s, mode="drop")
    rank10 = jnp.full((n_src10,), pair_cap - 1,
                      jnp.int32).at[src10_s].set(rank, mode="drop")
    scale10 = jnp.zeros((n_src10,),
                        jnp.float32).at[src10_s].set(scale_s, mode="drop")
    return (rank_of_src, scale_of_src, dest, pair_overflow, pair_key,
            rank10, swap10, scale10)


def pair_rank_lookup(pair_key, node_cap: int, pairs):
    """Rank of each (n1, n2) pair in the layout's distinct-pair table.

    pairs: (..., 2) node ids.  Returns (...,) int32 ranks; pairs absent
    from the table map to the sink rank P-1 (whose blocks are never
    expanded -- contributions there are dropped by design, mirroring the
    overflow semantics of the tuple sink)."""
    p1 = jnp.minimum(pairs[..., 0], pairs[..., 1])
    p2 = jnp.maximum(pairs[..., 0], pairs[..., 1])
    key = (p1.astype(pair_key.dtype) * node_cap + p2.astype(pair_key.dtype))
    pair_cap = pair_key.shape[0]
    r = jnp.searchsorted(pair_key, key.reshape(-1)).astype(jnp.int32)
    r_c = jnp.clip(r, 0, pair_cap - 1)
    hit = pair_key[r_c] == key.reshape(-1)
    return jnp.where(hit, r_c, pair_cap - 1).reshape(p1.shape)


def segment_sum_matmul(values, seg_ids, num_segments: int,
                       sum_dtype=None):
    """Segment sum as a one-hot matmul: MXU-formulated replacement for
    ``zeros.at[seg_ids].add(values)`` (the scatter is element-cost-bound on
    TPU; the matmul is FLOP-cheap).

    Per-operand precision: the one-hot LHS is EXACTLY representable in one
    bf16 pass (entries 0/1), so only the f32 values side needs the
    multi-pass split -- (DEFAULT, HIGHEST) keeps f32-faithful selection at
    3 MXU passes instead of 9.

    ``sum_dtype=bfloat16`` truncates the values side to ONE pass (3x fewer
    MXU flops; accumulation stays f32).  The relative noise (~4e-3) is the
    same order the gradient-row Gram einsums already carry under the
    MXU's default-precision bf16 truncation, and the LM damping loop
    absorbs it (measured: no tracking-accuracy change at 480p) -- but
    keep f32 where bit-faithful sums matter (tests, golden parity)."""
    onehot = (seg_ids[None, :] ==
              jnp.arange(num_segments, dtype=seg_ids.dtype)[:, None])
    if sum_dtype == jnp.bfloat16 or sum_dtype == "bf16":
        out = jax.lax.dot_general(
            onehot.astype(jnp.bfloat16), values.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return out.astype(values.dtype)
    return jax.lax.dot_general(
        onehot.astype(values.dtype), values, (((1,), (0,)), ((), ())),
        precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST))


def _scatter_blocks_set(dense, starts, blocks):
    """Unique set-scatter of (P, 7, 7) blocks into (dim, dim) at row/col
    ``starts`` (P, 2); out-of-range starts (the overflow sink) are dropped.

    Element-indexed .set (P x 49 unique elements, ~2.6 ms at P=4096) -- a
    true windowed lax.scatter lowers ~7x slower on TPU (~17 ms), so the
    explicit index grids win."""
    p = starts.shape[0]
    seven = jnp.arange(7, dtype=starts.dtype)
    r_idx = starts[:, 0, None, None] + seven[None, :, None]
    c_idx = starts[:, 1, None, None] + seven[None, None, :]
    return dense.at[r_idx, c_idx].set(
        blocks.astype(dense.dtype).reshape(p, 7, 7), mode="drop",
        unique_indices=True)


def _triu_pair_rows(layout: TupleLayout, gram):
    """Compact (10T, 49) pair source rows from the per-tuple Grams.

    Each tuple contributes its K(K+1)/2 = 10 TRIU anchor-pair blocks;
    blocks whose node pair came out reversed are stored transposed (the
    Gram is bitwise symmetric, so this equals the 16T layout's rev-block
    source), scales pre-applied.  37.5% fewer one-hot bytes than the 16T
    form -- at dense pair counts the (P, S) one-hot IS the reduction cost.
    """
    t_cap, d, _ = gram.shape
    k = layout.tuple_nodes.shape[1]
    a_idx, b_idx = jnp.triu_indices(k)
    g5 = gram.reshape(t_cap, k, 7, k, 7)
    blocks = jnp.moveaxis(g5[:, a_idx, :, b_idx, :], 0, 1)  # (T, 10, 7, 7)
    swap = layout.pair_swap10.reshape(t_cap, len(a_idx))
    blocks = jnp.where(swap[..., None, None],
                       jnp.swapaxes(blocks, -1, -2), blocks)
    n10 = t_cap * len(a_idx)
    return blocks.reshape(n10, 49) * layout.pair_scale10[:, None]


def reduce_pairs(layout: TupleLayout, gram, jtr_t, node_cap: int,
                 sum_dtype=None):
    """Per-tuple Grams -> SPARSE pair form: (P, 49) distinct-node-pair
    blocks (symmetric half, diagonal pairs halved -- the convention of
    expand_pairs, where dense = S + S^T) + (J, 7) JTr.  This is the normal
    form the pairs_fused CG solve consumes; no dense (7J)^2 matrix exists
    anywhere (core/lm.py:_pairs_fused_solve)."""
    t_cap, d, _ = gram.shape
    k = layout.tuple_nodes.shape[1]
    rows = _triu_pair_rows(layout, gram)
    pair_cap = layout.pair_dest.shape[0]
    acc = segment_sum_matmul(rows, layout.pair_rank10, pair_cap,
                             sum_dtype=sum_dtype)
    flat_nodes = layout.tuple_nodes.reshape(-1)
    jtr = segment_sum_matmul(-jtr_t.reshape(t_cap * k, 7), flat_nodes,
                             node_cap)
    return acc, jtr


def expand_pairs(layout: TupleLayout, gram, jtr_t, node_cap: int,
                 acc_dtype=jnp.float32, sum_dtype=None):
    """Per-tuple Grams -> dense (7J, 7J) JTJ + (J, 7) JTr via the pair
    layout: gather the symmetric half of the 7x7 blocks in pair-sorted
    order, one-hot-matmul the duplicates together, windowed-set-scatter the
    distinct blocks (S), and symmetrize (S + S^T).  JTr reduces with a
    node-one-hot matmul.  Replaces expand_to_blocks + the block->dense
    transpose when cfg.solver.assembly_expand == "pairs"."""
    t_cap, d, _ = gram.shape
    k = layout.tuple_nodes.shape[1]
    dim = 7 * node_cap
    rows = _triu_pair_rows(layout, gram)
    pair_cap = layout.pair_dest.shape[0]
    acc = segment_sum_matmul(rows, layout.pair_rank10, pair_cap,
                             sum_dtype=sum_dtype)
    s = jnp.zeros((dim, dim), acc_dtype)
    s = _scatter_blocks_set(s, layout.pair_dest, acc.reshape(pair_cap, 7, 7))
    jtj = s + s.T

    # JTr: (T, K, 7) anchor rows -> (J, 7) by node one-hot.
    flat_nodes = layout.tuple_nodes.reshape(-1)          # (T*K,)
    jtr = segment_sum_matmul(-jtr_t.reshape(t_cap * k, 7), flat_nodes,
                             node_cap)
    return jtj, jtr


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
