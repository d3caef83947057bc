#!/usr/bin/env python
"""Microbenchmark: the tuple-assembly pipeline's sub-stages at 480p scale.

Dissects the ~10 ms/iteration frozen assemble (scripts/breakdown.py
"assemble" / lm_deferred slope) into:

  jac      frozen_chunk_partial_fm over all chunks (scan)
  segsum   segment_sum_matmul of (B, 812) block partials -> (T, 812)
  expand   expand_pairs: pair one-hot matmul + windowed set-scatter + S+S^T

Shapes mirror the 480x640 / J=315 / tuple_cap=4096 / G=32 production
config (padded Np = 524288, B = 16384 blocks, T = 4096 tuples,
P = 4096 distinct pairs).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np", type=int, default=524288)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--g", type=int, default=32)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--paircap", type=int, default=4096)
    ap.add_argument("--j", type=int, default=320)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_tpu.core import assembly
    from super_tpu.core.losses import frozen_chunk_partial_fm
    from super_tpu.utils.profiling import loop_time

    n, chunk, g, t_cap, j = args.np, args.chunk, args.g, args.t, args.j
    nc = n // chunk
    nb = n // g
    k = 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    # Chunked xs tuple mirroring _chunk_xs output for the frozen fm pass.
    mask = jnp.ones((nc, chunk), bool)
    knn_idx = jax.random.randint(ks[0], (nc, chunk, k), 0, j)
    w_fm = jax.nn.softmax(
        jax.random.normal(ks[1], (nc, k, chunk), jnp.float32), 1)
    knn_fm = jax.random.normal(ks[2], (nc, 3 * k, chunk), jnp.float32)
    diff_fm = jax.random.normal(ks[3], (nc, 3 * k, chunk), jnp.float32)
    bt_c = jax.random.randint(ks[4], (nc, chunk // g), 0, t_cap)
    o_fm = jax.random.normal(ks[5], (nc, 3, chunk), jnp.float32)
    nrm = jax.random.normal(ks[6], (nc, 3, chunk), jnp.float32)
    beta_t = jax.random.normal(ks[7], (t_cap, k, 7), jnp.float32) * 0.05
    amask = jnp.ones((nc, chunk), bool)

    block_tuple = jnp.sort(jax.random.randint(ks[8], (nb,), 0, t_cap))
    partial0 = jax.random.normal(ks[9], (nb, 28 * 29), jnp.float32)

    tuple_nodes = jax.random.randint(ks[0], (t_cap, k), 0, j)
    pr, psc, pd, _, _ = assembly.build_pair_layout(tuple_nodes, j,
                                                   pair_cap=args.paircap)
    layout = assembly.TupleLayout(
        sort_perm=jnp.zeros((n,), jnp.int32),
        src_pos=jnp.zeros((n,), jnp.int32),
        slot_valid=jnp.ones((n,), bool),
        block_tuple=block_tuple, tuple_nodes=tuple_nodes,
        overflow_count=jnp.asarray(0, jnp.int32),
        pair_rank=pr, pair_scale=psc, pair_dest=pd,
        pair_overflow=jnp.asarray(0, jnp.int32))

    def beta_fm_of(bt_elem):
        bb = beta_t[bt_elem]
        b_ = bb.shape[0]
        gg = chunk // b_
        return jnp.broadcast_to(jnp.transpose(bb, (1, 2, 0))[..., None],
                                (k, 7, b_, gg)).reshape(k, 7, chunk)

    def jac_all(d):
        xs = (mask, knn_idx, w_fm + d * 0, knn_fm, diff_fm, bt_c)

        def body(c, e):
            m, ki, w, kf, df, bt = e
            part, dc = frozen_chunk_partial_fm(
                (m, ki, w, kf, df, bt), o_fm[0], nrm[0], amask[0],
                beta_fm_of(bt), 1.0, g)
            return c + dc, part

        cost, parts = jax.lax.scan(
            body, jnp.float32(0.0), xs)
        return parts.reshape(nb, 28 * 29), cost

    def run_jac(d):
        parts, cost = jac_all(d)
        return jnp.sum(parts) + cost

    def run_segsum(d):
        acc = assembly.segment_sum_matmul(partial0 + d * 0, block_tuple,
                                          t_cap)
        return jnp.sum(acc)

    gram0 = jax.random.normal(ks[1], (t_cap, 28 * 29), jnp.float32)

    def run_expand(d):
        acc = (gram0 + d * 0).reshape(t_cap, 28, 29)
        jtj, jtr = assembly.expand_pairs(layout, acc[..., :28], acc[..., 28],
                                         j)
        return jnp.sum(jtj) + jnp.sum(jtr)

    def run_segsum_bf16(d):
        acc = assembly.segment_sum_matmul(partial0 + d * 0, block_tuple,
                                          t_cap, sum_dtype="bf16")
        return jnp.sum(acc)

    def run_reduce_pairs(d):
        acc = (gram0 + d * 0).reshape(t_cap, 28, 29)
        pacc, jtr = assembly.reduce_pairs(layout, acc[..., :28],
                                          acc[..., 28], j,
                                          sum_dtype="bf16")
        return jnp.sum(pacc) + jnp.sum(jtr)

    for name, fn in (("jac", run_jac), ("segsum", run_segsum),
                     ("segsum_bf16", run_segsum_bf16),
                     ("reduce_pairs_bf16", run_reduce_pairs),
                     ("expand", run_expand)):
        ms = loop_time(lambda d, _f=fn: _f(d), jnp.float32(0.0), n_iter=30)
        print(f"{name}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
