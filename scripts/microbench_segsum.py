#!/usr/bin/env python
"""Microbenchmark: segment-sum formulations for the level-2 tuple reduction.

The tuple-grouped JTJ assembly reduces (B, 812) per-block partial Grams into
(T, 812) per-tuple Grams over a SORTED block->tuple map.  Candidates:

  scatter : acc.at[block_tuple].add(partial)      (element-cost-bound)
  matmul  : one-hot (T, B) @ partial on the MXU   (FLOP-cheap, exact-ish)
  cumsum  : prefix-sum + run-boundary differences (bandwidth-bound)

Also times the block-expansion scatter (T x 16 7x7 blocks -> (J, J, 7, 7))
and the damped linear solve (Cholesky vs PCG) at bench scale.
"""

from __future__ import annotations

import argparse
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=13312)      # np_cap / pad_group
    ap.add_argument("--t", type=int, default=4096)       # tuple_cap
    ap.add_argument("--cols", type=int, default=812)     # 28*29
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--j", type=int, default=320)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--which", default="scatter,matmul,matmul_bf16,cumsum,"
                    "expand_scatter,chol,pcg,gather,gather_mm,gather_fm,"
                    "expand_mm,expand_cs")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from super_tpu.utils.profiling import loop_time

    b, t, cols, j = args.b, args.t, args.cols, args.j
    key = jax.random.PRNGKey(0)
    partial = jax.random.normal(key, (b, cols), jnp.float32)
    # Sorted block->tuple map with realistic occupancy (~45% of T used).
    bt = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (b,), 0,
                                     int(t * 0.45)).astype(jnp.int32))
    which = set(args.which.split(","))

    def rec(name, fn, init=0.0):
        v = loop_time(fn, init)
        print(f"{name}: {v:.3f} ms", flush=True)
        out[name] = v

    out = {}

    if "scatter" in which:
        def seg_scatter(p):
            return jnp.zeros((t, cols), jnp.float32).at[bt].add(p)
        rec("scatter", lambda x: seg_scatter(partial + x
                                                         * 0)[0, 0], 0.0)

    if "matmul" in which:
        def seg_matmul(p):
            onehot = (bt[None, :] == jnp.arange(t, dtype=jnp.int32)[:, None]
                      ).astype(jnp.float32)
            return jax.lax.dot_general(
                onehot, p, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
        rec("matmul", lambda x: seg_matmul(partial + x
                                                       * 0)[0, 0], 0.0)

    if "matmul_bf16" in which:
        def seg_matmul_b(p):
            onehot = (bt[None, :] == jnp.arange(t, dtype=jnp.int32)[:, None]
                      ).astype(jnp.bfloat16)
            hi = p.astype(jnp.bfloat16)
            lo = (p - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            f = jax.lax.dot_general
            return (f(onehot, hi, (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32)
                    + f(onehot, lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
        rec("matmul_bf16", lambda x: seg_matmul_b(
            partial + x * 0)[0, 0], 0.0)

    if "cumsum" in which:
        starts = jnp.searchsorted(bt, jnp.arange(t, dtype=jnp.int32),
                                  side="left")
        ends = jnp.searchsorted(bt, jnp.arange(t, dtype=jnp.int32),
                                side="right")

        def seg_cumsum(p):
            cs = jnp.cumsum(p, axis=0)
            cs = jnp.concatenate([jnp.zeros((1, cols), p.dtype), cs], axis=0)
            return cs[ends] - cs[starts]
        rec("cumsum", lambda x: seg_cumsum(partial + x
                                                       * 0)[0, 0], 0.0)

    if "expand_scatter" in which:
        gram = jax.random.normal(key, (t, 28, 28), jnp.float32)
        nodes = jax.random.randint(jax.random.PRNGKey(2), (t, 4), 0, j
                                   ).astype(jnp.int32)
        g5 = gram.reshape(t, 4, 7, 4, 7).transpose(0, 1, 3, 2, 4)

        def expand(g):
            jtj = jnp.zeros((j, j, 7, 7), jnp.float32)
            return jtj.at[nodes[:, :, None], nodes[:, None, :]].add(g)
        rec("expand_scatter", 
            lambda x: expand(g5 + x * 0)[0, 0, 0, 0], 0.0)

    dim = 7 * j
    if "chol" in which or "pcg" in which:
        m = jax.random.normal(key, (dim, dim), jnp.float32)
        a0 = m @ m.T + dim * jnp.eye(dim)
        rhs = jax.random.normal(key, (dim,), jnp.float32)

    if "chol" in which:
        def chol(a):
            c = jnp.linalg.cholesky(a)
            return jax.scipy.linalg.cho_solve((c, True), rhs)
        rec("chol", lambda x: chol(a0 + x * 0)[0], 0.0)

    if "pcg" in which:
        from super_tpu.core.lm import _block_jacobi_pcg

        def pcg(a):
            return _block_jacobi_pcg(a, rhs, j, 32)
        rec("pcg32", lambda x: pcg(a0 + x * 0)[0], 0.0)

    if "gather" in which:
        beta = jax.random.normal(key, (j, 7), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(3), (args.b * 32, 4),
                                 0, j).astype(jnp.int32)

        def gat(bta):
            return jnp.sum(bta[idx], axis=(1, 2))
        rec("gather_beta", lambda x: gat(beta + x * 0)[0], 0.0)

    if "gather_mm" in which:
        beta = jax.random.normal(key, (j, 7), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(3), (args.b * 32, 4),
                                 0, j).astype(jnp.int32)
        def gat_mm(bta):
            onehot = (idx.reshape(-1)[:, None] ==
                      jnp.arange(j, dtype=jnp.int32)[None, :]
                      ).astype(jnp.bfloat16)
            g = jax.lax.dot_general(onehot, bta.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.sum(g.reshape(idx.shape[0], 4, 7), axis=(1, 2))
        rec("gather_mm", lambda x: gat_mm(beta + x * 0)[0], 0.0)

    if "gather_fm" in which:
        beta = jax.random.normal(key, (j, 7), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(3), (args.b * 32, 4),
                                 0, j).astype(jnp.int32)

        def gat_fm(bta):
            bt_fm = bta.T  # (7, J)
            g = jnp.take(bt_fm, idx.reshape(-1), axis=1)  # (7, N*4)
            return jnp.sum(g, axis=0)
        rec("gather_fm", lambda x: gat_fm(beta + x * 0)[0], 0.0)

    if "expand_mm" in which:
        # Pair-sorted expansion: gram blocks (T*16, 49) permuted into
        # pair-sorted order, one-hot matmul into distinct-pair rows, then a
        # unique-destination set-scatter into the (J*J, 49) block matrix.
        t16 = t * 16
        dp = 4096
        gram2 = jax.random.normal(key, (t16, 49), jnp.float32)
        perm = jax.random.permutation(jax.random.PRNGKey(5), t16)
        pair_of_run = jnp.sort(jax.random.randint(
            jax.random.PRNGKey(6), (t16,), 0, dp).astype(jnp.int32))
        dest_pair = jax.random.permutation(
            jax.random.PRNGKey(7), j * j)[:dp].astype(jnp.int32)

        def expand_mm(g2):
            rows = g2[perm]
            onehot = (pair_of_run[None, :] ==
                      jnp.arange(dp, dtype=jnp.int32)[:, None]
                      ).astype(jnp.float32)
            acc = jax.lax.dot_general(onehot, rows, (((1,), (0,)), ((), ())),
                                      precision=jax.lax.Precision.HIGHEST)
            out = jnp.zeros((j * j, 49), jnp.float32)
            return out.at[dest_pair].set(acc).reshape(j, j, 7, 7)
        rec("expand_mm", lambda x: expand_mm(gram2 + x * 0)[0, 0, 0, 0], 0.0)

    if "expand_cs" in which:
        t16 = t * 16
        dp = 4096
        gram2 = jax.random.normal(key, (t16, 49), jnp.float32)
        perm = jax.random.permutation(jax.random.PRNGKey(5), t16)
        pair_of_run = jnp.sort(jax.random.randint(
            jax.random.PRNGKey(6), (t16,), 0, dp).astype(jnp.int32))
        dest_pair = jax.random.permutation(
            jax.random.PRNGKey(7), j * j)[:dp].astype(jnp.int32)
        starts = jnp.searchsorted(pair_of_run, jnp.arange(dp, dtype=jnp.int32),
                                  side="left")
        ends = jnp.searchsorted(pair_of_run, jnp.arange(dp, dtype=jnp.int32),
                                side="right")

        def expand_cs(g2):
            rows = g2[perm]
            cs = jnp.concatenate([jnp.zeros((1, 49), g2.dtype),
                                  jnp.cumsum(rows, axis=0)], axis=0)
            acc = cs[ends] - cs[starts]
            out = jnp.zeros((j * j, 49), jnp.float32)
            return out.at[dest_pair].set(acc).reshape(j, j, 7, 7)
        rec("expand_cs", lambda x: expand_cs(gram2 + x * 0)[0, 0, 0, 0], 0.0)


if __name__ == "__main__":
    main()
