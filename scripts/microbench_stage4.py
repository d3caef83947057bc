#!/usr/bin/env python
"""Microbench the components of fusion stage 4 (add unmatched candidates).

The round-4 stage isolation put stage 4 at ~11 ms/frame; this separates
its pieces: the add-side KNN (matmul + top_k), the candidate gather, the
cumsum/searchsorted compactions, and the packed column scatter.

  python scripts/microbench_stage4.py            # TPU
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--a_cap", type=int, default=8192)
    ap.add_argument("--n", type=int, default=393216)
    ap.add_argument("--p", type=int, default=307200)
    ap.add_argument("--j", type=int, default=336)
    ap.add_argument("--reps", type=int, default=60)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from super_tpu.ops.knn import masked_knn
    from super_tpu.utils.profiling import loop_time

    rng = np.random.default_rng(0)
    a_cap, n, p, j = args.a_cap, args.n, args.p, args.j
    q = jnp.asarray(rng.standard_normal((3, a_cap)), jnp.float32)
    refs = jnp.asarray(rng.standard_normal((3, j)), jnp.float32)
    ref_mask = jnp.ones((j,), bool)
    fbank = jnp.asarray(rng.standard_normal((14, p)), jnp.float32)
    src = jnp.asarray(rng.integers(0, p, a_cap), jnp.int32)
    add_mask = jnp.asarray(rng.random(p) < 0.02)
    free = jnp.asarray(rng.random(n) < 0.2)
    dst = jnp.asarray(rng.standard_normal((26, n)), jnp.float32)
    sb = jnp.asarray(rng.standard_normal((26, a_cap)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, n, a_cap), jnp.int32)

    out = {}

    def rec(name, fn):
        out[name] = round(loop_time(fn, jnp.float32(0.0),
                                    n_iter=args.reps), 2)
        print(f"{name}: {out[name]} ms", flush=True)

    rec("knn_masked", lambda d: jnp.sum(masked_knn(
        q + 0 * d, refs, 4, ref_mask=ref_mask)[0][:, :64]))

    def topk_only(d):
        d2 = jnp.einsum("dc,dm->cm", q + 0 * d, refs)
        neg, idx = jax.lax.top_k(-d2, 4)
        return jnp.sum(neg[:64]) + jnp.sum(idx[:64]).astype(jnp.float32)
    rec("matmul_topk", topk_only)

    def peel4(d):
        d2 = jnp.einsum("dc,dm->cm", q + 0 * d, refs)
        acc = jnp.float32(0)
        work = d2
        for _ in range(4):
            best = jnp.min(work, axis=1)
            bidx = jnp.argmin(work, axis=1)
            work = jnp.where(
                jax.nn.one_hot(bidx, j, dtype=bool), jnp.inf, work)
            acc = acc + jnp.sum(best[:64]) + jnp.sum(bidx[:64]).astype(
                jnp.float32)
        return acc
    rec("matmul_peel4", peel4)

    rec("gather14_8k", lambda d: jnp.sum(jnp.take(
        fbank + 0 * d, src, axis=-1)[:, :64]))

    def compact(d):
        cs = jnp.cumsum(add_mask ^ (d.astype(jnp.int32) != 0)).astype(
            jnp.int32)
        r1 = jnp.arange(1, a_cap + 1, dtype=jnp.int32)
        cc = jnp.searchsorted(cs, r1)
        return jnp.sum(cc[:64]).astype(jnp.float32)
    rec("cumsum_searchsorted_p", compact)

    def freeslots(d):
        cs = jnp.cumsum(free ^ (d.astype(jnp.int32) != 0)).astype(jnp.int32)
        r1 = jnp.arange(1, a_cap + 1, dtype=jnp.int32)
        cc = jnp.searchsorted(cs, r1)
        return jnp.sum(cc[:64]).astype(jnp.float32)
    rec("cumsum_searchsorted_n", freeslots)

    rec("col_scatter26", lambda d: jnp.sum(
        (dst + 0 * d).at[:, tgt].set(sb, mode="drop")[:, :64]))

    # Split attribution: cumsum vs searchsorted, and the fused dual
    # compaction (one 2P cumsum + one vmapped searchsorted for the
    # stage-3 and stage-4 pixel compactions).
    cs_fixed = jnp.cumsum(add_mask).astype(jnp.int32)
    rec("cumsum_p", lambda d: jnp.sum(jnp.cumsum(
        add_mask ^ (d.astype(jnp.int32) != 0)).astype(jnp.int32)[-64:]
    ).astype(jnp.float32))
    r1 = jnp.arange(1, a_cap + 1, dtype=jnp.int32)
    rec("searchsorted_p", lambda d: jnp.sum(jnp.searchsorted(
        cs_fixed + (d.astype(jnp.int32) * 0), r1)[:64]).astype(jnp.float32))
    occ1 = jnp.asarray(rng.random(p) < 0.01)

    def dual(d):
        both = jnp.concatenate([occ1, add_mask ^ (d.astype(jnp.int32) != 0)])
        cs2 = jnp.cumsum(both).astype(jnp.int32)
        cs_a = cs2[:p]
        cs_b = cs2[p:] - cs2[p - 1]
        qa = jnp.arange(1, a_cap + 1, dtype=jnp.int32)
        stacked = jnp.stack([cs_a, cs_b])
        qs = jnp.stack([qa, qa])
        cc = jax.vmap(jnp.searchsorted)(stacked, qs)
        return jnp.sum(cc[:, :64]).astype(jnp.float32)
    rec("dual_compact", dual)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
