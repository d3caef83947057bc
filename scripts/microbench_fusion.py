#!/usr/bin/env python
"""Microbenchmark: fusion sub-ops at 480p scale (N=393216 surfel slots,
P=307200 pixels, a_cap=16384 add candidates, J=320 nodes).

Dissects fuse_frame's ~35 ms into its primitive costs:
  gather17      stage-2 candidate fetch: (17, P) bank at N surfel pixels
  scatmin       stage-2 consumption scatter-min (N -> P, combiner)
  mergemath     stage-2 merged-values math + bank select (N wide)
  cumsum_p      stage-4 candidate rank (cumsum over P)
  cumsum_n      stage-4 free-slot rank (cumsum over N)
  knn16k        stage-4 anchor KNN: 16384 queries x 320 nodes, top-4
  packscat      stage-4 packed write: (23, a_cap) cols into (23, N)
  sort3         projection-map 3-key sort over N
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=393216)
    ap.add_argument("--p", type=int, default=307200)
    ap.add_argument("--acap", type=int, default=16384)
    ap.add_argument("--j", type=int, default=320)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_tpu.utils.profiling import loop_time

    n, p, acap, j = args.n, args.p, args.acap, args.j
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    fbank = jax.random.normal(ks[0], (17, p), jnp.float32)
    sf_pix = jax.random.randint(ks[1], (n,), 0, p)
    vals = jax.random.normal(ks[2], (n,), jnp.float32)
    layer = jax.random.randint(ks[3], (n,), 0, 4)
    big = jax.random.normal(ks[4], (23, n), jnp.float32)
    src23 = jax.random.normal(ks[5], (23, acap), jnp.float32)
    target = jax.random.randint(ks[6], (acap,), 0, n)
    qpts = jax.random.normal(ks[7], (3, acap), jnp.float32)
    gpts = jax.random.normal(ks[0], (j, 3), jnp.float32)
    confs = vals

    from super_tpu.ops.knn import masked_knn

    fbank_bf = fbank.astype(jnp.bfloat16)
    runs = {
        "gather17": lambda d: jnp.sum(
            jnp.take(fbank + d * 0, sf_pix, axis=-1)),
        "gather17_bf16": lambda d: jnp.sum(
            jnp.take(fbank_bf + d.astype(jnp.bfloat16) * 0, sf_pix,
                     axis=-1).astype(jnp.float32)),
        "gather8": lambda d: jnp.sum(
            jnp.take(fbank[:8] + d * 0, sf_pix, axis=-1)),
        "gather1": lambda d: jnp.sum(
            jnp.take(fbank[0] + d * 0, sf_pix, axis=-1)),
        "gather28": lambda d: jnp.sum(
            jnp.take(jnp.concatenate([fbank, fbank[:11]]) + d * 0,
                     sf_pix, axis=-1)),
        "scatmin": lambda d: jnp.sum(
            jnp.full((p,), 4, jnp.int32).at[sf_pix].min(
                layer + (d * 0).astype(jnp.int32))),
        "cumsum_p": lambda d: jnp.sum(jnp.cumsum(
            (fbank[0] + d * 0) > 0.0) * 1.0),
        "cumsum_n": lambda d: jnp.sum(jnp.cumsum(
            (vals + d * 0) > 0.0) * 1.0),
        "knn16k": lambda d: jnp.sum(masked_knn(
            qpts + d * 0, gpts.T, 4,
            query_mask=jnp.ones((acap,), bool),
            ref_mask=jnp.ones((j,), bool))[0]),
        "packscat": lambda d: jnp.sum(
            (big + d * 0).at[:, target].set(src23, mode="drop")),
        "sort3": lambda d: jnp.sum(jax.lax.sort(
            (sf_pix + (d * 0).astype(jnp.int32), -confs,
             jnp.arange(n, dtype=jnp.int32)), num_keys=3,
            is_stable=False)[2]),
    }
    for name, fn in runs.items():
        ms = loop_time(fn, jnp.float32(0.0), n_iter=40)
        print(f"{name}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
