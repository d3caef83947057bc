#!/usr/bin/env python
"""Chunked pairs-CG kernel at dense (mesh-16) shapes: compile + speed.

  python scripts/microbench_pairs_dense.py          # TPU
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--j", type=int, default=1216)
    ap.add_argument("--p", type=int, default=19456)
    ap.add_argument("--reps", type=int, default=12)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from super_tpu.pallas_kernels.pcg import pairs_cg_pallas
    from super_tpu.utils.profiling import chain_time

    j, p = args.j, args.p
    rng = np.random.default_rng(0)
    # Diagonally-dominant synthetic pair system: diagonal pairs (i, i)
    # for every node plus random off-diagonals.
    n_diag = j
    n_off = p - j - 1
    n1 = np.concatenate([np.arange(j), rng.integers(0, j, n_off), [j]])
    n2 = np.concatenate([np.arange(j), rng.integers(0, j, n_off), [j]])
    order = rng.permutation(p)
    n1, n2 = n1[order].astype(np.int32), n2[order].astype(np.int32)
    blk = rng.standard_normal((64, p)).astype(np.float32) * 0.01
    diag_mask = (n1 == n2) & (n1 < j)
    blk[:, diag_mask] = 0.0
    for i in range(7):
        blk[8 * 0 + i, diag_mask] = 4.0  # strong diagonal band d=0
    blkt = blk.copy()
    minv = np.zeros((64, j), np.float32)
    for i in range(7):
        minv[i, :] = 1.0 / 8.0
    b = rng.standard_normal((7, j)).astype(np.float32)

    for iters in (8, 32):
        fn = jax.jit(lambda bl, blt, bb, _it=iters: pairs_cg_pallas(
            bl, blt, jnp.asarray(n1), jnp.asarray(n2), jnp.asarray(minv),
            bb, jnp.float32(1.0), iterations=_it))
        dt = chain_time(fn, jnp.asarray(blk), jnp.asarray(blkt),
                        jnp.asarray(b), probe=lambda x: jnp.sum(x[:, :64]),
                        reps=args.reps)
        print(f"pairs_cg chunked J={j} P={p} it={iters}: {dt*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
