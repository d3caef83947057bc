#!/usr/bin/env python
"""Microbenchmark: fused-CG solve pieces at J=320 (dim=2240).

  kernel-N   pcg_pallas alone, N CG iterations (A streamed from HBM)
  transform  the block-precondition transform (batched chol + two
             20 MB einsum passes), no kernel
  full-N     _block_precond_pcg_pallas end to end
  chol       the Jacobi-scaled dense Cholesky for reference
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--j", type=int, default=320)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_tpu.core.lm import _block_precond_pcg_pallas
    from super_tpu.pallas_kernels.pcg import pcg_pallas
    from super_tpu.utils.profiling import loop_time

    j = args.j
    dim = 7 * j
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (dim, dim), jnp.float32) * 0.1
    a = m @ m.T + 10.0 * jnp.eye(dim)
    b = jax.random.normal(jax.random.PRNGKey(1), (dim,), jnp.float32)

    def transform(a_, rhs):
        blocks = a_.reshape(j, 7, j, 7)[
            jnp.arange(j), :, jnp.arange(j), :]
        eye7 = jnp.eye(7, dtype=rhs.dtype)
        chol = jnp.linalg.cholesky(blocks + 1e-8 * eye7)
        linv = jax.scipy.linalg.solve_triangular(
            chol, jnp.broadcast_to(eye7, (j, 7, 7)), lower=True)
        a1 = jnp.einsum("jik,jkd->jid", linv, a_.reshape(j, 7, dim),
                        precision=jax.lax.Precision.HIGHEST
                        ).reshape(dim, dim)
        a_hat = jnp.einsum("djk,jik->dji", a1.reshape(dim, j, 7), linv,
                           precision=jax.lax.Precision.HIGHEST
                           ).reshape(dim, dim)
        b_hat = jnp.einsum("jik,jk->ji", linv,
                           rhs.reshape(j, 7)).reshape(dim)
        return a_hat, b_hat

    def chol_solve(a_, b_):
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(a_), 1e-20))
        a_s = a_ / d[:, None] / d[None, :]
        return jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(a_s), True), b_ / d) / d

    runs = {}
    for n in (8, 16, 32):
        runs[f"kernel-{n}"] = (
            lambda d, _n=n: jnp.sum(pcg_pallas(a + d * 0, b, iterations=_n)))
    runs["transform"] = (
        lambda d: jnp.sum(transform(a + d * 0, b)[0][:8, :8]))
    runs["full-16"] = (
        lambda d: jnp.sum(_block_precond_pcg_pallas(a + d * 0, b, j, 16)))
    runs["chol"] = lambda d: jnp.sum(chol_solve(a + d * 0, b))

    for name, fn in runs.items():
        ms = loop_time(fn, jnp.float32(0.0), n_iter=30)
        print(f"{name}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
