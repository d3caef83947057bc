#!/usr/bin/env python
"""Dense mat-vec formulations for the mesh-16 CG solve.

The dense PCG's matvec measured ~2 ms/iteration on a 145 MB bf16 matrix
(~72 GB/s effective, 11x below HBM) -- this compares lowerings:
a @ p, p @ a (A symmetric), einsum, a f32 copy, and the Pallas
row-blocked CG kernel's effective per-iteration cost.

  python scripts/microbench_densemv.py
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
    ap.add_argument("--dim", type=int, default=8512)  # 7 x 1216
    ap.add_argument("--reps", type=int, default=60)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from super_tpu.utils.profiling import loop_time

    dim = args.dim
    rng = np.random.default_rng(0)
    a16 = jnp.asarray(rng.standard_normal((dim, dim)) / dim, jnp.bfloat16)
    a32 = a16.astype(jnp.float32)
    p = jnp.asarray(rng.standard_normal(dim), jnp.float32)

    out = {}

    def rec(name, fn):
        out[name] = round(loop_time(fn, jnp.float32(0.0),
                                    n_iter=args.reps), 2)
        print(f"{name}: {out[name]} ms", flush=True)

    rec("a16_at_p", lambda d: jnp.sum((a16 @ (p + d))[:64]))
    rec("p_at_a16", lambda d: jnp.sum(((p + d) @ a16)[:64]))
    rec("a32_at_p", lambda d: jnp.sum((a32 @ (p + d))[:64]))
    rec("p_at_a32", lambda d: jnp.sum(((p + d) @ a32)[:64]))
    rec("einsum16", lambda d: jnp.sum(jnp.einsum(
        "ij,j->i", a16, (p + d), preferred_element_type=jnp.float32)[:64]))
    # 8-column block: does widening the vector amortize the matrix read?
    p8 = jnp.asarray(rng.standard_normal((dim, 8)), jnp.float32)
    rec("a16_at_p8", lambda d: jnp.sum((a16 @ (p8 + d))[:64]))

    # Pallas dense-CG kernel: per-iteration effective cost.
    from super_tpu.pallas_kernels.pcg import pcg_pallas
    spd = a32 @ a32.T + dim * jnp.eye(dim, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(dim), jnp.float32)
    for iters in (8, 32):
        def run(d, _it=iters):
            return jnp.sum(pcg_pallas(spd, b + d, iterations=_it,
                                      row_block=256)[:64])
        rec(f"pcg_pallas{iters}", run)
    if out.get("pcg_pallas32") and out.get("pcg_pallas8"):
        per_it = (out["pcg_pallas32"] - out["pcg_pallas8"]) / 24.0
        out["pcg_pallas_per_iter"] = round(per_it, 3)
        print("pcg_pallas_per_iter:", out["pcg_pallas_per_iter"], "ms")

    print(json.dumps(out))


if __name__ == "__main__":
    main()


def bench_pcg_block():
    """Time the actual dense-PCG solve at mesh-16 shapes (run separately:
    python -c "import sys; sys.argv=['x']; \
    exec(open('scripts/microbench_densemv.py').read()); bench_pcg_block()")
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from super_tpu.core.lm import _block_jacobi_pcg
    from super_tpu.utils.profiling import chain_time

    j_cap = 1216
    dim = 7 * j_cap
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((dim, dim)) / dim, jnp.bfloat16)
    a = (a + a.T).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(dim), jnp.float32)
    inv_d = jnp.asarray(1.0 / (1.0 + rng.random(dim)), jnp.float32)
    eps = float(2.0 ** -8) * dim ** 0.5

    for it in (8, 32):
        fn = jax.jit(lambda a_, b_, s_, _it=it: _block_jacobi_pcg(
            a_, b_, j_cap, _it, inv_d=s_, scaled_eps=eps))
        dt = chain_time(fn, a, b, inv_d, probe=lambda x: jnp.sum(x[:64]),
                        reps=8)
        print(f"block_jacobi_pcg it={it}: {dt*1e3:.2f} ms", flush=True)
