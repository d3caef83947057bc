#!/usr/bin/env python
"""Microbenchmark: frozen-association jacobian chunk, row-major vs
feature-major.

Hypothesis: the (C, K, 3)/(C, K, 7) row-major chunk math pads its last two
dims to (8, 128) TPU tiles at every materialization boundary (85x waste for
(4, 3) trailing dims), and that -- not FLOPs or bandwidth -- is the ~7 ms
per LM iteration.  The feature-major variant keeps the surfel dim LAST
everywhere ((3, C), (7, C) slices, K unrolled in Python) so every buffer is
lane-aligned.
"""

from __future__ import annotations

import argparse
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=393216)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--g", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from super_tpu.utils.profiling import loop_time

    n, k, g = args.n, args.k, args.g
    nb = n // g
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    diff_fm = jax.random.normal(ks[0], (k * 3, n), jnp.float32)
    knn_fm = jax.random.normal(ks[1], (k * 3, n), jnp.float32)
    w_fm = jax.nn.softmax(jax.random.normal(ks[2], (k, n), jnp.float32), 0)
    o_fm = jax.random.normal(ks[3], (3, n), jnp.float32)
    nrm_fm = jax.random.normal(ks[4], (3, n), jnp.float32)
    beta_k_rm = jax.random.normal(ks[5], (n, k, 7), jnp.float32) * 0.1
    beta_fm = jnp.moveaxis(beta_k_rm, 0, -1)  # (K, 7, N)
    mask = jnp.ones((n,), bool)

    def gram_rm(h, r):
        hb = h.reshape(nb, g, 28)
        ext = jnp.concatenate([hb, r.reshape(nb, g, 1)], axis=-1)
        return jnp.einsum("bgi,bgj->bij", hb, ext)

    # ---- row-major: the current production path --------------------------
    from super_tpu.core.losses import DataChunk, frozen_chunk_jacobian

    cv = DataChunk(mask=mask, knn_idx=jnp.zeros((n, k), jnp.int32),
                   knn_w=w_fm.T, knn=knn_fm.T.reshape(n, k, 3),
                   diff=diff_fm.T.reshape(n, k, 3))

    def rm(d):
        r, gk, _ = frozen_chunk_jacobian(
            cv._replace(diff=cv.diff + d), o_fm, nrm_fm, mask,
            beta_k_rm, 1.0)
        return gram_rm(gk.reshape(n, 28), r)

    # ---- feature-major: K unrolled, surfel dim last ----------------------
    def fm(d):
        diff = diff_fm + d
        tp_acc = 0.0
        rows = []
        for a in range(k):
            v = diff[3 * a:3 * a + 3]                      # (3, N)
            ga = knn_fm[3 * a:3 * a + 3]
            qw = beta_fm[a, 0]                             # (N,)
            qv = beta_fm[a, 1:4]                           # (3, N)
            b = beta_fm[a, 4:7]
            wa = w_fm[a]                                   # (N,)

            def cross(x, y):
                return jnp.stack([x[1] * y[2] - x[2] * y[1],
                                  x[2] * y[0] - x[0] * y[2],
                                  x[0] * y[1] - x[1] * y[0]])
            c = cross(qv, v)
            tv = v + 2.0 * qw[None] * c + 2.0 * cross(qv, c) + b
            tp_acc = tp_acc + wa[None] * (tv + ga)
            # n^T dT/dq rows (direct form, matches frozen_chunk_jacobian):
            #   dqw = 2 n.(qv x v)
            #   dqv = 2 [(qv.v) n + (n.qv) v - 2 (n.v) qv - qw (n x v)]
            ndq_w = 2.0 * jnp.sum(nrm_fm * c, 0)           # (N,)
            qv_dot_v = jnp.sum(qv * v, 0)
            n_dot_qv = jnp.sum(nrm_fm * qv, 0)
            n_dot_v = jnp.sum(nrm_fm * v, 0)
            nxv = cross(nrm_fm, v)
            ndq_v = 2.0 * (qv_dot_v[None] * nrm_fm + n_dot_qv[None] * v
                           - 2.0 * n_dot_v[None] * qv - qw[None] * nxv)
            rows.append(wa[None] * jnp.concatenate(
                [ndq_w[None], ndq_v, jnp.broadcast_to(nrm_fm, (3, n))],
                axis=0))                                   # (7, N)
        r = jnp.sum(nrm_fm * (tp_acc - o_fm), 0)           # (N,)
        h = jnp.concatenate(rows, axis=0)                  # (28, N)
        hb = h.reshape(28, nb, g)
        ext = jnp.concatenate([hb, r.reshape(1, nb, g)], axis=0)
        return jnp.einsum("ing,jng->nij", hb, ext)

    if args.check:
        a = jax.jit(rm)(jnp.float32(0.0))
        bmat = jax.jit(fm)(jnp.float32(0.0))
        import numpy as np
        np.testing.assert_allclose(np.asarray(a), np.asarray(bmat),
                                   rtol=2e-3, atol=2e-3)
        print("values agree")

    # ---- isolation: rows construction vs the gram einsum ------------------
    h_const = jax.random.normal(ks[6], (28, n), jnp.float32)
    r_const = jax.random.normal(ks[7], (n,), jnp.float32)

    def make_gram(gg, bf16=False):
        nbg = n // gg

        def f(d):
            h = h_const + d
            hb = h.reshape(28, nbg, gg)
            ext = jnp.concatenate([hb, r_const.reshape(1, nbg, gg)], axis=0)
            if bf16:
                out = jax.lax.dot_general(
                    hb.astype(jnp.bfloat16).transpose(1, 0, 2),
                    ext.astype(jnp.bfloat16).transpose(1, 0, 2),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return out
            return jnp.einsum("ing,jng->nij", hb, ext)
        return f

    stages = [("rm", rm), ("fm", fm)]
    for gg in (32, 64, 128):
        if n % gg == 0:
            stages.append((f"gram{gg}", make_gram(gg)))
            stages.append((f"gram{gg}_bf16", make_gram(gg, bf16=True)))

    def h_only(d):
        diff = diff_fm + d
        rows = []
        tp_acc = 0.0
        for a in range(k):
            v = diff[3 * a:3 * a + 3]
            ga = knn_fm[3 * a:3 * a + 3]
            qw = beta_fm[a, 0]
            qv = beta_fm[a, 1:4]
            b = beta_fm[a, 4:7]
            wa = w_fm[a]

            def cross(x, y):
                return jnp.stack([x[1] * y[2] - x[2] * y[1],
                                  x[2] * y[0] - x[0] * y[2],
                                  x[0] * y[1] - x[1] * y[0]])
            c = cross(qv, v)
            tv = v + 2.0 * qw[None] * c + 2.0 * cross(qv, c) + b
            tp_acc = tp_acc + wa[None] * (tv + ga)
            ndq_w = 2.0 * jnp.sum(nrm_fm * c, 0)
            qv_dot_v = jnp.sum(qv * v, 0)
            n_dot_qv = jnp.sum(nrm_fm * qv, 0)
            n_dot_v = jnp.sum(nrm_fm * v, 0)
            nxv = cross(nrm_fm, v)
            ndq_v = 2.0 * (qv_dot_v[None] * nrm_fm + n_dot_qv[None] * v
                           - 2.0 * n_dot_v[None] * qv - qw[None] * nxv)
            rows.append(wa[None] * jnp.concatenate(
                [ndq_w[None], ndq_v, jnp.broadcast_to(nrm_fm, (3, n))],
                axis=0))
        r = jnp.sum(nrm_fm * (tp_acc - o_fm), 0)
        h = jnp.concatenate(rows, axis=0)
        return jnp.sum(h) + jnp.sum(r)

    stages.append(("h_only", lambda d: h_only(d).reshape(1, 1, 1)))

    # ---- all-anchor batched rows: ops on (12, N) / (4, N) arrays ----------
    # (3, N) ops use 3 of 8 sublanes per vreg; batching the K=4 anchors
    # into (12, N) rows raises utilization to 12/16.
    p1 = jnp.asarray([3 * a + [1, 2, 0][i] for a in range(k)
                      for i in range(3)])
    p2 = jnp.asarray([3 * a + [2, 0, 1][i] for a in range(k)
                      for i in range(3)])
    rep3 = jnp.asarray([a for a in range(k) for _ in range(3)])
    # h row order: anchor-major [ndqw, ndqv(3), n(3)] -- as a permutation of
    # concat([hw (4), hv (12), hn (12)]).
    hperm = []
    for a in range(k):
        hperm += [a, 4 + 3 * a, 4 + 3 * a + 1, 4 + 3 * a + 2,
                  16 + 3 * a, 16 + 3 * a + 1, 16 + 3 * a + 2]
    hperm = jnp.asarray(hperm)

    def cross12(x, y):
        return x[p1] * y[p2] - x[p2] * y[p1]

    def gsum(x):  # (12, N) -> (4, N) sum within 3-groups
        return x[0::3] + x[1::3] + x[2::3]

    def fm12(d):
        v = diff_fm + d                                 # (12, N)
        qw4 = beta_fm[:, 0]                             # (4, N)
        qv = beta_fm[:, 1:4].reshape(12, n)
        bb = beta_fm[:, 4:7].reshape(12, n)
        qw = qw4[rep3]                                  # (12, N)
        n_b = jnp.tile(nrm_fm, (k, 1))                  # (12, N)
        c = cross12(qv, v)
        tv = v + 2.0 * qw * c + 2.0 * cross12(qv, c) + bb
        w12 = w_fm[rep3]
        s = w12 * (tv + knn_fm)
        tp = s[0:3] + s[3:6] + s[6:9] + s[9:12]
        r = jnp.sum(nrm_fm * (tp - o_fm), 0)

        ndq_w = 2.0 * gsum(n_b * c)                     # (4, N)
        qv_v = gsum(qv * v)
        n_qv = gsum(n_b * qv)
        n_v = gsum(n_b * v)
        nxv = cross12(n_b, v)
        ndq_v = 2.0 * (qv_v[rep3] * n_b + n_qv[rep3] * v
                       - 2.0 * n_v[rep3] * qv - qw * nxv)
        hw = w_fm * ndq_w                               # (4, N)
        hv = w12 * ndq_v                                # (12, N)
        hn = w12 * n_b
        h = jnp.concatenate([hw, hv, hn], axis=0)[hperm]
        hb = h.reshape(28, nb, g)
        ext = jnp.concatenate([hb, r.reshape(1, nb, g)], axis=0)
        return jnp.einsum("ing,jng->nij", hb, ext)

    if args.check:
        a = jax.jit(fm)(jnp.float32(0.0))
        b12 = jax.jit(fm12)(jnp.float32(0.0))
        import numpy as np
        np.testing.assert_allclose(np.asarray(a), np.asarray(b12),
                                   rtol=2e-3, atol=2e-3)
        print("fm12 agrees")
    stages.append(("fm12", fm12))

    wanted = os.environ.get("JAC_STAGES")
    for name, f in stages:
        if wanted and name not in wanted.split(","):
            continue
        v = loop_time(lambda x, _f=f: _f(x * 0.0)[0, 0, 0], 0.0)
        print(f"{name}: {v:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
