#!/usr/bin/env python
"""Microbenchmark: corner-bank build variants (ops/bilinear.py).

The naive image-space shift build ((7,H,W) slices + concats) measured ~78 ms
on v5e at 480p -- lane-crossing shifts are pathological.  Candidates:

  image  : current build_corner_bank (image-space slice+concat)
  flat   : flat shifts by {1, w, w+1} via slice+pad on (7, P)
  pad2d  : jnp.pad-based image shifts
  stack  : build (4,7,h,w) then reshape
"""

from __future__ import annotations

import argparse
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from super_tpu.utils.profiling import loop_time
    from super_tpu.ops.bilinear import build_corner_bank

    h, w = args.h, args.w
    p = h * w
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (3, p), jnp.float32)
    nms = jax.random.normal(key, (3, p), jnp.float32)
    imap = jnp.where(jax.random.bernoulli(key, 0.9, (h, w)),
                     jnp.arange(p, dtype=jnp.int32).reshape(h, w), -1)

    def rec(name, fn):
        v = loop_time(lambda x: fn(pts + x, nms, imap).ravel()[0], 0.0)
        print(f"{name}: {v:.3f} ms", flush=True)

    rec("image", build_corner_bank)

    def flat(points_fm, norms_fm, index_map):
        valid = (index_map >= 0).reshape(-1)
        vrow = valid.astype(points_fm.dtype)[None]
        ptsz = jnp.where(valid[None], points_fm, 0.0)
        nmsz = jnp.where(valid[None], norms_fm, 0.0)
        base = jnp.concatenate([vrow, ptsz, nmsz], axis=0)  # (7, P)
        z1 = jnp.zeros((7, 1), base.dtype)
        zw = jnp.zeros((7, w), base.dtype)
        right = jnp.concatenate([base[:, 1:], z1], axis=1)
        down = jnp.concatenate([base[:, w:], zw], axis=1)
        downright = jnp.concatenate([base[:, w + 1:], zw, z1], axis=1)
        # Row-boundary wrap: last column's right neighbors are invalid.
        lastcol = (jnp.arange(p) % w) == (w - 1)
        right = jnp.where(lastcol[None], 0.0, right)
        downright = jnp.where(lastcol[None], 0.0, downright)
        return jnp.concatenate([base, right, down, downright], axis=0)

    rec("flat", flat)

    def pad2d(points_fm, norms_fm, index_map):
        valid = index_map >= 0
        vrow = valid.astype(points_fm.dtype)[None]
        ptsz = jnp.where(valid[None], points_fm.reshape(3, h, w), 0.0)
        nmsz = jnp.where(valid[None], norms_fm.reshape(3, h, w), 0.0)
        base = jnp.concatenate([vrow, ptsz, nmsz], axis=0)
        padded = jnp.pad(base, ((0, 0), (0, 1), (0, 1)))
        blocks = [padded[:, :h, :w], padded[:, :h, 1:],
                  padded[:, 1:, :w], padded[:, 1:, 1:]]
        return jnp.concatenate(blocks, axis=0).reshape(28, p)

    rec("pad2d", pad2d)

    def stack4(points_fm, norms_fm, index_map):
        valid = index_map >= 0
        vrow = valid.astype(points_fm.dtype)[None]
        ptsz = jnp.where(valid[None], points_fm.reshape(3, h, w), 0.0)
        nmsz = jnp.where(valid[None], norms_fm.reshape(3, h, w), 0.0)
        base = jnp.concatenate([vrow, ptsz, nmsz], axis=0)
        padded = jnp.pad(base, ((0, 0), (0, 1), (0, 1)))
        blk = jnp.stack([padded[:, :h, :w], padded[:, :h, 1:],
                         padded[:, 1:, :w], padded[:, 1:, 1:]], axis=0)
        return blk.reshape(28, p)

    rec("stack", stack4)


if __name__ == "__main__":
    main()
