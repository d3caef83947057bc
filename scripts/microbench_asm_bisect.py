#!/usr/bin/env python
"""In-situ bisect of the frozen-association tuple assembly on the REAL
bench context: cumulative prefixes of _data_normal_eq_tuple, loop_time'd,
so consecutive differences attribute the per-trip cost inside the actual
XLA program (breakdown's asm_pairs_frozen measures ~5.3 ms vs a ~0.13 ms
bandwidth floor).

  python scripts/microbench_asm_bisect.py
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
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--stages", default=None)
    ap.add_argument("--chunk", type=int, default=None,
                    help="override assembly_chunk")
    ap.add_argument("--jac_dtype", default=None,
                    help="override solver.jac_dtype (library 'full' stage)")
    ap.add_argument("--pad_group", type=int, default=None,
                    help="override assembly_pad_group")
    args = ap.parse_args()

    import dataclasses

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench as bench_mod
    from super_tpu.core import assembly
    from super_tpu.core import losses as L
    from super_tpu.geometry.quaternion import IDENTITY_DQ
    from super_tpu.utils.profiling import loop_time

    bargs = argparse.Namespace(height=480, width=640, streams=1)
    cfg, intr, state0, frames = bench_mod.build_workload(
        bargs, 30, "per_frame")
    if args.chunk:
        cfg = cfg.replace(solver=dataclasses.replace(
            cfg.solver, assembly_chunk=args.chunk))
    if args.jac_dtype:
        cfg = cfg.replace(solver=dataclasses.replace(
            cfg.solver, jac_dtype=args.jac_dtype))
    if args.pad_group:
        cfg = cfg.replace(solver=dataclasses.replace(
            cfg.solver, assembly_pad_group=args.pad_group))
    ctx = jax.jit(lambda s: L.prepare_lm(cfg, s.surfels, s.graph,
                                         frames[1]))(state0)
    j_cap = cfg.capacity.node_capacity
    beta0 = jnp.tile(IDENTITY_DQ[None], (j_cap, 1))
    assoc = jax.jit(lambda c: L.associate(cfg, c, beta0 * 1.0, intr,
                                          identity=True))(ctx)
    sol = cfg.solver
    g_per = sol.assembly_pad_group
    weight = cfg.losses.sf_point_plane_weight

    def prefix(upto):
        def fn(d, c, a, beta):
            beta = beta + 0 * d
            layout = c.layout
            t_cap = layout.tuple_nodes.shape[0]
            chunk = L._cost_chunk_size(cfg, c)
            xs, nc = L._chunk_xs(c, chunk)
            axs = L._assoc_chunk_xs(a, chunk)
            beta_t = beta[layout.tuple_nodes]
            zero = jnp.asarray(0.0, beta.dtype)
            bpc_ = chunk // g_per

            def jac_chunk(xs_elem, assoc_elem):
                # Body prefixes (geom/warp/rows): truncated versions of
                # frozen_chunk_partial_fm producing a placeholder part so
                # the fori_loop carry keeps its shape.
                geom = L._geom_of(c, xs_elem)
                if upto in ("geom", "warp", "rows"):
                    mask_c, w_fm, knn_fm, diff_fm = geom
                    cdim = mask_c.shape[-1]
                    part0 = jnp.zeros((bpc_, 28 * 29), beta.dtype)
                    if upto == "geom":
                        probe_v = jnp.sum(diff_fm) + jnp.sum(w_fm)
                        return part0.at[0, 0].add(probe_v), probe_v
                    beta_kfm = L._beta_fm_of(beta_t, xs_elem)
                    tp = L._warp_fm_batched(w_fm, knn_fm, diff_fm, beta_kfm)
                    if upto == "warp":
                        probe_v = jnp.sum(tp)
                        return part0.at[0, 0].add(probe_v), probe_v
                    o, nrm, am = assoc_elem
                    rows = L._rows_fm_batched(
                        jnp.broadcast_to(nrm, (3, cdim)), w_fm, diff_fm,
                        beta_kfm)
                    r = weight * jnp.sum(nrm * (tp - o), 0)
                    probe_v = jnp.sum(rows[::5, ::97]) + jnp.sum(r[::97])
                    return part0.at[0, 0].add(probe_v), probe_v
                beta_kfm = L._beta_fm_of(beta_t, xs_elem)
                o, nrm, am = assoc_elem
                return L.frozen_chunk_partial_fm(geom, o, nrm, am, beta_kfm,
                                                 weight, g_per)

            nc_live = L._live_chunk_count(c, nc, chunk)
            # Mirror the library guards (losses.py): the fori_loop prefix
            # below only models the nc > 1, live_end-set configuration --
            # anything else would silently diverge from the real program.
            assert nc > 1, (
                f"assembly_chunk {chunk} >= surfel cap: the library takes "
                "the single-chunk path; rerun with a smaller --chunk")
            assert nc_live is not None, (
                "layout.live_end unset: the library takes the lax.scan "
                "path this script does not model")
            bpc = chunk // g_per
            parts0 = jnp.zeros((nc, bpc, 28 * 29), beta.dtype)

            def fbody(i, carry):
                cost, parts = carry
                part, dc = jac_chunk(L._take_chunk(xs, i),
                                     L._take_chunk(axs, i))
                parts = jax.lax.dynamic_update_index_in_dim(
                    parts, part, i, 0)
                return cost + dc, parts

            cost, parts = jax.lax.fori_loop(0, nc_live, fbody,
                                            (zero, parts0))
            partial = parts.reshape(-1, 28 * 29)
            if upto in ("geom", "warp", "rows", "jac"):
                return cost + jnp.sum(partial[::97])
            acc = assembly.segment_sum_matmul(
                partial, layout.block_tuple, t_cap,
                sum_dtype=sol.gram_sum_dtype)
            acc = acc.reshape(t_cap, 28, 29)
            gram, jtr_t = acc[..., :28], acc[..., 28]
            if upto == "segsum1":
                return cost + jnp.sum(gram[::7, ::5])
            rows = assembly._triu_pair_rows(layout, gram)
            if upto == "triu":
                return cost + jnp.sum(rows[::97])
            pair_cap = layout.pair_dest.shape[0]
            pacc = assembly.segment_sum_matmul(rows, layout.pair_rank10,
                                               pair_cap,
                                               sum_dtype=sol.gram_sum_dtype)
            if upto == "pairsum":
                return cost + jnp.sum(pacc)
            flat_nodes = layout.tuple_nodes.reshape(-1)
            jtr = assembly.segment_sum_matmul(
                -jtr_t.reshape(t_cap * 4, 7), flat_nodes, j_cap)
            return cost + jnp.sum(pacc) + jnp.sum(jtr)
        return fn

    def full(d, c, a, beta):
        out = L.assemble_normal_equations(cfg, c, beta + 0 * d, intr,
                                          assoc=a, with_cost=True)
        return out[2] + jnp.sum(out[0]) + jnp.sum(out[1])

    names = ["geom", "warp", "rows", "jac", "segsum1", "triu",
             "pairsum", "jtr", "full"]
    if args.stages:
        names = args.stages.split(",")
    out = {}
    for nm in names:
        fn = full if nm == "full" else prefix(nm)
        out[nm] = round(loop_time(
            lambda d, c, a, b, _f=fn: _f(d, c, a, b).astype(jnp.float32),
            jnp.float32(0.0), n_iter=args.reps,
            args=(ctx, assoc, beta0 * 1.0)), 2)
        print(f"{nm}: {out[nm]} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
