"""Pallas tuple-Gram kernel vs the XLA reference reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_tpu.core.assembly import TupleLayout, block_reduce
from super_tpu.pallas_kernels.gram import tuple_gram_pallas


def _setup(rng, np_cap=4096, g=32, t_cap=64):
    nblocks = np_cap // g
    # Sorted block->tuple map with ragged run lengths (incl. empty tuples).
    bt = np.sort(rng.integers(0, t_cap - 2, size=nblocks)).astype(np.int32)
    h = rng.normal(size=(np_cap, 28)).astype(np.float32)
    r = rng.normal(size=(np_cap,)).astype(np.float32)
    layout = TupleLayout(
        sort_perm=jnp.zeros((np_cap,), jnp.int32),
        src_pos=jnp.zeros((np_cap,), jnp.int32),
        slot_valid=jnp.ones((np_cap,), bool),
        block_tuple=jnp.asarray(bt),
        tuple_nodes=jnp.zeros((t_cap, 4), jnp.int32),
        overflow_count=jnp.asarray(0, jnp.int32),
    )
    return layout, jnp.asarray(h), jnp.asarray(r), g, t_cap


def test_pallas_gram_matches_xla(rng):
    layout, h, r, g, t_cap = _setup(rng)
    gram_ref, jtr_ref = block_reduce(layout, h, r, pad_group=g)
    gram_p, jtr_p = tuple_gram_pallas(h, r, layout.block_tuple,
                                      tuple_cap=t_cap, block=g,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(gram_p), np.asarray(gram_ref),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jtr_p), np.asarray(jtr_ref),
                               rtol=2e-5, atol=1e-4)


def test_pallas_assembly_backend_matches_xla():
    """assemble_normal_equations with the pallas backend == xla backend."""
    import dataclasses

    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_scene

    from super_tpu.core.losses import assemble_normal_equations, prepare_lm
    from super_tpu.core.tracker import init_tracker
    from super_tpu.geometry.quaternion import IDENTITY_DQ

    cfg, intr, seq, frames = tiny_scene(num_frames=2)
    st = init_tracker(cfg, frames[0])
    ctx = prepare_lm(cfg, st.surfels, st.graph, frames[1])
    j_cap = cfg.capacity.node_capacity
    beta = jnp.tile(IDENTITY_DQ[None], (j_cap, 1)) + 0.005
    jtj_x, jtr_x = assemble_normal_equations(cfg, ctx, beta, intr)
    cfg_p = cfg.replace(solver=dataclasses.replace(
        cfg.solver, assembly_backend="pallas"))
    jtj_p, jtr_p = assemble_normal_equations(cfg_p, ctx, beta, intr)
    scale = float(jnp.max(jnp.abs(jtj_x))) + 1e-12
    np.testing.assert_allclose(np.asarray(jtj_p) / scale,
                               np.asarray(jtj_x) / scale, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jtr_p), np.asarray(jtr_x),
                               rtol=1e-4, atol=1e-5)
