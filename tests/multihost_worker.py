"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Each process owns 4 virtual CPU devices; together they form the 8-device
('stream' 4, 'shard' 2) global mesh.  Streams are host-local (2 per
process, placed with make_array_from_process_local_data via
multihost.shard_stream_batch); the JTJ psum over 'shard' stays inside each
process's device pair, mirroring the ICI-local reduction layout described
in super_tpu/parallel/multihost.py.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import os
import sys

PROC_ID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# (The generous in-process rendezvous timeouts that de-skew 8 device
# threads on ~4 cores are per-jit compiler options -- set by
# make_multichip_step; they are NOT valid in XLA_FLAGS.)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the two workers build identical executables,
# and a retry (or a second test run) must not pay the full compile again
# while its peer waits in a distributed barrier.
_cache = os.environ.get("SUPER_TPU_TEST_CACHE",
                        "/tmp/super_tpu_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from super_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=f"localhost:{PORT}",
                     num_processes=NPROC, process_id=PROC_ID)


def main():
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from __graft_entry__ import _make_frame, _small_cfg
    from super_tpu.core.tracker import init_tracker
    from super_tpu.data.synthetic import default_intrinsics
    from super_tpu.parallel.mesh import make_mesh
    from super_tpu.parallel.sharded import make_multichip_step

    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == 4 * NPROC, jax.devices()
    assert len(jax.local_devices()) == 4

    num_streams, num_shards = 2 * NPROC, 2
    mesh = make_mesh(num_streams=num_streams, num_shards=num_shards,
                     devices=jax.devices())

    cfg = _small_cfg()
    intr = default_intrinsics(cfg.height, cfg.width)
    frame0 = _make_frame(cfg, intr, 0)
    frame1 = _make_frame(cfg, intr, 1)
    state1 = init_tracker(cfg, frame0)

    local = num_streams // NPROC  # host-local streams
    bcast = lambda x: np.broadcast_to(  # noqa: E731
        np.asarray(x)[None], (local,) + x.shape)
    states = multihost.shard_stream_batch(mesh, jax.tree.map(bcast, state1))
    frames = multihost.shard_stream_batch(mesh, jax.tree.map(bcast, frame1))

    step = make_multichip_step(cfg, intr, mesh)
    new_states, outs = step(states, frames)
    jax.block_until_ready(outs.lm_cost)

    cost = np.asarray(multihost_utils.process_allgather(outs.lm_cost,
                                                        tiled=True))
    nsurf = np.asarray(multihost_utils.process_allgather(outs.num_surfels,
                                                         tiled=True))
    assert cost.shape[0] == num_streams, cost.shape
    assert np.isfinite(cost).all(), cost
    # Identical per-stream inputs -> identical per-stream results.
    assert np.allclose(cost, cost[0]), cost
    assert (nsurf == nsurf[0]).all(), nsurf
    print(f"MULTIHOST_OK {PROC_ID} cost={cost[0]:.9e} surfels={int(nsurf[0])}",
          flush=True)


if __name__ == "__main__":
    main()
