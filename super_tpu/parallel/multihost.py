"""Multi-host orchestration helpers.

The reference has no distributed runtime (SURVEY.md 2.7).  Here multi-host
runs initialize `jax.distributed`, build a global ('stream', 'shard') mesh
over all hosts' devices, and shard the stream batch with
``jax.make_array_from_process_local_data`` -- streams are host-local (video
ingest is per-host), while the JTJ reduction rides ICI within each stream's
shard group.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on single-process runs).

    Honors the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment when args are omitted."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:  # NB: not `or` -- process 0 is falsy
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=num_processes,
                               process_id=process_id)


def shard_stream_batch(mesh, local_batch):
    """Place a host-local stream batch into the global 'stream'-sharded
    array (DCN never sees surfel data; only the batch axis is global)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("stream"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch)
