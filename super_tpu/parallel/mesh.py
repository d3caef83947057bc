"""Device-mesh helpers for multi-chip scaling.

The reference is single-GPU (SURVEY.md 2.7: its only parallelism is a
DataParallel wrapper on the depth net).  The TPU-native scaling story is:

- ``stream`` axis: data parallelism over concurrent surgical video streams
  (each stream's tracker state is independent; no cross-stream traffic).
- ``shard`` axis: intra-solve parallelism over the surfel dimension -- each
  shard computes the point-plane residual block of its surfel slice and the
  per-iteration normal equations are combined with a ``psum`` over ICI
  (the JTJ/JTr reduction of super/LM.py:61-65 is the only cross-shard
  traffic).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_streams: Optional[int] = None,
              num_shards: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('stream', 'shard') mesh over the available devices.

    Defaults: all devices on the stream axis (pure DP), one shard.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_streams is None and num_shards is None:
        num_streams, num_shards = n, 1
    elif num_streams is None:
        num_streams = n // num_shards
    elif num_shards is None:
        num_shards = n // num_streams
    if num_streams * num_shards != n:
        raise ValueError(
            f"mesh {num_streams}x{num_shards} != {n} devices")
    arr = np.asarray(devices).reshape(num_streams, num_shards)
    return Mesh(arr, axis_names=("stream", "shard"))
