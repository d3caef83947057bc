"""Tracker-state checkpoint / resume (orbax).

The reference can only load *model* checkpoints; tracker state (surfels +
ED graph) is never saved, so a crash loses the whole sequence
(SURVEY.md section 5).  Here the full TrackerState pytree snapshots to disk
and restores exactly -- the fixed-capacity SoA layout makes the snapshot a
flat set of dense arrays.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def save_state(path: str, state, step: Optional[int] = None) -> str:
    """Save a TrackerState pytree; returns the checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step:08d}")
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.device_get(state), force=True)
    ckpt.wait_until_finished()
    return path


def restore_state(path: str, reference_state):
    """Restore a TrackerState saved by :func:`save_state`.

    ``reference_state`` supplies the pytree structure/shapes (build it with
    init_tracker on a dummy frame of the same config)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    target = jax.tree.map(np.asarray, jax.device_get(reference_state))
    restored = ckpt.restore(os.path.abspath(path), target)
    return jax.tree.map(lambda x: x, restored)


def latest_checkpoint(root: str) -> Optional[str]:
    if not os.path.isdir(root):
        return None
    steps = [d for d in os.listdir(root) if d.startswith("step_")]
    if not steps:
        return None
    return os.path.join(root, sorted(steps)[-1])
