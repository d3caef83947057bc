"""2-process jax.distributed integration test (VERDICT round-1 item 7).

Spawns two real OS processes, each with 4 virtual CPU devices, forming an
8-device global ('stream', 'shard') mesh; both run one multi-chip tracking
step with host-local stream placement (multihost.shard_stream_batch) and
cross-process allgather of the results.  Exercises
parallel/multihost.initialize -> jax.distributed.initialize,
make_array_from_process_local_data, and the sharded step across process
boundaries end to end.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_process_step():
    port = _free_port()
    env = dict(os.environ)
    # The workers set their own XLA_FLAGS/platform; scrub inherited ones.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(i), "2", str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=720)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    lines = [ln for out in outs for ln in out.splitlines()
             if ln.startswith("MULTIHOST_OK")]
    assert len(lines) == 2, outs
    # Both processes observed the same global result.
    assert lines[0].split(" ", 2)[2] == lines[1].split(" ", 2)[2], lines


def test_two_process_distributed_step():
    # One retry: the 2-process rendezvous is load-sensitive (distributed
    # barrier timeouts when the host is saturated by parallel compiles).
    try:
        _run_two_process_step()
    except AssertionError:
        _run_two_process_step()
