"""Profiling harness (the reference only wall-clocks the optimizer loop,
super/deform_mesh.py:281,372-375; here: dependent-chain timing that is
correct on asynchronous backends, plus jax.profiler traces).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def chain_time(fn: Callable, *args, probe: Callable = None, reps: int = 5,
               **kwargs) -> float:
    """Seconds per call, measured on a dependent chain.

    ``block_until_ready`` alone under-measures on remote/async backends;
    feeding a scalar of each result into the next call forces serial device
    execution.  ``probe`` extracts that scalar (default: first leaf's first
    element).
    """
    if probe is None:
        def probe(out):
            leaf = jax.tree.leaves(out)[0]
            return jnp.ravel(leaf)[0].astype(jnp.float32)

    dep = jnp.float32(0.0)

    def call(d):
        # Inject the dependency scalar into the first floating leaf of each
        # arg pytree (args are often NamedTuple states/contexts, not bare
        # arrays -- a top-level isinstance check would silently break the
        # chain and under-measure).  One leaf serializes the chain.
        def inject_tree(tree):
            leaves, treedef = jax.tree.flatten(tree)
            done = False
            out = []
            for a in leaves:
                if not done and isinstance(a, jnp.ndarray) and \
                        jnp.issubdtype(a.dtype, jnp.floating):
                    a = a + d.astype(a.dtype) * 0
                    done = True
                out.append(a)
            return jax.tree.unflatten(treedef, out)

        new_args = [inject_tree(a) for a in args]
        return fn(*new_args, **kwargs)

    out = call(dep)
    dep = probe(out) * 0
    out = call(dep)
    dep = probe(out) * 0
    float(dep)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = call(dep)
        dep = probe(out) * 1e-30
    float(dep)
    return (time.perf_counter() - t0) / reps


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def loop_time(make_fn: Callable, init, n_iter: int = 20,
              args: tuple = ()) -> float:
    """Milliseconds per iteration of ``make_fn`` measured inside one
    compiled fori_loop (amortizes dispatch entirely).

    ``args``: operand pytrees passed as REAL jit arguments
    (``make_fn(acc, *args)``).  Closure-captured operands become jit
    constants, and the remote-compile tunnel rejects programs with
    >~150 MB of constants (HTTP 413) -- route anything big through here.
    """

    @jax.jit
    def run(x, *a):
        def body(i, acc):
            return acc + make_fn(acc * 1e-30, *a) * 1e-30
        return jax.lax.fori_loop(0, n_iter, body, x)

    r = run(init, *args)
    float(r)
    t0 = time.perf_counter()
    float(run(init, *args))
    return (time.perf_counter() - t0) / n_iter * 1e3
