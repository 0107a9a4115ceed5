"""Benchmark timing helpers.

IMPORTANT (measured, not theoretical): under the axon remote-TPU tunnel,
``jax.block_until_ready`` acknowledges before the device actually
finishes queued work — a chained 8192³ matmul "completed" in 0.019 ms
(56 PFLOP/s). A device→host readback of any scalar derived from the
result cannot lie (6.6 ms → 167 TFLOP/s ≈ 85% of v5e peak). Every
benchmark must therefore end its timed region with ``force()``.
"""
from __future__ import annotations

import time

import numpy as np


def force(tree) -> float:
    """Force TRUE completion by reading one scalar back to the host.

    One readback = one tunnel round-trip; reading every leaf would cost
    hundreds of RTTs. A single leaf's scalar forces the whole chain up
    to the previous step (later steps depend on ALL of the earlier
    state), so over N timed iterations the error is at most one step's
    loose tail."""
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    x = leaves[0]
    if isinstance(x, jax.Array) and x.ndim > 0:
        # slice ONE element on-device first: np.asarray(whole_leaf) would
        # ship the entire array through the tunnel (8 MB ≈ 10 ms of
        # transfer billed to the benchmark). The slice op depends on the
        # full producer chain, so the 4-byte readback still proves true
        # completion.
        import jax.numpy as jnp

        x = jnp.ravel(x)[0]
    return float(np.ravel(np.asarray(x))[0])


def timeit(fn, *args, iters: int = 10, pipelined: bool = True) -> float:
    """Mean seconds per call with true-completion semantics.

    pipelined=True times `iters` back-to-back dispatches ending in one
    readback (throughput); False reads back every call (latency)."""
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    if pipelined:
        for _ in range(iters):
            out = fn(*args)
        force(out)
    else:
        for _ in range(iters):
            out = fn(*args)
            force(out)
    return (time.perf_counter() - t0) / iters
