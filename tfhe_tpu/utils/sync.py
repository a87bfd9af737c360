"""Honest device-completion barriers for tunneled-TPU runtimes.

On the tunneled single-chip runtime this project benchmarks on, execution is
asynchronous in a way `jax.block_until_ready` does NOT see through: before
the first device-to-host transfer of the process, dispatches (and even XLA
compilation) are deferred/pipelined and `block_until_ready` returns
immediately. The only reliable completion barrier is a device-to-host read.
A further quirk: the FIRST d2h read permanently switches the process into a
synchronous dispatch mode (~25 ms tunnel round-trip per jitted call, vs
~0.07 ms pipelined before). See tools/dispatch_probe.py and
tools/barrier_probe.py for the measurements.

Benchmark recipe that follows from this:
* end every timed region with `device_barrier(out)` (NOT bare
  block_until_ready);
* chain iterations (out feeds the next call) — the runtime elides repeated
  identical calls;
* to measure pipelined throughput without the per-call round-trip, keep ALL
  d2h reads (including correctness checks) after the final timed barrier;
* AOT-compile with `jit(f).lower(*args).compile()` before the timed region —
  a warmup call's compile is otherwise still pending when the timer starts.
"""

from __future__ import annotations

import jax
import numpy as np


def prime_sync() -> None:
    """Switch the process into the synchronous dispatch mode, deliberately.

    Counter-intuitively this is the FAST mode on the tunneled runtime: the
    deferred pre-d2h mode measured ~8x slower per executed call than
    synchronous dispatch (tools/barrier_probe.py / aot_probe.py), on top of
    making block_until_ready dishonest. Call this once at the top of every
    benchmark / latency-sensitive process; after it, classic JAX timing
    (block_until_ready) is trustworthy and each jitted call pays one ~25 ms
    tunnel round-trip.
    """
    np.asarray(jax.numpy.zeros((1,), jax.numpy.int32))


def device_barrier(tree) -> None:
    """Block until `tree`'s computation has ACTUALLY completed.

    Reads one element of one leaf back to the host (a few bytes), which this
    runtime cannot defer. Also calls block_until_ready first so the barrier
    is correct on standard (non-tunneled) runtimes at zero extra cost.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return
    jax.block_until_ready(leaves)
    leaf = leaves[0]
    if hasattr(leaf, "ndim"):
        np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
