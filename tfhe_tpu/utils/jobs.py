"""Restartable encrypted-circuit jobs: checkpointed Schedule execution.

The reference has no failure handling or elasticity of any kind (SURVEY.md
section 5): a crashed evaluation loses everything. In this framework a long
batch job has exactly one piece of mutable state — the stacked wire-state
LweSample — and scheduled-batch boundaries are exact resume points
(netlist.Schedule.run_batches), so checkpoint-restart is the natural
elasticity model: keys are static inputs, progress is a single integer.

`run_checkpointed` executes a compiled Schedule in chunks of `every`
scheduled batches, persisting (job fingerprint, next batch, wire state) to
disk after each chunk with an atomic replace. A restarted process with the
same arguments resumes at the last completed chunk and produces a bitwise
identical final state (gate evaluation is deterministic given the cloud
key); a checkpoint from a *different* job (circuit, schedule, batch shape or
parameters changed) is detected by fingerprint and ignored.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..lwe import LweSample
from . import serialization


def job_fingerprint(schedule, params, batch_shape) -> str:
    """Digest of everything that determines a job's execution plan."""
    circ = schedule.circuit
    h = hashlib.sha256()
    for arr in (
        np.asarray(circ.gate_type, np.int32),
        np.asarray(circ.fanin, np.int32),
        np.asarray(circ.out_wire, np.int32),
        np.asarray(schedule.gate_order, np.int32),
        np.asarray(schedule.batch_start, np.int32),
        np.asarray(schedule.batch_type, np.int32),
    ):
        h.update(arr.tobytes())
        h.update(b"|")
    h.update(json.dumps(sorted(
        (int(k), bool(v)) for k, v in circ.const_value.items())).encode())
    if schedule.wire_slot is not None:
        h.update(np.asarray(schedule.wire_slot, np.int32).tobytes())
    h.update(repr(tuple(batch_shape)).encode())
    h.update(repr(params).encode())  # frozen dataclass: stable repr
    # result-affecting tuning knobs only: schedule knobs (batch tiles, DMA
    # slots, kernel selection) are bit-exact by construction and a resumed
    # job may legally run under a different schedule (tfhe_tpu/tuning.py)
    from ..tuning import get_tuning

    h.update(get_tuning().result_fingerprint().encode())
    return h.hexdigest()


def _save_atomic(obj, path: str) -> None:
    tmp = path + ".tmp"
    serialization.save(obj, tmp)
    os.replace(tmp, path)


def load_checkpoint(path: str, fingerprint: str):
    """(next_batch, state) from a valid matching checkpoint, else None."""
    if not os.path.exists(path):
        return None
    try:
        saved_fp, next_batch, state = serialization.load(path)
    except Exception:
        return None  # truncated/corrupt file: start fresh
    if saved_fp != fingerprint:
        return None
    state = LweSample(jnp.asarray(state.a), jnp.asarray(state.b),
                      jnp.asarray(state.cv))
    return int(next_batch), state


def run_checkpointed(
    schedule,
    ck,
    inputs,
    checkpoint_path: str,
    *,
    batch_shape=(),
    every: int = 8,
    on_chunk: Optional[Callable[[int, int], None]] = None,
) -> LweSample:
    """Execute `schedule` with periodic checkpoints; resume if one exists.

    every: scheduled batches per checkpoint (each scheduled batch is one
    batched gate call, so `every` trades re-done work against d2h + disk
    traffic). on_chunk(done_batches, total_batches) is called after each
    checkpoint write — progress reporting, or raising to simulate
    preemption in tests. Returns the final wire state (same contract as
    Schedule.run); the checkpoint file is removed on completion.
    """
    fp = job_fingerprint(schedule, ck.params, batch_shape)
    resumed = load_checkpoint(checkpoint_path, fp)
    if resumed is not None:
        start, state = resumed
    else:
        start, state = 0, schedule.init_state(ck, inputs, batch_shape)

    nb = schedule.n_batches
    while start < nb:
        hi = min(start + every, nb)
        state = schedule.run_batches(ck, state, start, hi)
        # np.asarray is the honest device barrier here (utils/sync.py): the
        # checkpoint must not be written before the chunk really finished.
        host = LweSample(np.asarray(state.a), np.asarray(state.b),
                         np.asarray(state.cv))
        _save_atomic((fp, hi, host), checkpoint_path)
        start = hi
        if on_chunk is not None:
            on_chunk(start, nb)
    if os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)
    return state
