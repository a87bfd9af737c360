"""Observability: noise-margin telemetry and throughput accounting.

The reference's only noise signal is the advisory `current_variance` field
(never read, incompletely maintained — reference issue #7, SURVEY.md
section 5). This module provides the measurements production deployments
actually need:

* `noise_margin`: decrypt-phase distance from the decision boundary for a
  batch of ciphertexts (requires the secret key — a client-side/test-time
  diagnostic, mirroring the gate contract noise < 1/16, src/gates.jl:1-6);
* `GateThroughput`: simple wall-clock gates/sec accounting for batched runs.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from ..api import SecretKey
from ..lwe import LweSample, lwe_phase
from ..numeric import encode_message


@dataclasses.dataclass
class NoiseReport:
    """Phase-margin statistics for a ciphertext batch (fractions of the torus)."""

    mean_error: float
    max_error: float
    margin: float  # distance of the worst sample from the decision boundary
    failures: int  # samples whose phase sign no longer matches +-mu

    def healthy(self, budget: float = 1.0 / 16) -> bool:
        """Gate contract: noise < 1/16 of the torus (src/gates.jl:1-6)."""
        return self.failures == 0 and self.max_error < budget


def noise_margin(key: SecretKey, sample: LweSample,
                 expected=None) -> NoiseReport:
    """Measure how far each phase sits from the ideal +-1/8 encoding.

    expected: optional bool[...] of the true plaintexts; without it the
    nearest encoding is assumed correct (failures then always 0).
    """
    phase = np.asarray(lwe_phase(sample, key.key)).astype(np.int64)
    mu = np.int64(encode_message(1, 8))

    def circ_dist(d):
        # circular torus distance: reduce mod 2^32 into [-2^31, 2^31)
        return np.abs(((d + 2**31) & 0xFFFFFFFF) - 2**31)

    err_pos = circ_dist(phase - mu)
    err_neg = circ_dist(phase + mu)
    err = np.minimum(err_pos, err_neg)
    failures = 0
    if expected is not None:
        want = np.asarray(expected, bool)
        failures = int(((phase > 0) != want).sum())
        err = np.where(want, err_pos, err_neg)
    scale = float(2**32)
    return NoiseReport(
        mean_error=float(err.mean()) / scale,
        max_error=float(err.max()) / scale,
        margin=float(mu - err.max()) / scale,
        failures=failures,
    )


class GateThroughput:
    """Wall-clock gates/sec accounting: `with GateThroughput(n) as t: ...`."""

    def __init__(self, n_gates: int):
        self.n_gates = n_gates
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False

    @property
    def gates_per_second(self) -> float:
        return self.n_gates / self.elapsed if self.elapsed else float("inf")

    def block_on(self, tree):
        """Block on a pytree of device arrays before stopping the clock."""
        jax.block_until_ready(tree)
        return tree
