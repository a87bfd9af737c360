"""Chunked MK megakernel == scanned per-step sparse kernel, bitwise.

Runs both in interpret mode on CPU; the per-step sparse kernel is itself
differentially tested against the prepared XLA path (tests/test_mk.py), so
bit-exactness vs the NumPy MK oracle follows by composition.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _clear_xla_cpu_state():
    """Every test in this file compiles a LARGE interpret-mode module
    (in-kernel expansion unrolled per plan row x nonzero block); XLA:CPU
    aborts/segfaults after a few such compiles accumulate in one process
    (round 5; same failure class as the suite-wide every-8-tests clearing,
    tools/xla_cpu_crash_probe.sh). Clear before every test, not every 8."""
    jax.clear_caches()
    yield

from tfhe_tpu.mk.internals import mk_nonzero_blocks
from tfhe_tpu.ops.karatsuba import expand_karatsuba_sparse, karatsuba_plan
from tfhe_tpu.ops.pallas_cmux import (
    cmux_step_pallas_sparse,
    mk_blind_rotate_pallas_chunk,
    mk_blind_rotate_pallas_compact,
)
from tfhe_tpu.tgsw import decomp_offset


def rand_t32(rng, shape):
    return rng.integers(-(2**31), 2**31, size=shape,
                        dtype=np.int64).astype(np.int32)


@pytest.mark.parametrize("parties,party,l,b", [(2, 0, 4, 7), (4, 3, 5, 6)])
def test_mk_chunk_matches_per_step(rng, parties, party, l, b):
    n, t, depth, steps, batch = 256, 32, 2, 4, 8
    _chunk_vs_per_step(rng, parties, party, l, b, n, t, depth, steps, batch)


@pytest.mark.slow
def test_mk_chunk_matches_per_step_8party(rng):
    # the 8-party sparsity pattern (25/81 nonzero blocks) has a different
    # unit structure than 2/4 parties; production l=8, b=4
    _chunk_vs_per_step(rng, 8, 5, 8, 4, n=256, t=32, depth=2, steps=2,
                       batch=8)


def _chunk_vs_per_step(rng, parties, party, l, b, n, t, depth, steps, batch):
    k1 = parties + 1
    plan = karatsuba_plan(n // t, depth, b)
    nz = mk_nonzero_blocks(party, parties)
    offset = decomp_offset(l, b)

    limbs = rng.integers(-128, 128,
                         size=(steps, 4, k1 * l, k1, 2 * n)).astype(np.int8)
    acc0 = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=(steps, batch)).astype(np.int32)
    bara[0, 0] = 0  # no-op lane

    kw = dict(n=n, k1=k1, l=l, b=b, t=t, plan=plan, nz=nz, offset=offset,
              interpret=True)
    want = acc0
    e_steps = []
    for s in range(steps):
        e_i = expand_karatsuba_sparse(jnp.asarray(limbs[s]), t, plan, nz, l)
        e_steps.append(e_i)
        want = cmux_step_pallas_sparse(want, e_i, bara[s], **kw)

    got = mk_blind_rotate_pallas_chunk(
        acc0, jnp.stack(e_steps), jnp.asarray(bara), **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _nz_select(limbs, l, nz):
    """Dense prepared limbs [steps, 4, P, K, 2N] -> the compact kernel's
    nz-selected form [steps, 4, NZ, l, 2N] (mirrors internals.select_compact
    for non-sparse keys)."""
    return np.stack(
        [limbs[:, :, j * l: (j + 1) * l, kc] for (j, kc) in nz], axis=2)


@pytest.mark.parametrize("parties,party,l,b,groups", [
    (2, 0, 4, 7, 1), (2, 1, 4, 7, 2), (4, 3, 5, 6, 1)])
def test_mk_compact_matches_per_step(rng, parties, party, l, b, groups):
    """Compact megakernel (in-kernel sparse expansion) == scanned per-step
    sparse kernel over pre-expanded operands, bitwise — incl. the multi-
    group split (groups=2 shrinks group_budget to force two launches).

    Geometry is deliberately small (n=128, depth=1): the in-kernel
    expansion unrolls per plan row x nonzero block, and at n=256/depth=2
    the interpret-mode module took XLA:CPU ~3.5 min to compile at one
    device and SEGFAULTED the compiler under the suite's 8 virtual
    devices (round 5; tools/xla_cpu_crash_probe.sh documents the
    compiler's fragility). The sparsity/remap logic under test is
    geometry-independent."""
    n, t, depth, steps, batch = 128, 32, 1, 3, 8
    k1 = parties + 1
    plan = karatsuba_plan(n // t, depth, b)
    nz = mk_nonzero_blocks(party, parties)
    offset = decomp_offset(l, b)

    limbs = rng.integers(-128, 128,
                         size=(steps, 4, k1 * l, k1, 2 * n)).astype(np.int8)
    acc0 = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=(steps, batch)).astype(np.int32)
    bara[0, 0] = 0  # no-op lane

    kw = dict(n=n, k1=k1, l=l, b=b, t=t, plan=plan, nz=nz, offset=offset,
              interpret=True)
    want = acc0
    for s in range(steps):
        e_i = expand_karatsuba_sparse(jnp.asarray(limbs[s]), t, plan, nz, l)
        want = cmux_step_pallas_sparse(want, e_i, bara[s], **kw)

    row_bytes = k1 * n * 4 + (n // t) * k1 * l * t + n * 4
    budget = (batch // groups) * row_bytes + 1
    got = mk_blind_rotate_pallas_compact(
        acc0, jnp.asarray(_nz_select(limbs, l, nz)), jnp.asarray(bara),
        group_budget=budget, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_mk_compact_matches_per_step_8party(rng):
    # n=128/depth=1 for the same XLA:CPU compile-size reason as above —
    # at l=8, k1=9 the in-kernel expansion unrolls 25 nonzero blocks
    n, t, depth, steps, batch = 128, 32, 1, 2, 8
    parties, party, l, b = 8, 5, 8, 4
    k1 = parties + 1
    plan = karatsuba_plan(n // t, depth, b)
    nz = mk_nonzero_blocks(party, parties)
    offset = decomp_offset(l, b)
    limbs = rng.integers(-128, 128,
                         size=(steps, 4, k1 * l, k1, 2 * n)).astype(np.int8)
    acc0 = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=(steps, batch)).astype(np.int32)
    kw = dict(n=n, k1=k1, l=l, b=b, t=t, plan=plan, nz=nz, offset=offset,
              interpret=True)
    want = acc0
    for s in range(steps):
        e_i = expand_karatsuba_sparse(jnp.asarray(limbs[s]), t, plan, nz, l)
        want = cmux_step_pallas_sparse(want, e_i, bara[s], **kw)
    got = mk_blind_rotate_pallas_compact(
        acc0, jnp.asarray(_nz_select(limbs, l, nz)), jnp.asarray(bara), **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
