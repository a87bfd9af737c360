"""On-chip tier: the COMPILED Mosaic kernels vs the XLA paths, bitwise.

The CPU suite runs every Pallas kernel in interpret mode only; a Mosaic
regression (layout rule, lane alignment, DMA semantics) would otherwise
surface as a driver bench failure rather than a test failure. This tier
compiles the kernels for real on the one tunneled TPU chip:

    TFHE_TPU_TEST_BACKEND=tpu python -m pytest tests/ -q -m tpu

Every check is a bitwise ciphertext comparison between the compiled kernel
and the pure-XLA path on the same chip (same int32 wraparound algebra, so
equality is exact, not approximate). Reference semantics under test:
blind rotation src/bootstrap.jl:32-39, MK rotation src/mk_internals.jl:473-485.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

if jax.default_backend() == "cpu":  # pragma: no cover - guard for CPU runs
    pytest.skip("needs the real TPU backend (TFHE_TPU_TEST_BACKEND=tpu)",
                allow_module_level=True)

import tfhe_tpu as tt  # noqa: E402
from tfhe_tpu import gates  # noqa: E402


@pytest.fixture(scope="module")
def keys80():
    params = tt.tfhe_parameters_80()
    sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(123), params)
    jax.block_until_ready(ck.bootstrap_key.baked)
    return sk, ck


@pytest.mark.parametrize("pipe", ["0", "1"])
def test_singlekey_compiled_megakernel_vs_xla(keys80, monkeypatch, pipe):
    """gate_nand through the compiled blind-rotation megakernel (plain and
    two-subtile pipelined) == the XLA mux_rotate_karatsuba scan, bitwise."""
    sk, ck = keys80
    batch = 512  # pipelined auto path needs >= 2 full 256-row cells
    bits_x = jnp.arange(batch) % 2 == 0
    bits_y = jnp.arange(batch) % 3 == 0
    x = tt.encrypt(jax.random.PRNGKey(1), sk, bits_x)
    y = tt.encrypt(jax.random.PRNGKey(2), sk, bits_y)

    monkeypatch.setenv("TFHE_TPU_CMUX", "xla")
    want = gates.gate_nand(ck, x, y)
    monkeypatch.setenv("TFHE_TPU_CMUX", "pallas")
    monkeypatch.setenv("TFHE_TPU_PIPE", pipe)
    got = gates.gate_nand(ck, x, y)

    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(sk, got)), ~(np.asarray(bits_x)
                                           & np.asarray(bits_y)))


@pytest.mark.parametrize("parties,party", [(2, 0), (4, 3)])
def test_mk_sparse_kernels_compiled(parties, party):
    """Compiled sparse MK CMUX kernels (per-step and chunked megakernel) on
    synthetic operands at production geometry (N=1024, T=128) == each other,
    bitwise. The per-step kernel is itself differentially tested against the
    prepared XLA path on CPU (tests/test_mk.py), so agreement here extends
    that chain to the compiled Mosaic code. No key ceremony — random limbs
    exercise the same integer algebra."""
    from tfhe_tpu.mk.internals import mk_nonzero_blocks
    from tfhe_tpu.ops.karatsuba import (
        expand_karatsuba_sparse,
        karatsuba_plan,
    )
    from tfhe_tpu.ops.pallas_cmux import (
        cmux_step_pallas_sparse,
        mk_blind_rotate_pallas_chunk,
    )
    from tfhe_tpu.tgsw import decomp_offset

    rng = np.random.default_rng(7)
    n, t, depth, steps, batch, l, b = 1024, 128, 2, 4, 256, 4, 7
    k1 = parties + 1
    plan = karatsuba_plan(n // t, depth, b)
    nz = mk_nonzero_blocks(party, parties)
    offset = decomp_offset(l, b)

    limbs = rng.integers(-128, 128,
                         size=(steps, 4, k1 * l, k1, 2 * n)).astype(np.int8)
    acc0 = rng.integers(-(2**31), 2**31, size=(batch, k1, n),
                        dtype=np.int64).astype(np.int32)
    bara = rng.integers(0, 2 * n, size=(steps, batch)).astype(np.int32)
    bara[0, 0] = 0  # no-op lane

    kw = dict(n=n, k1=k1, l=l, b=b, t=t, plan=plan, nz=nz, offset=offset,
              interpret=False)
    want = jnp.asarray(acc0)
    e_steps = []
    for s in range(steps):
        e_i = expand_karatsuba_sparse(jnp.asarray(limbs[s]), t, plan, nz, l)
        e_steps.append(e_i)
        want = cmux_step_pallas_sparse(want, e_i, jnp.asarray(bara[s]), **kw)

    got = mk_blind_rotate_pallas_chunk(
        jnp.asarray(acc0), jnp.stack(e_steps), jnp.asarray(bara), **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fast_preset_compiled_vs_xla(monkeypatch):
    """The SHIPPED preset's geometry (k=4, N=256, balanced l=2 b=8 gadget)
    through the compiled megakernels == the XLA path, bitwise — the
    headline bench path gets the same regression guard as the 80-bit one."""
    params = tt.tfhe_parameters_128_fast()
    sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(321), params)
    jax.block_until_ready(ck.bootstrap_key.baked)
    batch = 512
    bits_x = jnp.arange(batch) % 2 == 0
    bits_y = jnp.arange(batch) % 3 == 0
    x = tt.encrypt(jax.random.PRNGKey(1), sk, bits_x)
    y = tt.encrypt(jax.random.PRNGKey(2), sk, bits_y)

    monkeypatch.setenv("TFHE_TPU_CMUX", "xla")
    want = gates.gate_nand(ck, x, y)
    for pipe in ("0", "1"):
        monkeypatch.setenv("TFHE_TPU_CMUX", "pallas")
        monkeypatch.setenv("TFHE_TPU_PIPE", pipe)
        got = gates.gate_nand(ck, x, y)
        np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
        np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(sk, want)),
        ~(np.asarray(bits_x) & np.asarray(bits_y)))
