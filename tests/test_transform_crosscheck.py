"""Three-way transform cross-check: tangent FFT vs schoolbook vs int8 MXU.

The round-1 review flagged that bit-exactness was only ever checked against
a self-written oracle (spec/oracle.py) — a shared misreading of the
reference would pass every test. Julia is not installable in this
environment, so this test closes the loophole differently: it transcribes
the reference's OWN convolution algorithm — the float64 tangent FFT of
src/polynomials.jl:44-144, fold-and-twist, size-N/2 complex FFT, conjugate
untwist, round, wrap to Int32 — verbatim into NumPy, and asserts that three
STRUCTURALLY UNRELATED methods produce identical int32 words:

  1. this tangent FFT (the reference's method, float64 rounding),
  2. the oracle's int64 schoolbook negacyclic Toeplitz (spec/oracle.py),
  3. the framework's int8-limb MXU convolution (ops/conv.py) and the
     block-Karatsuba engine (ops/karatsuba.py).

Agreement of (1) and (2) validates the oracle against the reference's
actual algorithm; (3) is oracle-exact by the existing differential suite,
re-asserted here directly. Also exercises the reference's documented
precision envelope (int coefficients up to ~11 bits, polynomials.jl:135-141).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spec.oracle import negacyclic_mul as schoolbook
from tfhe_tpu.ops import conv
from tfhe_tpu.ops.karatsuba import (
    bake_karatsuba,
    karatsuba_delta,
    karatsuba_plan,
)


def tangent_fft_mul(x, y):
    """transformed_mul, transcribed from /root/reference/src/polynomials.jl:
    forward_transform (:106-112), inverse_transform (:119-132), pointwise
    product (:17-22). Exact for small x by float64 rounding."""
    n = len(x)
    w = np.exp(-2j * np.pi * np.arange(n // 2) / (2 * n))  # e^(-i pi k / N)

    def forward(c):
        c = np.asarray(c, np.float64)
        return np.fft.fft((c[: n // 2] - 1j * c[n // 2:]) * w)

    prod = forward(x) * forward(y)
    cb = np.conj(np.fft.ifft(prod)) * w
    out = np.empty(n, np.int64)
    out[: n // 2] = np.round(cb.real).astype(np.int64)
    out[n // 2:] = np.round(cb.imag).astype(np.int64)
    return (out & 0xFFFFFFFF).astype(np.uint32).astype(np.int32)  # to_int32


@pytest.mark.parametrize("n", [256, 1024])
@pytest.mark.parametrize("bound_bits", [1, 7, 10, 11])
def test_three_way_agreement(n, bound_bits):
    rng = np.random.default_rng(10 * n + bound_bits)
    half = 1 << (bound_bits - 1)
    x = rng.integers(-half, half, n).astype(np.int32)
    y = rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
    # adversarial words at the wrap boundary
    y[:8] = -(2**31)
    y[8:16] = 2**31 - 1

    ref_fft = tangent_fft_mul(x, y)
    ref_school = schoolbook(x, y)
    np.testing.assert_array_equal(ref_fft, ref_school)

    got_mxu = np.asarray(
        conv.poly_mul_batched_small(
            jnp.asarray(x)[None, None, :], jnp.asarray(y)[None, None, :],
            bound_bits,
        )
    )[0, 0]
    np.testing.assert_array_equal(got_mxu, ref_school)


def test_karatsuba_engine_against_tangent_fft():
    """The production Karatsuba path vs the reference's own method directly
    (128-bit-style decomposition digits)."""
    rng = np.random.default_rng(99)
    n, t, p, k = 1024, 128, 6, 2
    digits = rng.integers(-64, 64, (2, p, n)).astype(np.int32)
    key = rng.integers(-(2**31), 2**31, (p, k, n), dtype=np.int64).astype(
        np.int32
    )
    want = np.zeros((2, k, n), np.int64)
    for b in range(2):
        for kk in range(k):
            acc = np.zeros(n, np.int64)
            for pp in range(p):
                acc += tangent_fft_mul(digits[b, pp], key[pp, kk]).astype(
                    np.int64
                )
            want[b, kk] = acc
    want = (want & 0xFFFFFFFF).astype(np.uint32).astype(np.int32)

    plan = karatsuba_plan(n // t, 2, 7)
    e = bake_karatsuba(conv.prepare_shared_torus(jnp.asarray(key))[None], t,
                       plan)[0]
    got = np.asarray(karatsuba_delta(jnp.asarray(digits), e, t, plan))
    np.testing.assert_array_equal(got, want)
