"""Bit-exact tests of the negacyclic convolution engines vs the NumPy spec."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu import polynomial
from tfhe_tpu.ops import conv
from spec import oracle


def rand_torus(rng, shape):
    return rng.integers(-(2**31), 2**31, size=shape, dtype=np.int64).astype(np.int32)


def test_negacyclic_mul_matches_oracle(rng):
    n = 64
    x = rng.integers(-512, 512, size=n).astype(np.int32)  # small operand
    y = rand_torus(rng, n)
    expected = oracle.negacyclic_mul(x, y)
    got = np.asarray(conv.negacyclic_mul(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_array_equal(got, expected)


def test_negacyclic_mul_broadcasts(rng):
    n = 32
    x = rng.integers(-64, 64, size=(3, n)).astype(np.int32)
    y = rand_torus(rng, (3, n))
    got = np.asarray(conv.negacyclic_mul(jnp.asarray(x), jnp.asarray(y)))
    for b in range(3):
        np.testing.assert_array_equal(got[b], oracle.negacyclic_mul(x[b], y[b]))


def test_split_torus_limbs_roundtrip(rng):
    x = rand_torus(rng, (128,))
    limbs = np.asarray(conv.split_torus_limbs(jnp.asarray(x)), np.int64)
    recon = sum(limbs[j] << (8 * j) for j in range(4))
    np.testing.assert_array_equal(oracle.w32(recon), x)


def test_split_small_limbs_roundtrip(rng):
    for bound_bits, lo, hi in [(6, -64, 64), (9, -512, 512)]:
        d = rng.integers(lo, hi, size=(64,)).astype(np.int32)
        limbs, shifts = conv.split_small_limbs(jnp.asarray(d), bound_bits)
        limbs = np.asarray(limbs, np.int64)
        recon = sum(limbs[s] << shifts[s] for s in range(len(shifts)))
        np.testing.assert_array_equal(recon, d)


def test_poly_mul_batched_small_matches_oracle(rng):
    n, B, P, K = 64, 3, 4, 2
    digits = rng.integers(-512, 512, size=(B, P, n)).astype(np.int32)
    t = rand_torus(rng, (P, K, n))
    got = np.asarray(
        conv.poly_mul_batched_small(jnp.asarray(digits), jnp.asarray(t), 9)
    )
    for b in range(B):
        for k in range(K):
            expected = np.zeros(n, np.int64)
            for p in range(P):
                expected += oracle.negacyclic_mul(digits[b, p], t[p, k]).astype(np.int64)
            np.testing.assert_array_equal(got[b, k], oracle.w32(expected))


def test_poly_mul_batched_small_single_limb(rng):
    n, B, P, K = 32, 2, 6, 2
    digits = rng.integers(-64, 64, size=(B, P, n)).astype(np.int32)
    t = rand_torus(rng, (P, K, n))
    got = np.asarray(
        conv.poly_mul_batched_small(jnp.asarray(digits), jnp.asarray(t), 6)
    )
    for b in range(B):
        for k in range(K):
            expected = np.zeros(n, np.int64)
            for p in range(P):
                expected += oracle.negacyclic_mul(digits[b, p], t[p, k]).astype(np.int64)
            np.testing.assert_array_equal(got[b, k], oracle.w32(expected))


def test_poly_mul_batched_torus_matches_oracle(rng):
    n, B, P = 64, 3, 2
    a = rand_torus(rng, (B, P, n))
    s = rng.integers(0, 2, size=(P, n)).astype(np.int32)
    got = np.asarray(conv.poly_mul_batched_torus(jnp.asarray(a), jnp.asarray(s)))
    for b in range(B):
        expected = np.zeros(n, np.int64)
        for p in range(P):
            expected += oracle.negacyclic_mul(s[p], a[b, p]).astype(np.int64)
        np.testing.assert_array_equal(got[b], oracle.w32(expected))


def test_mul_by_monomial_matches_oracle(rng):
    n = 32
    p = rand_torus(rng, n)
    for shift in [0, 1, 5, n - 1, n, n + 3, 2 * n - 1, 2 * n, -1, -n, -(2 * n) + 1, 3 * n + 2]:
        expected = oracle.mul_by_monomial(p, shift)
        got = np.asarray(polynomial.mul_by_monomial(jnp.asarray(p), shift))
        np.testing.assert_array_equal(got, expected, err_msg=f"shift={shift}")


def test_mul_by_monomial_batched_shifts(rng):
    n, B = 32, 5
    p = rand_torus(rng, (B, n))
    shifts = rng.integers(0, 2 * n, size=B).astype(np.int32)
    got = np.asarray(polynomial.mul_by_monomial(jnp.asarray(p), jnp.asarray(shifts)))
    for b in range(B):
        np.testing.assert_array_equal(got[b], oracle.mul_by_monomial(p[b], shifts[b]))


def test_reverse_polynomial_matches_oracle(rng):
    n = 32
    p = rand_torus(rng, n)
    np.testing.assert_array_equal(
        np.asarray(polynomial.reverse_polynomial(jnp.asarray(p))),
        oracle.reverse_polynomial(p),
    )


def test_negacyclic_identity(rng):
    # x^0 * p == p; x^N/2 twice == -p
    n = 16
    p = rand_torus(rng, n)
    one = np.zeros(n, np.int32)
    one[0] = 1
    np.testing.assert_array_equal(
        np.asarray(conv.negacyclic_mul(jnp.asarray(one), jnp.asarray(p))), p
    )
