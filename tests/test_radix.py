"""Radix integer arithmetic: decrypt-level round trips on toy params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import radix
from tfhe_tpu.lwe import LweSample


@pytest.fixture(scope="module")
def toy_keys():
    return tt.make_key_pair(jax.random.PRNGKey(88), tt.tfhe_parameters_toy())


def test_radix_roundtrip(toy_keys):
    sk, _ = toy_keys
    vals = jnp.arange(16, dtype=jnp.int32) * 17 % 256
    ct = radix.encrypt_radix(jax.random.PRNGKey(0), sk, vals, 8)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, ct)), np.asarray(vals))


def test_radix_add(toy_keys):
    sk, ck = toy_keys
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, 12).astype(np.int32)
    b = rng.integers(0, 256, 12).astype(np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(1), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(2), sk, jnp.asarray(b), 8)
    out = radix.radix_add(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, out)), (a + b) % 256)


def test_radix_add_carry_chain(toy_keys):
    # all-carries worst case: 0xFF + 1 wraps through every digit
    sk, ck = toy_keys
    a = jnp.asarray([255, 255, 170], jnp.int32)
    b = jnp.asarray([1, 255, 85], jnp.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(3), sk, a, 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(4), sk, b, 8)
    out = radix.radix_add(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, out)), [0, 254, 255])


def test_radix_scalar_add(toy_keys):
    sk, ck = toy_keys
    a = jnp.asarray([3, 200, 255], jnp.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(5), sk, a, 8)
    out = radix.radix_scalar_add(ck, xa, 77)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, out)), (np.asarray(a) + 77) % 256)


def test_radix_sub_and_geq(toy_keys):
    sk, ck = toy_keys
    rng = np.random.default_rng(6)
    a = rng.integers(0, 256, 10).astype(np.int32)
    b = rng.integers(0, 256, 10).astype(np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(6), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(7), sk, jnp.asarray(b), 8)
    out = radix.radix_sub(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, out)), (a - b) % 256)
    geq = radix.radix_geq(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(tt.pbs.decrypt_pbs(sk, geq, radix.SPACE)),
        (a >= b).astype(np.int64))


def test_radix_eq(toy_keys):
    sk, ck = toy_keys
    a = np.asarray([5, 129, 200, 255, 0, 77], np.int32)
    b = np.asarray([5, 130, 200, 0, 0, 78], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(8), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(9), sk, jnp.asarray(b), 8)
    eq = radix.radix_eq(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(tt.pbs.decrypt_pbs(sk, eq, radix.SPACE)),
        (a == b).astype(np.int64))


def test_radix_wide_eq(toy_keys):
    # 32-bit words: 16 digits exercises the log-tree flag collapse
    sk, ck = toy_keys
    a = np.asarray([0x12345678, 0xDEADBEEF], np.int64).astype(np.int32)
    b = np.asarray([0x12345678, 0xDEADBEE0], np.int64).astype(np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(10), sk, jnp.asarray(a), 32)
    xb = radix.encrypt_radix(jax.random.PRNGKey(11), sk, jnp.asarray(b), 32)
    eq = radix.radix_eq(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(tt.pbs.decrypt_pbs(sk, eq, radix.SPACE)), [1, 0])


def test_radix_min_max(toy_keys):
    sk, ck = toy_keys
    rng = np.random.default_rng(12)
    a = rng.integers(0, 256, 8).astype(np.int32)
    b = rng.integers(0, 256, 8).astype(np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(20), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(21), sk, jnp.asarray(b), 8)
    mn = radix.radix_min(ck, xa, xb)
    mx = radix.radix_max(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, mn)), np.minimum(a, b))
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, mx)), np.maximum(a, b))


def test_radix_select_equal_words(toy_keys):
    # a == b: either branch must reproduce the value exactly
    sk, ck = toy_keys
    a = jnp.asarray([42, 0, 255], jnp.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(22), sk, a, 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(23), sk, a, 8)
    mn = radix.radix_min(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, mn)), np.asarray(a))


def test_radix_mul(toy_keys):
    sk, ck = toy_keys
    rng = np.random.default_rng(13)
    a = rng.integers(0, 256, 6).astype(np.int32)
    b = rng.integers(0, 256, 6).astype(np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(30), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(31), sk, jnp.asarray(b), 8)
    prod = radix.radix_mul(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, prod)), (a * b) % 256)


def test_radix_mul_edges(toy_keys):
    sk, ck = toy_keys
    a = np.asarray([0, 1, 255, 255, 85], np.int32)
    b = np.asarray([255, 255, 255, 0, 85], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(32), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(33), sk, jnp.asarray(b), 8)
    prod = radix.radix_mul(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, prod)), (a * b) % 256)


def test_radix_divide(toy_keys):
    sk, ck = toy_keys
    a = np.asarray([200, 13, 255, 81, 7], np.int32)
    b = np.asarray([7, 250, 1, 9, 200], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(40), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(41), sk, jnp.asarray(b), 8)
    q, r = radix.radix_divide(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, q)), a // b)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, r)), a % b)


def test_radix_divide_by_zero(toy_keys):
    sk, ck = toy_keys
    a = np.asarray([42], np.int32)
    b = np.asarray([0], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(42), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(43), sk, jnp.asarray(b), 8)
    q, r = radix.radix_divide(ck, xa, xb)
    np.testing.assert_array_equal(np.asarray(radix.decrypt_radix(sk, q)), [255])
    np.testing.assert_array_equal(np.asarray(radix.decrypt_radix(sk, r)), [42])


def test_radix_bitwise(toy_keys):
    sk, ck = toy_keys
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, 10).astype(np.int32)
    b = rng.integers(0, 256, 10).astype(np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(61), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(62), sk, jnp.asarray(b), 8)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, radix.radix_and(ck, xa, xb))),
        a & b)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, radix.radix_or(ck, xa, xb))),
        a | b)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, radix.radix_xor(ck, xa, xb))),
        a ^ b)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, radix.radix_not(xa))),
        (~a) & 255)


def test_radix_bitwise_chains(toy_keys):
    """Bitwise outputs (sqrt(2) x fresh noise) still feed the add chain."""
    sk, ck = toy_keys
    a = np.asarray([0b10110100, 0b01011011], np.int32)
    b = np.asarray([0b11001010, 0b00111100], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(63), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(64), sk, jnp.asarray(b), 8)
    got = radix.radix_add(ck, radix.radix_xor(ck, xa, xb),
                          radix.radix_and(ck, xa, xb))
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, got)),
        ((a ^ b) + (a & b)) % 256)


@pytest.mark.parametrize("k", [0, 1, 2, 3, 5, 8])
def test_radix_shifts(toy_keys, k):
    sk, ck = toy_keys
    vals = np.asarray([0b11011001, 0b00100111, 255, 1], np.int32)
    ct = radix.encrypt_radix(jax.random.PRNGKey(65), sk, jnp.asarray(vals), 8)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, radix.radix_shift_left(ck, ct, k))),
        (vals << k) % 256)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, radix.radix_shift_right(ck, ct, k))),
        vals >> k)


def test_radix_signed_roundtrip(toy_keys):
    sk, _ = toy_keys
    vals = jnp.asarray([-128, -1, 0, 1, 127, -77], jnp.int32)
    ct = radix.encrypt_radix_signed(jax.random.PRNGKey(70), sk, vals, 8)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix_signed(sk, ct)), np.asarray(vals))


def test_radix_signed_arith_shared_with_unsigned(toy_keys):
    """add/sub are sign-agnostic mod 2^bits: signed views decode right."""
    sk, ck = toy_keys
    a = np.asarray([-100, 57, -3], np.int32)
    b = np.asarray([49, -90, -4], np.int32)
    xa = radix.encrypt_radix_signed(jax.random.PRNGKey(71), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix_signed(jax.random.PRNGKey(72), sk, jnp.asarray(b), 8)
    got = radix.decrypt_radix_signed(sk, radix.radix_add(ck, xa, xb))
    want = ((a + b + 128) % 256 - 128).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(got), want)
    got = radix.decrypt_radix_signed(sk, radix.radix_sub(ck, xa, xb))
    want = ((a - b + 128) % 256 - 128).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_radix_signed_compare_minmax(toy_keys):
    sk, ck = toy_keys
    a = np.asarray([-100, 57, -3, 5], np.int32)
    b = np.asarray([49, -90, -4, 5], np.int32)
    xa = radix.encrypt_radix_signed(jax.random.PRNGKey(73), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix_signed(jax.random.PRNGKey(74), sk, jnp.asarray(b), 8)
    geq = radix.radix_geq_signed(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, LweSample(
            geq.a[..., None, :], geq.b[..., None], geq.cv[..., None]))),
        (a >= b).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix_signed(
            sk, radix.radix_min_signed(ck, xa, xb))), np.minimum(a, b))
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix_signed(
            sk, radix.radix_max_signed(ck, xa, xb))), np.maximum(a, b))


def test_radix_neg_abs(toy_keys):
    sk, ck = toy_keys
    vals = np.asarray([-128, -77, -1, 0, 1, 100], np.int32)
    ct = radix.encrypt_radix_signed(jax.random.PRNGKey(75), sk,
                                    jnp.asarray(vals), 8)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix_signed(sk, radix.radix_neg(ck, ct))),
        ((-vals + 128) % 256 - 128).astype(np.int32))
    want_abs = np.abs(vals).astype(np.int32)
    want_abs[vals == -128] = -128  # hardware two's-complement edge
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix_signed(sk, radix.radix_abs(ck, ct))),
        want_abs)


@pytest.mark.parametrize("k", [1, 2, 3, 7])
def test_radix_shift_right_arith(toy_keys, k):
    sk, ck = toy_keys
    vals = np.asarray([-128, -37, -1, 0, 1, 100], np.int32)
    ct = radix.encrypt_radix_signed(jax.random.PRNGKey(76), sk,
                                    jnp.asarray(vals), 8)
    got = radix.decrypt_radix_signed(sk, radix.radix_shift_right_arith(ck, ct, k))
    np.testing.assert_array_equal(np.asarray(got), vals >> k)


def test_radix_add_manylut_vs_stacked(toy_keys, monkeypatch):
    """The many-LUT carry chain and the stacked two-rotation chain agree
    at the decrypt level (they differ only in modulus-switch granularity)."""
    sk, ck = toy_keys
    a = np.asarray([201, 255, 17], np.int32)
    b = np.asarray([56, 1, 239], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(80), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(81), sk, jnp.asarray(b), 8)
    fast = radix.radix_add(ck, xa, xb)
    monkeypatch.setenv("TFHE_TPU_RADIX_MANYLUT", "0")
    slow = radix.radix_add(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, fast)), (a + b) % 256)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, slow)), (a + b) % 256)
