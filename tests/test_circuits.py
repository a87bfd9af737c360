"""Encrypted integer circuits: adder + minimum round trips on toy params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import circuits


@pytest.fixture(scope="module")
def toy_keys():
    return tt.make_key_pair(jax.random.PRNGKey(123), tt.tfhe_parameters_toy())


def test_word_encrypt_roundtrip(toy_keys):
    sk, _ = toy_keys
    vals = jnp.asarray([0, 1, 200, 255], jnp.uint32)
    ct = circuits.encrypt_word(jax.random.PRNGKey(0), sk, vals, 8)
    got = np.asarray(circuits.decrypt_word(sk, ct))
    np.testing.assert_array_equal(got, [0, 1, 200, 255])


def test_ripple_carry_add(toy_keys):
    sk, ck = toy_keys
    a_vals = np.asarray([3, 120, 255, 77], np.uint32)
    b_vals = np.asarray([5, 200, 1, 178], np.uint32)
    a = circuits.encrypt_word(jax.random.PRNGKey(1), sk, a_vals, 8)
    b = circuits.encrypt_word(jax.random.PRNGKey(2), sk, b_vals, 8)
    out = circuits.ripple_carry_add(ck, a, b)
    got = np.asarray(circuits.decrypt_word(sk, out))
    np.testing.assert_array_equal(got, (a_vals + b_vals) % 256)


def test_encrypted_minimum(toy_keys):
    """Tutorial-parity circuit (reference: examples/tutorial.jl, 2017 vs 42)."""
    sk, ck = toy_keys
    a_vals = np.asarray([2017, 42], np.uint32)
    b_vals = np.asarray([42, 2017], np.uint32)
    a = circuits.encrypt_word(jax.random.PRNGKey(3), sk, a_vals, 16)
    b = circuits.encrypt_word(jax.random.PRNGKey(4), sk, b_vals, 16)
    out = circuits.encrypted_minimum(ck, a, b)
    got = np.asarray(circuits.decrypt_word(sk, out))
    np.testing.assert_array_equal(got, [42, 42])


def test_ripple_carry_sub(toy_keys):
    sk, ck = toy_keys
    a_vals = np.asarray([5, 120, 0, 178], np.uint32)
    b_vals = np.asarray([3, 200, 1, 178], np.uint32)
    a = circuits.encrypt_word(jax.random.PRNGKey(5), sk, a_vals, 8)
    b = circuits.encrypt_word(jax.random.PRNGKey(6), sk, b_vals, 8)
    out = circuits.ripple_carry_sub(ck, a, b)
    got = np.asarray(circuits.decrypt_word(sk, out))
    np.testing.assert_array_equal(got, (a_vals - b_vals) % 256)


def test_multiply(toy_keys):
    sk, ck = toy_keys
    a_vals = np.asarray([3, 7, 15, 0], np.uint32)
    b_vals = np.asarray([5, 11, 15, 9], np.uint32)
    a = circuits.encrypt_word(jax.random.PRNGKey(7), sk, a_vals, 4)
    b = circuits.encrypt_word(jax.random.PRNGKey(8), sk, b_vals, 4)
    out = circuits.multiply(ck, a, b)
    got = np.asarray(circuits.decrypt_word(sk, out))
    np.testing.assert_array_equal(got, (a_vals * b_vals) % 16)


def test_encrypted_equal(toy_keys):
    sk, ck = toy_keys
    a_vals = np.asarray([9, 200, 0, 31], np.uint32)
    b_vals = np.asarray([9, 201, 0, 15], np.uint32)
    # 5 bits: odd width exercises the AND-tree's leftover-bit path
    a = circuits.encrypt_word(jax.random.PRNGKey(9), sk, a_vals % 32, 5)
    b = circuits.encrypt_word(jax.random.PRNGKey(10), sk, b_vals % 32, 5)
    out = circuits.encrypted_equal(ck, a, b)
    got = np.asarray(tt.decrypt(sk, out))
    np.testing.assert_array_equal(got, (a_vals % 32) == (b_vals % 32))


def test_divide(toy_keys):
    sk, ck = toy_keys
    n_vals = np.asarray([13, 7, 15, 4], np.uint32)
    d_vals = np.asarray([3, 7, 4, 5], np.uint32)
    n = circuits.encrypt_word(jax.random.PRNGKey(11), sk, n_vals, 4)
    d = circuits.encrypt_word(jax.random.PRNGKey(12), sk, d_vals, 4)
    q, r = circuits.divide(ck, n, d)
    np.testing.assert_array_equal(
        np.asarray(circuits.decrypt_word(sk, q)), n_vals // d_vals)
    np.testing.assert_array_equal(
        np.asarray(circuits.decrypt_word(sk, r)), n_vals % d_vals)


def test_greater_than_and_maximum(toy_keys):
    sk, ck = toy_keys
    a_vals = np.asarray([3, 9, 9, 15], np.uint32)
    b_vals = np.asarray([9, 3, 9, 0], np.uint32)
    a = circuits.encrypt_word(jax.random.PRNGKey(13), sk, a_vals, 4)
    b = circuits.encrypt_word(jax.random.PRNGKey(14), sk, b_vals, 4)
    gt = np.asarray(tt.decrypt(sk, circuits.encrypted_greater_than(ck, a, b)))
    np.testing.assert_array_equal(gt, a_vals > b_vals)
    mx = np.asarray(circuits.decrypt_word(
        sk, circuits.encrypted_maximum(ck, a, b)))
    np.testing.assert_array_equal(mx, np.maximum(a_vals, b_vals))
