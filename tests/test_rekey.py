"""Proxy re-encryption: old-key ciphertexts re-addressed to a new key."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import rekey
from tfhe_tpu.utils import serialization
from tfhe_tpu.compressed import expand_keyswitch_key


@pytest.fixture(scope="module")
def two_users():
    params = tt.tfhe_parameters_toy()
    sk_old = tt.make_secret_key(jax.random.PRNGKey(40), params)
    sk_new, ck_new = tt.make_key_pair(jax.random.PRNGKey(41), params)
    return sk_old, sk_new, ck_new


def test_rekey_roundtrip(two_users):
    sk_old, sk_new, _ = two_users
    kk = rekey.make_rekey_key(jax.random.PRNGKey(42), sk_old, sk_new)
    bits = jnp.asarray([True, False, True, True, False])
    ct = tt.encrypt(jax.random.PRNGKey(43), sk_old, bits)
    moved = rekey.rekey(kk, ct)
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(sk_new, moved)), np.asarray(bits))


def test_rekeyed_ciphertexts_feed_gates(two_users):
    """Re-keyed ciphertexts run through the NEW user's cloud key."""
    sk_old, sk_new, ck_new = two_users
    kk = rekey.make_rekey_key(jax.random.PRNGKey(44), sk_old, sk_new)
    for x in (False, True):
        for y in (False, True):
            cx = rekey.rekey(kk, tt.encrypt(
                jax.random.PRNGKey(45 + 2 * x + y), sk_old, jnp.asarray([x])))
            cy = tt.encrypt(jax.random.PRNGKey(49 + 2 * x + y), sk_new,
                            jnp.asarray([y]))
            out = tt.decrypt(sk_new, tt.gate_nand(ck_new, cx, cy))
            assert bool(np.asarray(out)[0]) == (not (x and y))


def test_rekey_key_seeded_bit_identical(two_users):
    sk_old, sk_new, _ = two_users
    rng = jax.random.PRNGKey(50)
    full = rekey.make_rekey_key(rng, sk_old, sk_new)
    seeded = rekey.make_rekey_key_seeded(rng, sk_old, sk_new)
    expanded = expand_keyswitch_key(
        serialization.loads(serialization.dumps(seeded)))
    np.testing.assert_array_equal(
        np.asarray(expanded.table_limbs), np.asarray(full.table_limbs))
