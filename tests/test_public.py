"""Public-key LWE encryption: round trips, gate compatibility, noise, and
the seeded wire form."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import public
from tfhe_tpu.utils import serialization
from tfhe_tpu.utils.telemetry import noise_margin


@pytest.fixture(scope="module")
def keys():
    params = tt.tfhe_parameters_toy()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(31), params)
    pk = public.make_public_key(jax.random.PRNGKey(32), sk)
    return sk, ck, pk


def test_public_encrypt_roundtrip(keys):
    sk, _, pk = keys
    bits = jnp.asarray([True, False, True, True, False, False, True, False])
    ct = public.encrypt_public(jax.random.PRNGKey(33), pk, bits)
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(sk, ct)), np.asarray(bits))


def test_public_encrypt_noise_within_model(keys):
    """Measured phase error stays within ~4 sigma of the subset-sum model
    cv = (M/2) * alpha^2 — and inside the gate contract's 1/16 margin."""
    sk, _, pk = keys
    bits = jnp.asarray([True, False] * 64)
    ct = public.encrypt_public(jax.random.PRNGKey(34), pk, bits)
    report = noise_margin(sk, ct, expected=bits)
    assert report.failures == 0
    sigma = float(np.sqrt(np.asarray(ct.cv)[0]))
    assert report.max_error < max(6 * sigma, 1.0 / 16)


def test_public_ciphertexts_feed_gates(keys):
    sk, ck, pk = keys
    rng = jax.random.PRNGKey(35)
    for x in (False, True):
        for y in (False, True):
            rng, k1, k2 = jax.random.split(rng, 3)
            cx = public.encrypt_public(k1, pk, jnp.asarray([x]))
            cy = public.encrypt_public(k2, pk, jnp.asarray([y]))
            out = tt.decrypt(sk, tt.gate_nand(ck, cx, cy))
            assert bool(np.asarray(out)[0]) == (not (x and y))


def test_seeded_public_key_bit_identical(keys):
    sk, _, _ = keys
    rng = jax.random.PRNGKey(36)
    full = public.make_public_key(rng, sk, count=512)
    seeded = public.make_public_key_seeded(rng, sk, count=512)
    expanded = public.expand_public_key(
        serialization.loads(serialization.dumps(seeded)))
    np.testing.assert_array_equal(
        np.asarray(expanded.zeros.a), np.asarray(full.zeros.a))
    np.testing.assert_array_equal(
        np.asarray(expanded.zeros.b), np.asarray(full.zeros.b))
    # wire: M*(n+1) words -> M words
    assert (len(serialization.dumps(seeded)) * 4
            < len(serialization.dumps(full)))


def test_default_count_lhl(keys):
    sk, _, pk = keys
    assert pk.count == (sk.params.lwe_size + 1) * 32 + 256
