"""Seeded (compressed) ciphertexts and keys.

Expansion of the LWE/keyswitch seeded forms must be BIT-identical to the
unseeded generators run with the same rng (same split discipline); the
seeded bootstrap key uses body-side message placement, so its contract is
phase identity per TGSW row plus end-to-end gate correctness. Wire-size
claims are asserted on the serialized artifacts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import compressed
from tfhe_tpu.keyswitch import keyswitch_key_gen
from tfhe_tpu.numeric import rand_uniform_torus32
from tfhe_tpu.ops import conv
from tfhe_tpu.tlwe import extract_lwe_key, tlwe_key_gen
from tfhe_tpu.utils import serialization


@pytest.fixture(scope="module")
def toy_sk():
    params = tt.tfhe_parameters_toy()
    return tt.make_secret_key(jax.random.PRNGKey(11), params)


def test_seeded_lwe_bit_identical(toy_sk):
    rng = jax.random.PRNGKey(42)
    bits = jnp.asarray([True, False, True, True])
    full = tt.encrypt(rng, toy_sk, bits)
    seeded = compressed.encrypt_seeded(rng, toy_sk, bits)
    expanded = compressed.expand_lwe(seeded)
    np.testing.assert_array_equal(np.asarray(expanded.a), np.asarray(full.a))
    np.testing.assert_array_equal(np.asarray(expanded.b), np.asarray(full.b))
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(toy_sk, expanded)), np.asarray(bits))


def test_seeded_lwe_wire_size(toy_sk):
    bits = jnp.asarray([True, False] * 512)
    full = tt.encrypt(jax.random.PRNGKey(1), toy_sk, bits)
    seeded = compressed.encrypt_seeded(jax.random.PRNGKey(1), toy_sk, bits)
    full_bytes = len(serialization.dumps(full))
    seeded_bytes = len(serialization.dumps(seeded))
    # n+1 words -> 1 word; at batch 1024 the manifest overhead is noise.
    assert seeded_bytes * 4 < full_bytes


def test_seeded_keyswitch_key_bit_identical(toy_sk):
    params = toy_sk.params
    rng = jax.random.PRNGKey(7)
    tlwe_key = tlwe_key_gen(
        jax.random.PRNGKey(8), params.tlwe_polynomial_degree,
        params.tlwe_mask_size)
    in_key = extract_lwe_key(tlwe_key)
    full = keyswitch_key_gen(
        rng, params.ks_noise_stddev, in_key, toy_sk.key,
        params.ks_decomp_length, params.ks_log2_base)
    seeded = compressed.keyswitch_key_gen_seeded(
        rng, params.ks_noise_stddev, in_key, toy_sk.key,
        params.ks_decomp_length, params.ks_log2_base)
    expanded = compressed.expand_keyswitch_key(seeded)
    np.testing.assert_array_equal(
        np.asarray(expanded.table_limbs), np.asarray(full.table_limbs))
    assert expanded.noise_stddev == full.noise_stddev


def test_seeded_bootstrap_key_row_phases(toy_sk):
    """Every expanded TGSW row's phase equals noise + its message term:
    -m*g_i*s_j for mask rows, +m*g_i (constant) for the body row."""
    params = toy_sk.params
    l, b = params.bs_decomp_length, params.bs_log2_base
    tlwe_key = tlwe_key_gen(
        jax.random.PRNGKey(9), params.tlwe_polynomial_degree,
        params.tlwe_mask_size)
    seeded = compressed.bootstrap_key_gen_seeded(
        jax.random.PRNGKey(10), params.bs_noise_stddev, toy_sk.key, tlwe_key,
        l, b)
    n_poly = params.tlwe_polynomial_degree
    k = params.tlwe_mask_size
    a_part = rand_uniform_torus32(
        compressed._seed_key(seeded.seed),
        (toy_sk.key.shape[0], l, k + 1, k, n_poly))
    # phase of row (bit, i, j) = body - sum_c conv(a_c, s_c)
    mask_dot = conv.poly_mul_batched_torus(
        a_part.reshape(-1, k, n_poly), tlwe_key
    ).reshape(a_part.shape[0], l, k + 1, n_poly)
    phases = seeded.body - mask_dot
    from tfhe_tpu.tgsw import gadget_values
    g = np.asarray(gadget_values(l, b))
    m = np.asarray(toy_sk.key)
    want = np.zeros(phases.shape, np.int32)
    for j in range(k):  # mask rows: -m*g_i*s_j (full polynomial)
        want[:, :, j, :] = (
            -(m[:, None, None] * g[None, :, None]) * np.asarray(tlwe_key)[j]
        ).astype(np.int32)
    want[:, :, k, 0] = (m[:, None] * g[None, :]).astype(np.int32)  # body row
    err = (np.asarray(phases).astype(np.int64)
           - want.astype(np.int64)).astype(np.int32)
    # residual is just the fresh Gaussian noise: tiny vs the torus
    bound = int(params.bs_noise_stddev * 2**32 * 8) + 1
    assert np.abs(err.astype(np.int64)).max() < bound


def test_seeded_cloud_key_gates(toy_sk):
    """NAND truth table through a fully expanded seeded cloud key."""
    seeded = compressed.make_seeded_cloud_key(jax.random.PRNGKey(12), toy_sk)
    ck = compressed.expand_cloud_key(seeded)
    rng = jax.random.PRNGKey(13)
    for x in (False, True):
        for y in (False, True):
            rng, k1, k2 = jax.random.split(rng, 3)
            cx = tt.encrypt(k1, toy_sk, jnp.asarray([x]))
            cy = tt.encrypt(k2, toy_sk, jnp.asarray([y]))
            out = tt.decrypt(toy_sk, tt.gate_nand(ck, cx, cy))
            assert bool(np.asarray(out)[0]) == (not (x and y))


def test_seeded_cloud_key_wire_size(toy_sk):
    seeded = compressed.make_seeded_cloud_key(jax.random.PRNGKey(12), toy_sk)
    ck = compressed.expand_cloud_key(seeded)
    seeded_bytes = len(serialization.dumps(seeded))
    full_bytes = len(serialization.dumps(ck))
    assert seeded_bytes * 4 < full_bytes


def test_seeded_serialization_roundtrip(toy_sk):
    seeded = compressed.make_seeded_cloud_key(jax.random.PRNGKey(12), toy_sk)
    back = serialization.loads(serialization.dumps(seeded))
    np.testing.assert_array_equal(
        np.asarray(back.bootstrap_key.body),
        np.asarray(seeded.bootstrap_key.body))
    np.testing.assert_array_equal(
        np.asarray(back.keyswitch_key.b), np.asarray(seeded.keyswitch_key.b))
    # expansion of the deserialized artifact matches the original's
    np.testing.assert_array_equal(
        np.asarray(compressed.expand_keyswitch_key(back.keyswitch_key)
                   .table_limbs),
        np.asarray(compressed.expand_keyswitch_key(seeded.keyswitch_key)
                   .table_limbs))
    bits = jnp.asarray([False, True])
    s = compressed.encrypt_seeded(jax.random.PRNGKey(3), toy_sk, bits)
    s2 = serialization.loads(serialization.dumps(s))
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(toy_sk, compressed.expand_lwe(s2))),
        np.asarray(bits))


@pytest.mark.slow
def test_seeded_cloud_key_production_80bit():
    """80-bit preset: the seeded evaluation key expands to a working
    CloudKey and ships at a fraction of the expanded wire size."""
    params = tt.tfhe_parameters_80()
    sk = tt.make_secret_key(jax.random.PRNGKey(20), params)
    seeded = compressed.make_seeded_cloud_key(jax.random.PRNGKey(21), sk)
    seeded_bytes = len(serialization.dumps(seeded))
    # bodies only: n*l*(k+1)*N + (B-1)*l*1024 words + seeds
    assert seeded_bytes < 20 * 2**20
    ck = compressed.expand_cloud_key(seeded)
    rng = jax.random.PRNGKey(22)
    for x in (False, True):
        for y in (False, True):
            rng, k1, k2 = jax.random.split(rng, 3)
            cx = tt.encrypt(k1, sk, jnp.asarray([x]))
            cy = tt.encrypt(k2, sk, jnp.asarray([y]))
            out = tt.decrypt(sk, tt.gate_nand(ck, cx, cy))
            assert bool(np.asarray(out)[0]) == (not (x and y))


def test_seeded_mk_ceremony_bit_identical():
    """Seeded SharedKey/CloudKeyPart expand bit-identically to the unseeded
    ceremony run with the same rngs, and the assembled MK cloud key
    round-trips a NAND truth table."""
    from tfhe_tpu import mk

    parties = 2
    params = mk.mktfhe_parameters_toy(max_parties=parties)
    rng = jax.random.PRNGKey(42)
    r_shared, r_enc, *r_parties = jax.random.split(rng, 2 + parties)

    shared_full = mk.make_shared_key(r_shared, params)
    shared_seeded = compressed.make_shared_key_seeded(r_shared, params)
    shared = compressed.expand_shared_key(
        serialization.loads(serialization.dumps(shared_seeded)))
    np.testing.assert_array_equal(np.asarray(shared.a),
                                  np.asarray(shared_full.a))

    sks, parts = [], []
    for p in range(parties):
        r_sk, r_part = jax.random.split(r_parties[p])
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        full_part = mk.make_cloud_key_part(r_part, sk, shared)
        seeded_part = compressed.make_seeded_cloud_key_part(r_part, sk, shared)
        part = compressed.expand_cloud_key_part(
            serialization.loads(serialization.dumps(seeded_part)))
        np.testing.assert_array_equal(
            np.asarray(part.key_uni_enc.cd),
            np.asarray(full_part.key_uni_enc.cd))
        np.testing.assert_array_equal(
            np.asarray(part.public_key), np.asarray(full_part.public_key))
        np.testing.assert_array_equal(
            np.asarray(part.keyswitch_key.table_limbs),
            np.asarray(full_part.keyswitch_key.table_limbs))
        # wire size: 2 of 6 uni-enc rows + the whole keyswitch table elided
        assert (len(serialization.dumps(seeded_part)) * 2
                < len(serialization.dumps(full_part)))
        parts.append(part)

    ck = mk.make_mk_cloud_key(parts)
    xs = jnp.asarray([False, True], bool)
    ys = jnp.asarray([True, True], bool)
    r1, r2 = jax.random.split(r_enc)
    ct_x = mk.mk_encrypt(r1, sks, xs)
    ct_y = mk.mk_encrypt(r2, sks, ys)
    out = mk.mk_gate_nand(ck, ct_x, ct_y)
    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, out)), [True, False])


@pytest.mark.parametrize("bits", [8, 16])
def test_modswitch_compression_roundtrip(toy_sk, bits):
    """Gate-style ciphertexts survive modulus-switch compression: the
    rounding noise is far inside the decryption margin, the artifact
    really shrinks, and the honest cv grows by the model amount."""
    sk = toy_sk
    msgs = jnp.asarray([True, False] * 32)
    ct = tt.encrypt(jax.random.PRNGKey(90), sk, msgs)
    c = compressed.compress_lwe(ct, bits)
    back = compressed.decompress_lwe(
        serialization.loads(serialization.dumps(c)))
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(sk, back)), np.asarray(msgs))
    full_bytes = len(serialization.dumps(ct))
    small_bytes = len(serialization.dumps(c))
    assert small_bytes < full_bytes * (bits / 32) * 1.3 + 2000
    assert float(np.asarray(c.cv)[0]) > float(np.asarray(ct.cv)[0])


def test_modswitch_32bit_identity(toy_sk):
    ct = tt.encrypt(jax.random.PRNGKey(91), toy_sk, jnp.asarray([True]))
    back = compressed.decompress_lwe(compressed.compress_lwe(ct, 32))
    np.testing.assert_array_equal(np.asarray(back.a), np.asarray(ct.a))
    np.testing.assert_array_equal(np.asarray(back.b), np.asarray(ct.b))
