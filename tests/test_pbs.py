"""Programmable bootstrapping: LUT evaluation round trips on toy params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import pbs


@pytest.fixture(scope="module")
def toy_keys():
    return tt.make_key_pair(jax.random.PRNGKey(77), tt.tfhe_parameters_toy())


def test_pbs_encoding_roundtrip(toy_keys):
    sk, _ = toy_keys
    msgs = jnp.arange(8, dtype=jnp.int32)
    ct = pbs.encrypt_pbs(jax.random.PRNGKey(0), sk, msgs, 8)
    np.testing.assert_array_equal(
        np.asarray(pbs.decrypt_pbs(sk, ct, 8)), np.arange(8))


def test_pbs_lut_and_chain(toy_keys):
    sk, ck = toy_keys
    S = 4
    rng = np.random.default_rng(3)
    msgs = rng.integers(0, S, 16).astype(np.int32)
    lut_f = rng.integers(0, S, S).astype(np.int32)
    lut_g = rng.integers(0, S, S).astype(np.int32)
    x = pbs.encrypt_pbs(jax.random.PRNGKey(1), sk, jnp.asarray(msgs), S)
    y = pbs.programmable_bootstrap(
        ck.bootstrap_key, ck.keyswitch_key, jnp.asarray(lut_f), x, S)
    np.testing.assert_array_equal(
        np.asarray(pbs.decrypt_pbs(sk, y, S)), lut_f[msgs])
    # outputs carry the same encoding: bootstraps compose, g(f(m))
    z = pbs.programmable_bootstrap(
        ck.bootstrap_key, ck.keyswitch_key, jnp.asarray(lut_g), y, S)
    np.testing.assert_array_equal(
        np.asarray(pbs.decrypt_pbs(sk, z, S)), lut_g[lut_f[msgs]])


def test_pbs_per_sample_tables(toy_keys):
    sk, ck = toy_keys
    S = 4
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, S, 12).astype(np.int32)
    luts = rng.integers(0, S, (12, S)).astype(np.int32)
    x = pbs.encrypt_pbs(jax.random.PRNGKey(2), sk, jnp.asarray(msgs), S)
    y = pbs.programmable_bootstrap(
        ck.bootstrap_key, ck.keyswitch_key, jnp.asarray(luts), x, S)
    np.testing.assert_array_equal(
        np.asarray(pbs.decrypt_pbs(sk, y, S)),
        luts[np.arange(12), msgs])


def test_mk_pbs_lut():
    import tfhe_tpu.mk as mk

    params = mk.mktfhe_parameters_toy(2)
    shared = mk.make_shared_key(jax.random.PRNGKey(100), params)
    sks, parts = [], []
    for p in range(2):
        sk = tt.make_secret_key(jax.random.PRNGKey(200 + p), params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(
            jax.random.PRNGKey(300 + p), sk, shared))
    mck = mk.make_mk_cloud_key(parts)

    S = 4
    rng = np.random.default_rng(9)
    msgs = rng.integers(0, S, 8).astype(np.int32)
    lut = rng.integers(0, S, S).astype(np.int32)
    x = pbs.mk_encrypt_pbs(jax.random.PRNGKey(4), sks, jnp.asarray(msgs), S)
    np.testing.assert_array_equal(
        np.asarray(pbs.mk_decrypt_pbs(sks, x, S)), msgs)
    y = pbs.mk_programmable_bootstrap(
        mck.bootstrap_key, mck.keyswitch_keys, jnp.asarray(lut), x, S)
    np.testing.assert_array_equal(
        np.asarray(pbs.mk_decrypt_pbs(sks, y, S)), lut[msgs])


@pytest.mark.parametrize("q", [2, 4])
def test_many_lut(toy_keys, q):
    """q LUT outputs from ONE blind rotation (PBSmanyLUT) match plain
    table lookups, including per-sample tables."""
    sk, ck = toy_keys
    S = 8
    rng = np.random.default_rng(q)
    msgs = jnp.asarray(rng.integers(0, S, 12).astype(np.int32))
    tables = rng.integers(0, S, (q, S)).astype(np.int32)
    ct = pbs.encrypt_pbs(jax.random.PRNGKey(5), sk, msgs, S)
    out = pbs.programmable_bootstrap_many(
        ck.bootstrap_key, ck.keyswitch_key, jnp.asarray(tables), ct, S, q)
    got = np.asarray(pbs.decrypt_pbs(sk, out, S))  # [12, q]
    want = np.stack([tables[r][np.asarray(msgs)] for r in range(q)], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_many_lut_per_sample_tables(toy_keys):
    sk, ck = toy_keys
    S, q, B = 8, 2, 6
    rng = np.random.default_rng(9)
    msgs = jnp.asarray(rng.integers(0, S, B).astype(np.int32))
    tables = rng.integers(0, S, (B, q, S)).astype(np.int32)
    ct = pbs.encrypt_pbs(jax.random.PRNGKey(6), sk, msgs, S)
    out = pbs.programmable_bootstrap_many(
        ck.bootstrap_key, ck.keyswitch_key, jnp.asarray(tables), ct, S, q)
    got = np.asarray(pbs.decrypt_pbs(sk, out, S))
    m = np.asarray(msgs)
    want = np.stack([tables[np.arange(B), r, m] for r in range(q)], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_many_lut_chains(toy_keys):
    """Many-LUT outputs carry the PBS encoding: they feed another PBS."""
    sk, ck = toy_keys
    S = 8
    msgs = jnp.asarray([0, 3, 5, 7], jnp.int32)
    t0 = np.arange(S)[::-1].copy()  # reverse
    t1 = (np.arange(S) + 1) % S    # increment
    ct = pbs.encrypt_pbs(jax.random.PRNGKey(7), sk, msgs, S)
    out = pbs.programmable_bootstrap_many(
        ck.bootstrap_key, ck.keyswitch_key,
        jnp.asarray(np.stack([t0, t1])), ct, S, 2)
    first = tt.lwe.LweSample(out.a[..., 0, :], out.b[..., 0], out.cv[..., 0])
    dbl = np.minimum(np.arange(S) * 2, S - 1)
    out2 = pbs.programmable_bootstrap(
        ck.bootstrap_key, ck.keyswitch_key, jnp.asarray(dbl), first, S)
    np.testing.assert_array_equal(
        np.asarray(pbs.decrypt_pbs(sk, out2, S)),
        dbl[t0[np.asarray(msgs)]])


def test_mk_many_lut():
    """MK PBSmanyLUT: q tables from one MK blind rotation (toy ceremony)."""
    from tfhe_tpu import mk

    parties, S, q = 2, 8, 2
    params = mk.mktfhe_parameters_toy(max_parties=parties)
    rng = jax.random.PRNGKey(55)
    r_shared, r_enc, *r_parties = jax.random.split(rng, 2 + parties)
    shared = mk.make_shared_key(r_shared, params)
    sks, parts = [], []
    for p in range(parties):
        r_sk, r_part = jax.random.split(r_parties[p])
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))
    ck = mk.make_mk_cloud_key(parts)

    rng_np = np.random.default_rng(3)
    msgs = jnp.asarray(rng_np.integers(0, S, 6).astype(np.int32))
    tables = rng_np.integers(0, S, (q, S)).astype(np.int32)
    ct = pbs.mk_encrypt_pbs(r_enc, sks, msgs, S)
    out = pbs.mk_programmable_bootstrap_many(
        ck.bootstrap_key, ck.keyswitch_keys, jnp.asarray(tables), ct, S, q)
    got = np.asarray(pbs.mk_decrypt_pbs(sks, out, S))
    want = np.stack([tables[r][np.asarray(msgs)] for r in range(q)], axis=-1)
    np.testing.assert_array_equal(got, want)
