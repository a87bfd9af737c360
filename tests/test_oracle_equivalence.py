"""Bit-exactness of every framework layer against the NumPy executable spec.

Strategy (SURVEY.md section 4): the reference's MersenneTwister stream cannot
be reproduced under jax.random, so bit-exactness is established on the
deterministic cores by injecting identical random draws into both the oracle
(spec/oracle.py — exact int32 semantics of reference src/) and the JAX
framework, comparing ciphertext words. Checkpoints in dependency order:
decompose -> extern_mul -> mux_rotate -> blind_rotate -> extract ->
keyswitch -> full bootstrap. Sizes are small (the arithmetic is exact at
every size, so equality here transfers to the production presets).
"""

import numpy as np
import pytest

import spec.oracle as oracle

import tfhe_tpu as tt
import tfhe_tpu.bootstrap as bs
import tfhe_tpu.keyswitch as ksw
import tfhe_tpu.lwe as lwe_mod
import tfhe_tpu.tgsw as tgsw_mod
import tfhe_tpu.tlwe as tlwe_mod

N = 64
K = 1  # tlwe mask size
L = 3  # bs decomp length
B = 7  # bs log2 base
N_LWE = 16
KS_L = 8
KS_B = 2


def rand_t32(rng, shape):
    return rng.integers(-(2**31), 2**31, size=shape, dtype=np.int64).astype(np.int32)


def test_decompose_matches_oracle(rng):
    polys = rand_t32(rng, (5, N))
    got = np.asarray(tt.decompose(polys, L, B))
    for i, p in enumerate(polys):
        want = oracle.decompose(p, L, B)
        np.testing.assert_array_equal(got[i], want)
    # Reconstruction invariant: sum_j digit_j * gadget_j ==
    # trunc_{l*b bits}(p + offset) - offset  (exactly, mod 2^32)
    g = np.asarray(oracle.gadget_values(L, B), np.int64)
    recon = oracle.w32((got.astype(np.int64) * g[None, :, None]).sum(axis=1))
    mask_bits = 32 - L * B
    offset = np.int64(oracle.decomp_offset(L, B))
    shifted = oracle.w32(polys.astype(np.int64) + offset).astype(np.int64)
    rounded = oracle.w32((shifted & ~((1 << mask_bits) - 1)) - offset)
    np.testing.assert_array_equal(recon, rounded)


def test_decompose_of_zero_is_zero():
    got = np.asarray(tt.decompose(np.zeros((N,), np.int32), L, B))
    np.testing.assert_array_equal(got, 0)


def test_gadget_and_offset_match_oracle():
    np.testing.assert_array_equal(
        np.asarray(tt.gadget_values(L, B)), oracle.gadget_values(L, B)
    )
    assert tgsw_mod.decomp_offset(L, B) == int(oracle.decomp_offset(L, B))
    # The 80-bit preset's larger base too
    np.testing.assert_array_equal(
        np.asarray(tt.gadget_values(2, 10)), oracle.gadget_values(2, 10)
    )
    assert tgsw_mod.decomp_offset(2, 10) == int(oracle.decomp_offset(2, 10))


def test_add_gadget_times_message_matches_oracle(rng):
    samples = rand_t32(rng, (L, K + 1, K + 1, N))
    msg = 1
    got = np.asarray(tgsw_mod.tgsw_add_gadget_times_message(samples, msg, L, B))
    want = oracle.tgsw_add_gadget_times_message(samples, msg, L, B)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("l,b", [(L, B), (2, 10)])
def test_extern_mul_matches_oracle(rng, l, b):
    accum = rand_t32(rng, (3, K + 1, N))
    gsw = rand_t32(rng, (l, K + 1, K + 1, N))
    acc = tlwe_mod.TLweSample(accum, np.zeros(3, np.float32))
    got = np.asarray(tgsw_mod.tgsw_extern_mul(acc, gsw, l, b).a)
    for i in range(3):
        want = oracle.tgsw_extern_mul(accum[i], gsw, l, b)
        np.testing.assert_array_equal(got[i], want)


def test_mux_rotate_matches_oracle(rng):
    accum = rand_t32(rng, (2, K + 1, N))
    gsw = rand_t32(rng, (L, K + 1, K + 1, N))
    barai = np.array([37, 0], np.int32)  # includes the zero (no-op) case
    limbs = tgsw_mod.prepare_tgsw(gsw, L, B)
    acc = tlwe_mod.TLweSample(accum, np.zeros(2, np.float32))
    got = np.asarray(bs.mux_rotate(acc, limbs, barai, L, B).a)
    for i in range(2):
        want = oracle.mux_rotate(accum[i], gsw, int(barai[i]), L, B)
        np.testing.assert_array_equal(got[i], want)


def test_blind_rotate_matches_oracle(rng):
    bk_raw = rand_t32(rng, (N_LWE, L, K + 1, K + 1, N))
    bara = rng.integers(0, 2 * N, size=(2, N_LWE)).astype(np.int32)
    bara[1, ::3] = 0  # exercise the branchless no-op path
    accum0 = rand_t32(rng, (2, K + 1, N))
    bk = bs.bootstrap_key_from_raw(bk_raw, L, B)
    acc = tlwe_mod.TLweSample(accum0, np.zeros(2, np.float32))
    got = np.asarray(bs.blind_rotate(acc, bk, bara).a)
    for i in range(2):
        want = oracle.blind_rotate(accum0[i], bk_raw, bara[i], L, B)
        np.testing.assert_array_equal(got[i], want)


def test_extract_sample_matches_oracle(rng):
    samples = rand_t32(rng, (3, K + 1, N))
    got = tlwe_mod.tlwe_extract_sample(
        tlwe_mod.TLweSample(samples, np.zeros(3, np.float32))
    )
    for i in range(3):
        a, b = oracle.tlwe_extract_sample(samples[i])
        np.testing.assert_array_equal(np.asarray(got.a)[i], a)
        assert int(np.asarray(got.b)[i]) == int(b)


def _random_ks_table(rng, n_in, n_out):
    base = 1 << KS_B
    ks_a = rand_t32(rng, (base - 1, KS_L, n_in, n_out))
    ks_b = rand_t32(rng, (base - 1, KS_L, n_in))
    return ks_a, ks_b


def test_keyswitch_matches_oracle(rng):
    n_in, n_out = K * N, N_LWE
    ks_a, ks_b = _random_ks_table(rng, n_in, n_out)
    key = ksw.KeyswitchKey(
        ksw.prepare_keyswitch_table(ks_a, ks_b, n_out), n_in, n_out, KS_L, KS_B
    )
    sample_a = rand_t32(rng, (3, n_in))
    sample_b = rand_t32(rng, (3,))
    got = ksw.keyswitch(
        key, lwe_mod.LweSample(sample_a, sample_b, np.zeros(3, np.float32))
    )
    for i in range(3):
        a_want, b_want = oracle.keyswitch(
            ks_a, ks_b, sample_a[i], sample_b[i], KS_L, KS_B
        )
        np.testing.assert_array_equal(np.asarray(got.a)[i], a_want)
        assert int(np.asarray(got.b)[i]) == int(b_want)


def test_full_bootstrap_matches_oracle(rng):
    """End-to-end: modulus switch -> blind rotate -> extract -> keyswitch."""
    bk_raw = rand_t32(rng, (N_LWE, L, K + 1, K + 1, N))
    bk = bs.bootstrap_key_from_raw(bk_raw, L, B)
    ks_a, ks_b = _random_ks_table(rng, K * N, N_LWE)
    key = ksw.KeyswitchKey(
        ksw.prepare_keyswitch_table(ks_a, ks_b, N_LWE), K * N, N_LWE, KS_L, KS_B
    )
    mu = oracle.encode_message(1, 8)
    x_a = rand_t32(rng, (2, N_LWE))
    x_b = rand_t32(rng, (2,))
    x = lwe_mod.LweSample(x_a, x_b, np.zeros(2, np.float32))

    got_u = bs.bootstrap_wo_keyswitch(bk, mu, x)
    got = ksw.keyswitch(key, got_u)

    for i in range(2):
        u_a, u_b = oracle.bootstrap_wo_keyswitch(
            bk_raw, mu, x_a[i], x_b[i], N, K, L, B
        )
        np.testing.assert_array_equal(np.asarray(got_u.a)[i], u_a)
        assert int(np.asarray(got_u.b)[i]) == int(u_b)
        a_want, b_want = oracle.keyswitch(ks_a, ks_b, u_a, u_b, KS_L, KS_B)
        np.testing.assert_array_equal(np.asarray(got.a)[i], a_want)
        assert int(np.asarray(got.b)[i]) == int(b_want)


def test_lwe_encrypt_core_matches_oracle(rng):
    key = rng.integers(0, 2, size=N_LWE).astype(np.int32)
    a = rand_t32(rng, (N_LWE,))
    noise = rand_t32(rng, ())
    msg = oracle.encode_message(1, 8)
    got = lwe_mod.lwe_encrypt_core(msg, a, noise, key)
    want = oracle.lwe_encrypt_core(msg, a, noise, key)
    assert int(np.asarray(got.b)) == int(want)
    # phase round-trips
    ph = lwe_mod.lwe_phase(got, key)
    want_ph = oracle.lwe_phase(a, want, key)
    assert int(np.asarray(ph)) == int(want_ph)


def test_tlwe_encrypt_zero_core_matches_oracle(rng):
    key = rng.integers(0, 2, size=(K, N)).astype(np.int32)
    a_part = rand_t32(rng, (K, N))
    noise = rand_t32(rng, (N,))
    got = np.asarray(tlwe_mod.tlwe_encrypt_zero_core(a_part, noise, key).a)
    want = oracle.tlwe_encrypt_zero_core(a_part, noise, key)
    np.testing.assert_array_equal(got, want)


def test_keyswitch_key_core_table(rng):
    """Framework keyswitch keygen == oracle-style table built in NumPy."""
    n_in, n_out = 2 * 3, 5  # deliberately non-round
    in_key = rng.integers(0, 2, size=n_in).astype(np.int32)
    out_key = rng.integers(0, 2, size=n_out).astype(np.int32)
    base = 1 << KS_B
    a = rand_t32(rng, (base - 1, KS_L, n_in, n_out))
    noise = rand_t32(rng, (base - 1, KS_L, n_in))
    key = ksw.keyswitch_key_core(in_key, out_key, a, noise, KS_L, KS_B)

    # Expected raw table per reference src/keyswitch.jl:36-38
    want_b = np.empty((base - 1, KS_L, n_in), np.int32)
    for h in range(1, base):
        for j in range(1, KS_L + 1):
            for i in range(n_in):
                msg = oracle.w32(
                    (np.int64(in_key[i]) * h) << (32 - j * KS_B)
                )
                want_b[h - 1, j - 1, i] = oracle.lwe_encrypt_core(
                    msg, a[h - 1, j - 1, i], noise[h - 1, j - 1, i], out_key
                )
    want_limbs = np.asarray(ksw.prepare_keyswitch_table(a, want_b, n_out))
    np.testing.assert_array_equal(np.asarray(key.table_limbs), want_limbs)


def test_mul_by_monomial_matches_oracle(rng):
    p = rand_t32(rng, (N,))
    for shift in [0, 1, 5, N - 1, N, N + 3, 2 * N - 1, 2 * N, -1, -N, -(2 * N) + 1]:
        got = np.asarray(tt.polynomial.mul_by_monomial(p, shift))
        want = oracle.mul_by_monomial(p, shift)
        np.testing.assert_array_equal(got, want, err_msg=f"shift={shift}")


def test_reverse_polynomial_matches_oracle(rng):
    p = rand_t32(rng, (N,))
    got = np.asarray(tt.polynomial.reverse_polynomial(p))
    np.testing.assert_array_equal(got, oracle.reverse_polynomial(p))
