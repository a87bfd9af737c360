"""Multi-key TFHE: bit-exactness vs the NumPy MK oracle + end-to-end gates.

Injected-randomness equivalence at each MK checkpoint (uni-encryption,
expansion, external product, blind rotate, keyswitch), then decrypt-level
NAND round trips with a real 2-party ceremony on toy parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spec.oracle_mk as omk

import tfhe_tpu as tt
import tfhe_tpu.mk as mk
import tfhe_tpu.mk.internals as mki
from tfhe_tpu.tgsw import tgsw_extern_mul_prepared
from tfhe_tpu.tlwe import TLweSample

N = 64
L = 3  # decomp length
B = 7  # log2 base
PARTIES = 2


def rand_t32(rng, shape):
    return rng.integers(-(2**31), 2**31, size=shape, dtype=np.int64).astype(np.int32)


def _random_ue(rng):
    return {
        "message": 1,
        "r": rng.integers(0, 2, size=N).astype(np.int32),
        "c1": rand_t32(rng, (L, N)),
        "f1": rand_t32(rng, (L, N)),
        "noises": {k: rand_t32(rng, (L, N)) for k in ("c0", "d0", "d1", "f0")},
        "tlwe_key": rng.integers(0, 2, size=N).astype(np.int32),
        "shared_a": rand_t32(rng, (L, N)),
    }


def test_public_key_core_matches_oracle(rng):
    key = rng.integers(0, 2, size=(1, N)).astype(np.int32)
    shared = rand_t32(rng, (L, N))
    noise = rand_t32(rng, (L, N))
    got = np.asarray(mki.public_key_core(key, shared, noise))
    want = omk.public_key_core(key[0], shared, noise)
    np.testing.assert_array_equal(got, want)


def _ue_pair(rng):
    u = _random_ue(rng)
    pk_b = rand_t32(rng, (L, N))
    got = mki.mk_tgsw_encrypt_core(
        u["message"], u["r"], u["c1"], u["f1"],
        u["noises"]["c0"], u["noises"]["d0"], u["noises"]["d1"], u["noises"]["f0"],
        u["tlwe_key"][None], u["shared_a"], pk_b, L, B,
    )
    want = omk.mk_tgsw_encrypt_core(
        u["message"], u["r"], u["c1"], u["f1"], u["noises"],
        u["tlwe_key"], u["shared_a"], pk_b, L, B,
    )
    return got, want


def test_mk_tgsw_encrypt_core_matches_oracle(rng):
    got, want = _ue_pair(rng)
    for idx, name in enumerate(("c0", "c1", "d0", "d1", "f0", "f1")):
        np.testing.assert_array_equal(
            np.asarray(got.cd)[idx], want[name], err_msg=name
        )


def test_mk_tgsw_expand_matches_oracle(rng):
    got_ue, want_ue = _ue_pair(rng)
    pk_bs = rand_t32(rng, (PARTIES, L, N))
    party = 1
    got = mki.mk_tgsw_expand(got_ue, party, pk_bs, L, B)
    want = omk.mk_tgsw_expand(want_ue, party, pk_bs, L, B)
    np.testing.assert_array_equal(np.asarray(got.x), want["x"])
    np.testing.assert_array_equal(np.asarray(got.y), want["y"])
    np.testing.assert_array_equal(np.asarray(got.c0), want["c0"])
    np.testing.assert_array_equal(np.asarray(got.c1), want["c1"])


def _random_exp(rng):
    return dict(
        x=rand_t32(rng, (L, PARTIES, N)),
        y=rand_t32(rng, (L, PARTIES, N)),
        c0=rand_t32(rng, (L, N)),
        c1=rand_t32(rng, (L, N)),
    )


@pytest.mark.parametrize("party", [0, 1])
def test_mk_extern_mul_matches_oracle(rng, party):
    exp = _random_exp(rng)
    exp_s = mki.MKTGswExpSample(exp["x"], exp["y"], exp["c0"], exp["c1"])
    limbs = mki.build_extern_operand(exp_s, party, PARTIES, L)
    batch = 2
    a = rand_t32(rng, (batch, PARTIES, N))
    b = rand_t32(rng, (batch, N))
    acc = TLweSample(
        np.concatenate([a, b[:, None, :]], axis=1), np.zeros(batch, np.float32)
    )
    got = np.asarray(tgsw_extern_mul_prepared(acc, limbs, L, B).a)
    for i in range(batch):
        wa, wb = omk.mk_tgsw_extern_mul(a[i], b[i], exp, party, PARTIES, L, B)
        np.testing.assert_array_equal(got[i, :PARTIES], wa)
        np.testing.assert_array_equal(got[i, PARTIES], wb)


def test_mk_blind_rotate_and_bootstrap_matches_oracle(rng):
    n_lwe = 4
    # random (structurally arbitrary) expanded samples per (party, key bit)
    exps = [[_random_exp(rng) for _ in range(n_lwe)] for _ in range(PARTIES)]
    all_limbs = np.stack([
        np.asarray(mki.build_extern_operand(
            mki.MKTGswExpSample(e["x"], e["y"], e["c0"], e["c1"]),
            party, PARTIES, L,
        ))
        for party in range(PARTIES)
        for e in exps[party]
    ])
    bk = mki.MKBootstrapKey(jnp.asarray(all_limbs), PARTIES, n_lwe, L, B, N)

    batch = 2
    x_a = rand_t32(rng, (batch, PARTIES, n_lwe))
    x_b = rand_t32(rng, (batch,))
    mu = int(np.int32(1 << 29))
    x = mki.MKLweSample(x_a, x_b, np.zeros(batch, np.float32))
    got = mki.mk_bootstrap_wo_keyswitch(bk, mu, x)
    for i in range(batch):
        wa, wb = omk.mk_bootstrap_wo_keyswitch(
            exps, mu, x_a[i].T, x_b[i], N, L, B
        )
        np.testing.assert_array_equal(np.asarray(got.a)[i], wa)
        assert int(np.asarray(got.b)[i]) == int(wb)


def test_mk_keyswitch_matches_oracle(rng):
    from tfhe_tpu.keyswitch import KeyswitchKey, prepare_keyswitch_table

    ks_l, ks_b = 8, 2
    n_out = 12
    base = 1 << ks_b
    tables, keys = [], []
    for _ in range(PARTIES):
        ks_a = rand_t32(rng, (base - 1, ks_l, N, n_out))
        ks_b_arr = rand_t32(rng, (base - 1, ks_l, N))
        tables.append((ks_a, ks_b_arr))
        keys.append(KeyswitchKey(
            prepare_keyswitch_table(ks_a, ks_b_arr, n_out), N, n_out, ks_l, ks_b
        ))
    batch = 2
    a = rand_t32(rng, (batch, PARTIES, N))
    b = rand_t32(rng, (batch,))
    got = mki.mk_keyswitch(
        keys, mki.MKLweSample(a, b, np.zeros(batch, np.float32))
    )
    for i in range(batch):
        wa, wb = omk.mk_keyswitch(tables, a[i], b[i], ks_l, ks_b)
        np.testing.assert_array_equal(np.asarray(got.a)[i], wa)
        assert int(np.asarray(got.b)[i]) == int(wb)


@pytest.mark.parametrize("parties", [2, 3, 8])
def test_mk_nand_round_trip(parties):
    """Full ceremony + batched MK NAND truth table on toy parameters.

    Mirrors reference test/runtests.jl:60-100 (2-party NAND round trips).
    """
    params = mk.mktfhe_parameters_toy(max_parties=parties)
    rng = jax.random.PRNGKey(42)
    r_shared, r_enc, *r_parties = jax.random.split(rng, 2 + parties)

    shared = mk.make_shared_key(r_shared, params)
    sks, parts = [], []
    for p in range(parties):
        r_sk, r_part = jax.random.split(r_parties[p])
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))
    ck = mk.make_mk_cloud_key(parts)

    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    r1, r2 = jax.random.split(r_enc)
    ct_x = mk.mk_encrypt(r1, sks, xs)
    ct_y = mk.mk_encrypt(r2, sks, ys)

    # encryption round-trips
    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, ct_x)), np.asarray(xs)
    )
    out = mk.mk_gate_nand(ck, ct_x, ct_y)
    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, out)), [True, True, True, False]
    )


def test_mk_baked_vs_prepared_blind_rotate(rng, monkeypatch):
    """Baked MK bootstrap key == prepared path, bit-exact (toy ceremony)."""
    parties = 2
    params = mk.mktfhe_parameters_toy(parties)
    r = jax.random.PRNGKey(9)
    r_sh, r_e, ra, rb = jax.random.split(r, 4)
    shared = mk.make_shared_key(r_sh, params)
    sks, parts = [], []
    for rr in (ra, rb):
        r_sk, r_part = jax.random.split(rr)
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))

    ck_baked = mk.make_mk_cloud_key(parts)
    assert ck_baked.bootstrap_key.block > 0, "toy key should bake"
    monkeypatch.setenv("TFHE_TPU_MK_BAKE_BUDGET", "0")
    ck_prep = mk.make_mk_cloud_key(parts)
    assert ck_prep.bootstrap_key.block == 0

    bits = jnp.asarray([True, False], bool)
    x = mk.mk_encrypt(jax.random.PRNGKey(1), sks, bits)
    y = mk.mk_encrypt(jax.random.PRNGKey(2), sks, ~bits)
    got = mk.mk_gate_nand(ck_baked, x, y)
    want = mk.mk_gate_nand(ck_prep, x, y)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, got)), [True, True]
    )


def test_mk_segmented_blind_rotate_bit_identical():
    """segments=3 host-chunked rotation == single-scan rotation."""
    parties = 2
    params = mk.mktfhe_parameters_toy(parties)
    r = jax.random.PRNGKey(13)
    r_sh, r_e, ra, rb = jax.random.split(r, 4)
    shared = mk.make_shared_key(r_sh, params)
    sks, parts = [], []
    for rr in (ra, rb):
        r_sk, r_part = jax.random.split(rr)
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))
    ck = mk.make_mk_cloud_key(parts)
    bits = jnp.asarray([True, False], bool)
    x = mk.mk_encrypt(jax.random.PRNGKey(1), sks, bits)
    y = mk.mk_encrypt(jax.random.PRNGKey(2), sks, ~bits)
    want = mk.mk_gate_nand(ck, x, y)
    got = mk.mk_gate_nand(ck, x, y, segments=3)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))


def test_mk_8party_preset_decomposition_round_trip():
    """8 parties with the 8-party PRESET's decomposition (l=8, base=2^4 —
    reference src/mk_api.jl:28-34), at toy ring sizes so the full ceremony +
    NAND run in CI. The production preset itself differs only in n/N, whose
    arithmetic is size-independent (exactness) — this closes the round-1
    review's 'preset exists with zero coverage' gap at the parameter level.
    """
    from tfhe_tpu.params import SchemeParameters

    params = SchemeParameters(
        lwe_size=16, lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=256, tlwe_mask_size=1,
        bs_decomp_length=8, bs_log2_base=4, bs_noise_stddev=3.29e-10,
        ks_decomp_length=8, ks_log2_base=2, ks_noise_stddev=2.0**-15,
        max_parties=8,
    )
    parties = 8
    rng = jax.random.PRNGKey(77)
    r_shared, r_enc, *r_parties = jax.random.split(rng, 2 + parties)
    shared = mk.make_shared_key(r_shared, params)
    sks, parts = [], []
    for p in range(parties):
        r_sk, r_part = jax.random.split(r_parties[p])
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))
    ck = mk.make_mk_cloud_key(parts)

    xs = jnp.asarray([False, True], bool)
    ys = jnp.asarray([True, True], bool)
    r1, r2 = jax.random.split(r_enc)
    ct_x = mk.mk_encrypt(r1, sks, xs)
    ct_y = mk.mk_encrypt(r2, sks, ys)
    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, ct_x)), np.asarray(xs))
    out = mk.mk_gate_nand(ck, ct_x, ct_y)
    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, out)), [True, False])


@pytest.mark.parametrize("parties", [2, 4])
def test_mk_expand_kernel_matches_prepared(monkeypatch, parties):
    """MK blind rotation through the on-the-fly sparse-expansion kernel
    (interpret mode) == the prepared XLA path, bitwise (toy ceremony).
    Covers both sparsity patterns (2-party: 7/9 blocks; 4-party: 13/25)."""
    params = mk.mktfhe_parameters_toy(parties)
    r = jax.random.PRNGKey(31)
    r_sh, r_e, *rparts = jax.random.split(r, 2 + parties)
    shared = mk.make_shared_key(r_sh, params)
    sks, parts = [], []
    for rr in rparts:
        r_sk, r_part = jax.random.split(rr)
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))

    monkeypatch.setenv("TFHE_TPU_MK_BAKE_BUDGET", "0")  # stay prepared
    ck = mk.make_mk_cloud_key(parts)
    assert ck.bootstrap_key.block == 0

    bits = jnp.asarray([True, False], bool)
    x = mk.mk_encrypt(jax.random.PRNGKey(1), sks, bits)
    y = mk.mk_encrypt(jax.random.PRNGKey(2), sks, ~bits)

    monkeypatch.setenv("TFHE_TPU_MK_CMUX", "prepared")
    want = mk.mk_gate_nand(ck, x, y)
    monkeypatch.setenv("TFHE_TPU_MK_CMUX", "expand")
    got = mk.mk_gate_nand(ck, x, y)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, got)), [True, True])

    # sparse-STORED key (the 8-party-production layout): same ceremony,
    # limbs hold only the nonzero blocks; must stay bitwise identical
    monkeypatch.setenv("TFHE_TPU_MK_SPARSE_LIMBS", "1")
    ck_sp = mk.make_mk_cloud_key(parts)
    assert ck_sp.bootstrap_key.sparse
    nz = len(mk.internals.mk_nonzero_blocks(0, parties))
    # per-party tuple of [n, 4, NZ, l, 2N]
    assert len(ck_sp.bootstrap_key.limbs) == parties
    assert ck_sp.bootstrap_key.limbs[0].shape[2] == nz == 3 * parties + 1
    got_sp = mk.mk_gate_nand(ck_sp, x, y)
    np.testing.assert_array_equal(np.asarray(got_sp.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got_sp.b), np.asarray(want.b))

    # COMPACT megakernel (in-kernel sparse expansion) end-to-end: both key
    # storage forms, triangular rotation live (progressive default) — must
    # match the prepared path bitwise. Gate-level only at 2 parties: the
    # 4-party interpret-mode compact gate program aborts XLA:CPU's compiler
    # (the documented compile-accumulation fragility); 4- and 8-party
    # compact coverage is the kernel-level differential in
    # tests/test_mk_megakernel.py. Cache clear first — this test already
    # compiles ~5 heavy interpret-mode gates in one process.
    if parties == 2:
        jax.clear_caches()
        monkeypatch.setenv("TFHE_TPU_MK_COMPACT", "1")
        got_c = mk.mk_gate_nand(ck, x, y)
        np.testing.assert_array_equal(np.asarray(got_c.a), np.asarray(want.a))
        np.testing.assert_array_equal(np.asarray(got_c.b), np.asarray(want.b))
        got_csp = mk.mk_gate_nand(ck_sp, x, y)
        np.testing.assert_array_equal(
            np.asarray(got_csp.a), np.asarray(want.a))
        np.testing.assert_array_equal(
            np.asarray(got_csp.b), np.asarray(want.b))


def test_mk_full_gate_set_truth_tables():
    """All MK two-input gates + XOR family + MUX on a 2-party toy ceremony."""
    parties = 2
    params = mk.mktfhe_parameters_toy(max_parties=parties)
    r_shared, r_enc, ra, rb = jax.random.split(jax.random.PRNGKey(77), 4)
    shared = mk.make_shared_key(r_shared, params)
    sks, parts = [], []
    for rr in (ra, rb):
        r_sk, r_part = jax.random.split(rr)
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))
    ck = mk.make_mk_cloud_key(parts)

    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    r1, r2 = jax.random.split(r_enc)
    ct_x = mk.mk_encrypt(r1, sks, xs)
    ct_y = mk.mk_encrypt(r2, sks, ys)
    xn, yn = np.asarray(xs), np.asarray(ys)

    table = {
        mk.mk_gate_and: xn & yn, mk.mk_gate_or: xn | yn,
        mk.mk_gate_xor: xn ^ yn, mk.mk_gate_xnor: ~(xn ^ yn),
        mk.mk_gate_nor: ~(xn | yn), mk.mk_gate_andny: ~xn & yn,
        mk.mk_gate_andyn: xn & ~yn, mk.mk_gate_orny: ~xn | yn,
        mk.mk_gate_oryn: xn | ~yn,
    }
    for fn, want in table.items():
        got = np.asarray(mk.mk_decrypt(sks, fn(ck, ct_x, ct_y)))
        np.testing.assert_array_equal(got, want, err_msg=fn.__name__)

    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, mk.mk_gate_not(ck, ct_x))), ~xn)

    # MUX(x, y, z): use z = NOT y for a nontrivial select
    ct_z = mk.mk_gate_not(ck, ct_y)
    got = np.asarray(mk.mk_decrypt(sks, mk.mk_gate_mux(ck, ct_x, ct_y, ct_z)))
    np.testing.assert_array_equal(got, np.where(xn, yn, ~yn))


def test_mk_distributed_decryption():
    """Each party publishes only a smudged share; combining the shares
    decrypts without any secret key leaving its party — and a fresh MK
    NAND output decrypts the same way (the margin survives smudging)."""
    parties = 2
    params = mk.mktfhe_parameters_toy(max_parties=parties)
    rng = jax.random.PRNGKey(77)
    r_shared, r_enc, *r_parties = jax.random.split(rng, 2 + parties)
    shared = mk.make_shared_key(r_shared, params)
    sks, parts = [], []
    for p in range(parties):
        r_sk, r_part = jax.random.split(r_parties[p])
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))
    ck = mk.make_mk_cloud_key(parts)

    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    r1, r2 = jax.random.split(r_enc)
    ct_x = mk.mk_encrypt(r1, sks, xs)
    ct_y = mk.mk_encrypt(r2, sks, ys)
    out = mk.mk_gate_nand(ck, ct_x, ct_y)

    for ct, want in ((ct_x, xs), (out, ~(xs & ys))):
        # fresh ciphertexts calibrate by the smudging lemma; the toy
        # bootstrapped output's cv is too large for any statistical bits
        # (the guard refuses, asserted below) so it passes explicit sigma
        shares = [
            mk.mk_partial_decrypt(
                jax.random.PRNGKey(100 + p), sks[p], ct, p,
                smudging_stddev=2.0**-15)
            for p in range(parties)
        ]
        np.testing.assert_array_equal(
            np.asarray(mk.mk_combine_shares(ct, shares)), np.asarray(want))
        # sanity: matches the all-keys joint decryption
        np.testing.assert_array_equal(
            np.asarray(mk.mk_combine_shares(ct, shares)),
            np.asarray(mk.mk_decrypt(sks, ct)))

    # calibrated mode: a fresh encryption affords ~7 bits of smudging on
    # the 32-bit torus (the lemma floods the 8-sigma magnitude bound, not
    # the stddev); correctness must survive the calibrated flooding
    shares = [
        mk.mk_partial_decrypt(jax.random.PRNGKey(300 + p), sks[p], ct_x, p,
                              statistical_security=5)
        for p in range(parties)
    ]
    np.testing.assert_array_equal(
        np.asarray(mk.mk_combine_shares(ct_x, shares)), np.asarray(xs))
    # the guard refuses calibrations that break the decision margin, and
    # refuses ambiguous calls
    with pytest.raises(ValueError, match="decision margin"):
        mk.mk_partial_decrypt(jax.random.PRNGKey(0), sks[0], ct_x, 0,
                              statistical_security=40)
    with pytest.raises(ValueError, match="exactly one"):
        mk.mk_partial_decrypt(jax.random.PRNGKey(0), sks[0], ct_x, 0)


def test_mk_share_hiding():
    """The smudging-lemma calibration actually hides the share's
    key-dependent content: at statistical_security=lam, share distributions
    arising from DIFFERENT secret values are ~2^-lam-close. Measured as a
    histogram total-variation distance over many draws of the smudge."""
    lam = 4
    sigma_share = 2.0**-15
    n_draws = 200_000
    rng = np.random.default_rng(5)
    # two candidate share centres one share-noise-unit apart (the secret-
    # dependent variation smudging must hide)
    delta = int(sigma_share * 2**32)
    smudge_sigma = (2.0**lam) * sigma_share
    draws = rng.normal(0.0, smudge_sigma * 2**32, n_draws)
    s0 = np.round(draws).astype(np.int64)
    s1 = np.round(draws + delta).astype(np.int64)
    lo = min(s0.min(), s1.min())
    hi = max(s0.max(), s1.max())
    bins = np.linspace(lo, hi, 201)
    h0, _ = np.histogram(s0, bins=bins)
    h1, _ = np.histogram(s1, bins=bins)
    tv = 0.5 * np.abs(h0 / n_draws - h1 / n_draws).sum()
    # smudging lemma: TV <= ~delta / (sigma * sqrt(2 pi)) = 2^-lam / 2.5;
    # allow generous Monte-Carlo slack
    assert tv < 3.0 * 2.0**-lam, tv
    # and WITHOUT smudging at scale, the same delta is fully visible
    small = rng.normal(0.0, sigma_share * 2**32 / 4, n_draws)
    u0 = np.round(small).astype(np.int64)
    u1 = np.round(small + delta).astype(np.int64)
    bins = np.linspace(min(u0.min(), u1.min()), max(u0.max(), u1.max()), 201)
    g0, _ = np.histogram(u0, bins=bins)
    g1, _ = np.histogram(u1, bins=bins)
    tv_exposed = 0.5 * np.abs(g0 / n_draws - g1 / n_draws).sum()
    assert tv_exposed > 0.9, tv_exposed


def test_mk_progressive_rotation_bit_identical(monkeypatch):
    """The triangular rotation (skip blocks of parties not yet processed —
    their accumulator components are structurally zero) must be bitwise
    identical to the full-block rotation, and a NON-trivial accumulator
    must bypass it via trivial_masks=False. 3 parties exercises k_act =
    2/3/4 (party 0 halves its blocks, party 2 runs full)."""
    from tfhe_tpu import tuning

    parties = 3
    params = mk.mktfhe_parameters_toy(parties)
    r = jax.random.PRNGKey(77)
    r_sh, *rparts = jax.random.split(r, 1 + parties)
    shared = mk.make_shared_key(r_sh, params)
    sks, parts = [], []
    for rr in rparts:
        r_sk, r_part = jax.random.split(rr)
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared))
    monkeypatch.setenv("TFHE_TPU_MK_BAKE_BUDGET", "0")  # stay prepared
    monkeypatch.setenv("TFHE_TPU_MK_CMUX", "expand")  # fast path, interpret
    ck = mk.make_mk_cloud_key(parts)
    bk = ck.bootstrap_key

    rng = np.random.default_rng(3)
    batch = 2
    n = params.tlwe_polynomial_degree
    bara = jnp.asarray(rng.integers(
        0, 2 * n, (batch, parties, params.lwe_size)).astype(np.int32))

    # bootstrap-shaped start: trivial accumulator (zero masks)
    testvect = rand_t32(rng, (batch, n))
    acc0 = mki.mk_tlwe_noiseless_trivial(jnp.asarray(testvect), parties)

    with tuning.override(mk_progressive=False):
        want = mki.mk_blind_rotate(acc0, bk, bara)
    got = mki.mk_blind_rotate(acc0, bk, bara)  # progressive (default)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))

    # arbitrary accumulator: trivial_masks=False must match the full path
    acc_rand = TLweSample(
        jnp.asarray(rand_t32(rng, (batch, parties + 1, n))),
        jnp.zeros(batch, jnp.float32))
    with tuning.override(mk_progressive=False):
        want_r = mki.mk_blind_rotate(acc_rand, bk, bara)
    got_r = mki.mk_blind_rotate(acc_rand, bk, bara, trivial_masks=False)
    np.testing.assert_array_equal(np.asarray(got_r.a), np.asarray(want_r.a))

    # negative control: the same arbitrary accumulator WITH the (here
    # invalid) trivial-masks assumption must actually take the restricted
    # path and diverge — proves the progressive machinery is live, not
    # silently disabled
    bad = mki.mk_blind_rotate(acc_rand, bk, bara, trivial_masks=True)
    assert not np.array_equal(np.asarray(bad.a), np.asarray(want_r.a))
