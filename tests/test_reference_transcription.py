"""Verbatim-transcription crosschecks for keyswitch and MK expansion.

test_transform_crosscheck.py closes the shared-misreading loophole for the
convolution engine by transcribing the reference's own tangent FFT; the
round-2 review noted the same loophole remains for the KEYSWITCH TABLE
LAYOUT (reference: src/keyswitch.jl:36-38 — ks[h,j,i] indexing, h = 0
skipped, per-digit subtraction walk) and the MK EXPANSION PLACEMENT
(src/mk_internals.jl:304-345 — which x/y cells get the <g^-1(b_i - b_party),
f> cross terms). This module transcribes those reference algorithms
line-by-line into NumPy, INDEPENDENTLY of spec/oracle.py, and asserts our
MXU-shaped implementations reproduce them bit-for-bit on injected
randomness. A misreading would now have to be made three times over —
in the framework, in the oracle, and in these standalone transcriptions —
in exactly the same way.
"""

import numpy as np
import jax.numpy as jnp

import tfhe_tpu.keyswitch as ksw
from tfhe_tpu.lwe import LweSample


def w32(x):
    return ((np.asarray(x, np.int64) + 2**31) % 2**32 - 2**31).astype(np.int32)


def rand_t32(rng, shape):
    return rng.integers(-(2**31), 2**31, size=shape, dtype=np.int64).astype(
        np.int32)


# --- keyswitch, transcribed from /root/reference/src/keyswitch.jl ---


def ref_keyswitch_keygen(in_key, out_key, a_uniform, noise_t32, l, b):
    """KeyswitchKey ctor, keyswitch.jl:14-41: ks[h,j,i] = lwe_encrypt(
    message(i,j,h), ...) with message(i,j,h) = (s_in[i] * h) << (32 - j*b),
    h in 1..base-1, j in 1..l. Injected a/noise replace the rng draws
    (noise recentring, :28-29, only changes WHICH noise values are drawn —
    the arithmetic consumes them opaquely). Returns (a, b) tables indexed
    [h-1, j-1, i]."""
    base = 1 << b
    n_in = len(in_key)
    ks_b = np.empty((base - 1, l, n_in), np.int64)
    for h in range(1, base):
        for j in range(1, l + 1):
            for i in range(n_in):
                message = w32(np.int64(int(in_key[i]) * h) << (32 - j * b))
                # lwe_encrypt (lwe.jl:49-55): b = message + noise + <a, s>
                dot = (a_uniform[h - 1, j - 1, i].astype(np.int64)
                       * out_key.astype(np.int64)).sum()
                ks_b[h - 1, j - 1, i] = np.int64(message) + np.int64(
                    noise_t32[h - 1, j - 1, i]) + dot
    return a_uniform.copy(), w32(ks_b)


def ref_keyswitch(ks_a, ks_b, a, bb, l, b):
    """keyswitch, keyswitch.jl:45-80: round to l*b bits (prec_offset), digit
    extract, then result -= ks[digit, j, i] for every nonzero digit."""
    n_out = ks_a.shape[-1]
    res_a = np.zeros(n_out, np.int64)
    res_b = np.int64(bb)
    prec_offset = np.int64(1) << (32 - (1 + b * l))
    base = 1 << b
    mask = base - 1
    aibar = w32(np.asarray(a, np.int64) + prec_offset).astype(np.int64)
    for i in range(len(a)):
        for j in range(1, l + 1):
            dig = (int(aibar[i]) >> (32 - j * b)) & mask
            if dig != 0:
                res_a -= ks_a[dig - 1, j - 1, i].astype(np.int64)
                res_b -= np.int64(ks_b[dig - 1, j - 1, i])
    return w32(res_a), w32(res_b)


def test_keyswitch_matches_reference_transcription(rng):
    l, b, n_in, n_out = 3, 2, 24, 16
    base = 1 << b
    in_key = rng.integers(0, 2, n_in).astype(np.int32)
    out_key = rng.integers(0, 2, n_out).astype(np.int32)
    a_uniform = rand_t32(rng, (base - 1, l, n_in, n_out))
    noise = rand_t32(rng, (base - 1, l, n_in))

    # reference transcription, end to end
    ks_a, ks_b = ref_keyswitch_keygen(in_key, out_key, a_uniform, noise, l, b)
    sample_a = rand_t32(rng, (3, n_in))
    sample_b = rand_t32(rng, (3,))
    # framework: same injected randomness through keyswitch_key_core
    key = ksw.keyswitch_key_core(
        jnp.asarray(in_key), jnp.asarray(out_key), jnp.asarray(a_uniform),
        jnp.asarray(noise), l, b)
    got = ksw.keyswitch(
        key, LweSample(jnp.asarray(sample_a), jnp.asarray(sample_b),
                       jnp.zeros(3, jnp.float32)))
    for i in range(3):
        want_a, want_b = ref_keyswitch(ks_a, ks_b, sample_a[i], sample_b[i],
                                       l, b)
        np.testing.assert_array_equal(np.asarray(got.a)[i], want_a)
        assert int(np.asarray(got.b)[i]) == int(want_b)


# --- MK expansion, transcribed from /root/reference/src/mk_internals.jl ---


def ref_negacyclic(a, bb):
    n = len(a)
    out = np.zeros(n, np.int64)
    a64 = a.astype(np.int64)
    b64 = bb.astype(np.int64)
    for t in range(n):
        out[t] = (a64[: t + 1] * b64[t::-1]).sum() - (
            a64[t + 1:] * b64[: t: -1]).sum()
    return w32(out)


def ref_decompose(poly, l, b):
    """tgsw.jl:99-117 (same construction the keyswitch does not use)."""
    g = [np.int64(1) << (32 - (i + 1) * b) for i in range(l)]
    offset = w32(sum(int(x) for x in g) * (1 << (b - 1)))
    mask = (1 << b) - 1
    half = 1 << (b - 1)
    shifted = w32(np.asarray(poly, np.int64) + np.int64(offset)).astype(
        np.int64)
    return [(((shifted >> (32 - (i + 1) * b)) & mask) - half).astype(np.int32)
            for i in range(l)]


def ref_mk_tgsw_expand(ue_cd, party, pk_b, l, b):
    """mk_tgsw_expand, mk_internals.jl:304-345: x[j,i] = d0[j] (+ cross
    term for i != party), y[j,i] = d1[j] if i == party else cross term,
    cross = sum_ldec conv(decompose(b_i[j] - b_party[j])[ldec], f{0,1}[ldec]).
    ue_cd: [6, l, N] (c0, c1, d0, d1, f0, f1); pk_b: [parties, l, N]."""
    parties, _, n = pk_b.shape
    c0, c1, d0, d1, f0, f1 = [ue_cd[i] for i in range(6)]
    x = np.zeros((l, parties, n), np.int32)
    y = np.zeros((l, parties, n), np.int32)
    for i in range(parties):
        for j in range(l):
            if i == party:
                x[j, i] = d0[j]
                y[j, i] = d1[j]
                continue
            dec = ref_decompose(w32(pk_b[i, j].astype(np.int64)
                                    - pk_b[party, j].astype(np.int64)), l, b)
            xs = np.zeros(n, np.int64)
            ys = np.zeros(n, np.int64)
            for ldec in range(l):
                xs += ref_negacyclic(dec[ldec], f0[ldec]).astype(np.int64)
                ys += ref_negacyclic(dec[ldec], f1[ldec]).astype(np.int64)
            x[j, i] = w32(d0[j].astype(np.int64) + xs)
            y[j, i] = w32(ys)
    return x, y, c0, c1


def test_mk_expand_matches_reference_transcription(rng):
    from tfhe_tpu.mk.internals import MKTGswUESample, mk_tgsw_expand

    parties, l, b, n = 3, 2, 7, 64
    party = 1
    ue_cd = rand_t32(rng, (6, l, n))
    pk_b = rand_t32(rng, (parties, l, n))

    want_x, want_y, want_c0, want_c1 = ref_mk_tgsw_expand(
        ue_cd, party, pk_b, l, b)
    got = mk_tgsw_expand(
        MKTGswUESample(jnp.asarray(ue_cd)), party, jnp.asarray(pk_b), l, b)
    np.testing.assert_array_equal(np.asarray(got.x), want_x)
    np.testing.assert_array_equal(np.asarray(got.y), want_y)
    np.testing.assert_array_equal(np.asarray(got.c0), want_c0)
    np.testing.assert_array_equal(np.asarray(got.c1), want_c1)


# --- MK uni-encryption, transcribed from /root/reference/src/mk_internals.jl ---


def ref_mk_tgsw_encrypt(message, r, c1, f1, e_c0, e_d0, e_d1, e_f0,
                        key0, shared_a, pk_b, l, b):
    """mk_tgsw_encrypt (RGSW.UniEnc), mk_internals.jl:185-227, with the rng
    draws (r, c1, f1, four Gaussian noise blocks) injected. Component
    placement being pinned:
      C: c0[i] = e_c0[i] + key (*) c1[i] + m*g[i]   (m*g on the CONSTANT
         coefficient — poly + scalar adds to the const term, DarkIntegers
         semantics per SURVEY C2)
      D: d1[i] = e_d1[i] + r (*) shared_a[i] + m*g[i] (const coeff)
         d0[i] = e_d0[i] + r (*) pk_b[i]
      F: f0[i] = e_f0[i] + key (*) f1[i] + r*g[i]   (poly * scalar — EVERY
         coefficient, unlike the m*g terms)
    Returns [6, l, N] int32 stacked (c0, c1, d0, d1, f0, f1)."""
    n = len(r)
    g = [np.int64(1) << (32 - (i + 1) * b) for i in range(l)]
    c0 = np.zeros((l, n), np.int32)
    d0 = np.zeros((l, n), np.int32)
    d1 = np.zeros((l, n), np.int32)
    f0 = np.zeros((l, n), np.int32)
    for i in range(l):
        mg = np.zeros(n, np.int64)
        mg[0] = np.int64(int(message)) * g[i]
        c0[i] = w32(e_c0[i].astype(np.int64)
                    + ref_negacyclic(key0, c1[i]).astype(np.int64) + mg)
        d1[i] = w32(e_d1[i].astype(np.int64)
                    + ref_negacyclic(r, shared_a[i]).astype(np.int64) + mg)
        d0[i] = w32(e_d0[i].astype(np.int64)
                    + ref_negacyclic(r, pk_b[i]).astype(np.int64))
        f0[i] = w32(e_f0[i].astype(np.int64)
                    + ref_negacyclic(key0, f1[i]).astype(np.int64)
                    + r.astype(np.int64) * g[i])
    return np.stack([c0, c1, d0, d1, f0, f1])


def test_mk_uniencrypt_matches_reference_transcription(rng):
    """mk_tgsw_encrypt_core == the standalone UniEnc transcription on
    injected randomness — closes the last oracle-only reference surface
    (the C/D/F placement was previously verified only against
    spec/oracle_mk.py, authored by the same hand)."""
    from tfhe_tpu.mk.internals import mk_tgsw_encrypt_core

    l, b, n = 2, 7, 64
    for message in (1, -3):
        r = rng.integers(0, 2, n).astype(np.int32)
        key0 = rng.integers(0, 2, n).astype(np.int32)
        c1 = rand_t32(rng, (l, n))
        f1 = rand_t32(rng, (l, n))
        e_c0, e_d0, e_d1, e_f0 = (rand_t32(rng, (l, n)) for _ in range(4))
        shared_a = rand_t32(rng, (l, n))
        pk_b = rand_t32(rng, (l, n))

        want = ref_mk_tgsw_encrypt(
            message, r, c1, f1, e_c0, e_d0, e_d1, e_f0,
            key0, shared_a, pk_b, l, b)

        got = mk_tgsw_encrypt_core(
            jnp.int32(message), jnp.asarray(r), jnp.asarray(c1),
            jnp.asarray(f1), jnp.asarray(e_c0), jnp.asarray(e_d0),
            jnp.asarray(e_d1), jnp.asarray(e_f0),
            jnp.asarray(key0)[None], jnp.asarray(shared_a),
            jnp.asarray(pk_b), l, b)
        np.testing.assert_array_equal(np.asarray(got.cd), want)
