"""Executable NumPy spec of multi-key TFHE (MK-TFHE) — bit-exactness oracle.

Single-sample, loop-based, exact int32 semantics of the reference's MK layers
C11-C18 (SURVEY.md section 2): MK samples, shared/public keys, uni-encryption,
ciphertext expansion, MK external product, MK blind rotate and keyswitch
(reference: src/mk_internals.jl:1-515). All randomness is injected.
mask_size k = 1 throughout (hardcoded in the reference, issue #2 noted at
src/mk_internals.jl:129-131).
"""

from __future__ import annotations

import numpy as np

from .oracle import (
    decode_message,
    decompose,
    gadget_values,
    keyswitch,
    mul_by_monomial,
    negacyclic_mul,
    reverse_polynomial,
    w32,
)


# --- C13: shared / public keys (src/mk_internals.jl:101-139) ---


def public_key_core(tlwe_key, shared_a, noise_t32):
    """b_i = s * a_i + e_i. tlwe_key: [N] binary; shared_a, noise: [l, N]."""
    return np.stack([
        w32(negacyclic_mul(tlwe_key, shared_a[i]).astype(np.int64)
            + noise_t32[i].astype(np.int64))
        for i in range(shared_a.shape[0])
    ])


# --- C14: uni-encryption (src/mk_internals.jl:185-227) ---


def mk_tgsw_encrypt_core(message, r, c1, f1, noises, tlwe_key, shared_a, pk_b,
                         decomp_length, log2_base):
    """RGSW.UniEnc with injected randomness.

    message: int; r: [N] binary; c1, f1: [l, N] uniform torus;
    noises: dict with 'c0', 'd0', 'd1', 'f0' each [l, N] int32;
    tlwe_key: [N] binary; shared_a, pk_b: [l, N].
    Returns dict of c0, c1, d0, d1, f0, f1 (each [l, N] int32).
    """
    g = gadget_values(decomp_length, log2_base).astype(np.int64)
    l = decomp_length
    c0 = np.empty((l, len(r)), np.int32)
    d0 = np.empty_like(c0)
    d1 = np.empty_like(c0)
    f0 = np.empty_like(c0)
    for i in range(l):
        # poly + scalar adds to the constant coefficient (DarkIntegers)
        mg = np.zeros(len(r), np.int64)
        mg[0] = np.int64(message) * g[i]
        c0[i] = w32(noises['c0'][i].astype(np.int64)
                    + negacyclic_mul(tlwe_key, c1[i]).astype(np.int64) + mg)
        d1[i] = w32(noises['d1'][i].astype(np.int64)
                    + negacyclic_mul(r, shared_a[i]).astype(np.int64) + mg)
        d0[i] = w32(noises['d0'][i].astype(np.int64)
                    + negacyclic_mul(r, pk_b[i]).astype(np.int64))
        rg = np.zeros(len(r), np.int64)
        rg[:] = r.astype(np.int64) * g[i]
        f0[i] = w32(noises['f0'][i].astype(np.int64)
                    + negacyclic_mul(tlwe_key, f1[i]).astype(np.int64) + rg)
    return dict(c0=c0, c1=np.asarray(c1, np.int32), d0=d0, d1=d1,
                f0=f0, f1=np.asarray(f1, np.int32))


# --- C15: expansion (src/mk_internals.jl:304-345) ---


def mk_tgsw_expand(ue, party, pk_bs, decomp_length, log2_base):
    """RGSW.Expand. ue: dict from mk_tgsw_encrypt_core; party: int;
    pk_bs: [parties, l, N]. Returns dict x, y: [l, parties, N]; c0, c1: [l, N].
    """
    parties, l, n = pk_bs.shape
    x = np.empty((l, parties, n), np.int32)
    y = np.empty((l, parties, n), np.int32)
    for j in range(l):
        for i in range(parties):
            if i == party:
                x[j, i] = ue['d0'][j]
                y[j, i] = ue['d1'][j]
            else:
                diff = w32(pk_bs[i, j].astype(np.int64)
                           - pk_bs[party, j].astype(np.int64))
                dec = decompose(diff, decomp_length, log2_base)  # [l, N]
                xs = ue['d0'][j].astype(np.int64).copy()
                ys = np.zeros(n, np.int64)
                for ll in range(decomp_length):
                    xs += negacyclic_mul(dec[ll], ue['f0'][ll]).astype(np.int64)
                    ys += negacyclic_mul(dec[ll], ue['f1'][ll]).astype(np.int64)
                x[j, i] = w32(xs)
                y[j, i] = w32(ys)
    return dict(x=x, y=y, c0=ue['c0'], c1=ue['c1'])


# --- C16: MK external product (src/mk_internals.jl:348-391) ---


def mk_tgsw_extern_mul(sample_a, sample_b, exp, party, parties,
                       decomp_length, log2_base, balanced=False):
    """sample_a: [parties, N] masks; sample_b: [N] body; exp: dict from
    mk_tgsw_expand. Returns (a' [parties, N], b' [N])."""
    n = sample_b.shape[0]
    l = decomp_length
    dec_a = np.stack([decompose(sample_a[i], l, log2_base, balanced)
                      for i in range(parties)], axis=1)  # [l, parties, N]
    dec_b = decompose(sample_b, l, log2_base, balanced)  # [l, N]

    a_out = np.zeros((parties, n), np.int64)
    for i in range(parties):
        if i == party:
            for ll in range(l):
                for j in range(parties):
                    a_out[i] += negacyclic_mul(
                        dec_a[ll, j], exp['y'][ll, j]).astype(np.int64)
                a_out[i] += negacyclic_mul(
                    dec_b[ll], exp['c1'][ll]).astype(np.int64)
        else:
            for ll in range(l):
                a_out[i] += negacyclic_mul(
                    dec_a[ll, i], exp['y'][ll, party]).astype(np.int64)
    b_out = np.zeros(n, np.int64)
    for ll in range(l):
        for i in range(parties):
            b_out += negacyclic_mul(dec_a[ll, i], exp['x'][ll, i]).astype(np.int64)
        b_out += negacyclic_mul(dec_b[ll], exp['c0'][ll]).astype(np.int64)
    return w32(a_out), w32(b_out)


# --- C18: MK blind rotate / bootstrap (src/mk_internals.jl:464-515) ---


def mk_mux_rotate(acc_a, acc_b, exp, barai, party, parties,
                  decomp_length, log2_base, balanced=False):
    rot_a = np.stack([mul_by_monomial(p, barai) for p in acc_a])
    rot_b = mul_by_monomial(acc_b, barai)
    t_a = w32(rot_a.astype(np.int64) - acc_a.astype(np.int64))
    t_b = w32(rot_b.astype(np.int64) - acc_b.astype(np.int64))
    d_a, d_b = mk_tgsw_extern_mul(
        t_a, t_b, exp, party, parties, decomp_length, log2_base, balanced)
    return (w32(acc_a.astype(np.int64) + d_a.astype(np.int64)),
            w32(acc_b.astype(np.int64) + d_b.astype(np.int64)))


def mk_blind_rotate(acc_a, acc_b, exps, bara, decomp_length, log2_base,
                    balanced=False):
    """exps: [parties][n] list of expanded samples; bara: [n, parties]."""
    parties = len(exps)
    n_lwe = len(exps[0])
    for i in range(parties):
        for j in range(n_lwe):
            if bara[j, i] != 0:
                acc_a, acc_b = mk_mux_rotate(
                    acc_a, acc_b, exps[i][j], int(bara[j, i]), i, parties,
                    decomp_length, log2_base, balanced)
    return acc_a, acc_b


def mk_bootstrap_wo_keyswitch(exps, mu, x_a, x_b, poly_degree,
                              decomp_length, log2_base, balanced=False):
    """x_a: [n, parties] masks (reference layout); x_b: scalar body."""
    parties = len(exps)
    bara = decode_message(x_a, poly_degree * 2).astype(np.int32)  # [n, parties]
    barb = decode_message(x_b, poly_degree * 2)
    testvect = np.full(poly_degree, mu, np.int32)
    testvectbis = mul_by_monomial(testvect, -int(barb))
    acc_a = np.zeros((parties, poly_degree), np.int32)
    acc_b = testvectbis
    acc_a, acc_b = mk_blind_rotate(
        acc_a, acc_b, exps, bara, decomp_length, log2_base, balanced)
    # extract (src/mk_internals.jl:88-95)
    a = np.stack([reverse_polynomial(p) for p in acc_a])  # [parties, N]
    b = acc_b[0]
    return a, b


def mk_keyswitch(ks_tables, sample_a, sample_b, decomp_length, log2_base):
    """ks_tables: [parties] of (ks_a, ks_b); sample_a: [parties, n_in]."""
    parties = len(ks_tables)
    n_out = ks_tables[0][0].shape[-1]
    a_out = np.zeros((parties, n_out), np.int64)
    b_out = np.int64(sample_b)
    for p in range(parties):
        pa, pb = keyswitch(ks_tables[p][0], ks_tables[p][1],
                           sample_a[p], np.int32(0), decomp_length, log2_base)
        a_out[p] = pa.astype(np.int64)
        b_out += np.int64(pb)
    return w32(a_out), w32(b_out)
