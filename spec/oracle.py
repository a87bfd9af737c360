"""Executable NumPy spec of TFHE gate bootstrapping — the bit-exactness oracle.

Single-sample, loop-based, exact int32 semantics of the reference's layers
C1-C8 (SURVEY.md section 2): torus numerics (src/numeric-functions.jl),
negacyclic ring (src/polynomials.jl + DarkIntegers), LWE (src/lwe.jl),
TLWE (src/tlwe.jl), TGSW (src/tgsw.jl), keyswitch (src/keyswitch.jl) and
bootstrap (src/bootstrap.jl). All randomness is injected (pre-sampled arrays),
so the oracle and the JAX framework can be fed identical draws and compared
word-for-word (SURVEY.md section 4: the reference's MersenneTwister stream is
not reproducible under jax.random, so bit-exactness is checked on the
deterministic cores).

Everything is arithmetic mod 2^32 on int32 words; intermediates go through
int64 and are wrapped back explicitly so NumPy never saturates or raises.
"""

from __future__ import annotations

import numpy as np


def w32(x):
    """Wrap any integer array to int32 (arithmetic mod 2^32)."""
    return np.asarray(x).astype(np.int64).astype(np.uint32).astype(np.int32)


# --- C1: torus numerics (src/numeric-functions.jl) ---


def encode_message(mu: int, message_space: int) -> np.int32:
    log2_ms = message_space.bit_length() - 1
    return w32(mu << (32 - log2_ms))


def decode_message(phase, message_space: int):
    log2_ms = message_space.bit_length() - 1
    shifted = w32(np.asarray(phase, np.int64) + (1 << (32 - log2_ms - 1)))
    return shifted >> (32 - log2_ms)  # arithmetic shift on int32


def dtot32(d):
    """trunc(d * 2^32) in float32, mirroring the framework's noise pipeline."""
    return np.trunc(np.asarray(d, np.float32) * np.float32(2.0**32)).astype(np.int32)


# --- C2: negacyclic ring (src/polynomials.jl, DarkIntegers) ---


def negacyclic_mul(x, y):
    """Exact (x * y) mod (x^N + 1, 2^32): schoolbook via the negacyclic
    Toeplitz of y in int64 (vectorised but semantically the double loop
    out[m+u (mod N, sign-flipped past N)] += x[m] * y[u])."""
    n = len(x)
    r = np.arange(n)[None, :]
    m = np.arange(n)[:, None]
    toep = np.where(r >= m, 1, -1) * np.asarray(y, np.int64)[(r - m) % n]
    return w32(np.asarray(x, np.int64) @ toep)


def mul_by_monomial(p, shift):
    """p * x^shift mod (x^N + 1), any integer shift."""
    n = len(p)
    doubled = np.concatenate([p, w32(-np.asarray(p, np.int64))])
    idx = (np.arange(n) - int(shift)) % (2 * n)
    return doubled[idx]


def reverse_polynomial(p):
    """p(x) -> p(1/x): out[0] = p[0], out[r] = -p[N-r]."""
    n = len(p)
    out = np.empty(n, np.int64)
    out[0] = p[0]
    for r in range(1, n):
        out[r] = -np.int64(p[n - r])
    return w32(out)


# --- C4: LWE (src/lwe.jl) ---


def lwe_encrypt_core(message, a, noise_t32, key):
    """b = message + noise + <a, s> (all wrapping). a: [n], key: [n] in {0,1}."""
    b = np.int64(message) + np.int64(noise_t32)
    b += np.sum(np.asarray(a, np.int64) * np.asarray(key, np.int64))
    return w32(b)


def lwe_phase(a, b, key):
    return w32(np.int64(b) - np.sum(np.asarray(a, np.int64) * np.asarray(key, np.int64)))


# --- C5: TLWE (src/tlwe.jl) ---


def tlwe_encrypt_zero_core(a_part, noise_poly_t32, key):
    """a_part: [k, N] uniform torus, key: [k, N] binary.
    Returns full sample [k+1, N] with body = noise + sum_i s_i * a_i."""
    k, n = a_part.shape
    body = np.asarray(noise_poly_t32, np.int64)
    for i in range(k):
        body = body + negacyclic_mul(key[i], a_part[i]).astype(np.int64)
    return np.concatenate([a_part, w32(body)[None]], axis=0)


def extract_lwe_key(tlwe_key):
    return tlwe_key.reshape(-1)  # [k*N]


def tlwe_extract_sample(sample):
    """[k+1, N] -> LWE (a: [k*N], b) via reverse_polynomial of each mask poly."""
    a = np.concatenate([reverse_polynomial(p) for p in sample[:-1]])
    b = sample[-1][0]
    return a, b


# --- C6: TGSW (src/tgsw.jl) ---


def gadget_values(decomp_length, log2_base):
    return w32([1 << (32 - (i + 1) * log2_base) for i in range(decomp_length)])


def decomp_offset(decomp_length, log2_base, balanced=False):
    """balanced=True folds in an extra half-ulp so the truncating offset
    trick becomes round-to-nearest (zero-mean reconstruction error; the
    framework's `gadget_balanced` scheme option — see tfhe_tpu/tgsw.py)."""
    g = gadget_values(decomp_length, log2_base).astype(np.uint32)
    total = int(g.sum(dtype=np.uint64)) * (1 << (log2_base - 1))
    if balanced and decomp_length * log2_base < 32:
        total += 1 << (31 - decomp_length * log2_base)
    return w32(total)


def decompose(poly, decomp_length, log2_base, balanced=False):
    """Signed base-2^log2_base digit decomposition: [l, N], digits in [-B/2, B/2)."""
    offset = np.int64(decomp_offset(decomp_length, log2_base, balanced))
    mask = (1 << log2_base) - 1
    half = 1 << (log2_base - 1)
    shifted = w32(np.asarray(poly, np.int64) + offset)
    out = []
    for power in range(1, decomp_length + 1):
        digits = ((shifted >> (32 - power * log2_base)) & mask) - half
        out.append(digits.astype(np.int32))
    return np.stack(out)


def tgsw_add_gadget_times_message(samples, message, decomp_length, log2_base):
    """samples: [l, k+1, k+1, N]; adds message * gadget[i] to diagonal blocks."""
    out = samples.copy()
    g = gadget_values(decomp_length, log2_base)
    kp1 = samples.shape[1]
    for i in range(decomp_length):
        for j in range(kp1):
            out[i, j, j, 0] = w32(np.int64(out[i, j, j, 0]) + np.int64(message) * np.int64(g[i]))
    return out


def tgsw_extern_mul(accum, gsw, decomp_length, log2_base, balanced=False):
    """accum: [k+1, N]; gsw: [l, k+1, k+1, N] (coefficient domain).
    out[c] = sum_{i,j} decompose(accum[j])[i] * gsw[i, j, c]."""
    kp1 = accum.shape[0]
    n = accum.shape[1]
    out = np.zeros((kp1, n), np.int64)
    for j in range(kp1):
        digits = decompose(accum[j], decomp_length, log2_base, balanced)
        for i in range(decomp_length):
            for c in range(kp1):
                out[c] += negacyclic_mul(digits[i], gsw[i, j, c]).astype(np.int64)
    return w32(out)


# --- C7: keyswitch (src/keyswitch.jl) ---


def keyswitch_digits(a, decomp_length, log2_base):
    """Round a to l*b bits and extract [len(a), l] digits in [0, B)."""
    prec_offset = np.int64(1 << (32 - (1 + log2_base * decomp_length)))
    mask = (1 << log2_base) - 1
    aibar = w32(np.asarray(a, np.int64) + prec_offset)
    return np.stack(
        [((aibar >> (32 - (j + 1) * log2_base)) & mask) for j in range(decomp_length)],
        axis=1,
    )


def keyswitch(ks_a, ks_b, sample_a, sample_b, decomp_length, log2_base):
    """ks_a: [base-1, l, n_in, n_out], ks_b: [base-1, l, n_in]; h index 0 <-> digit 1.
    Returns (a_out [n_out], b_out)."""
    n_in = len(sample_a)
    digits = keyswitch_digits(sample_a, decomp_length, log2_base)
    a_out = np.zeros(ks_a.shape[-1], np.int64)
    b_out = np.int64(sample_b)
    for i in range(n_in):
        for j in range(decomp_length):
            h = digits[i, j]
            if h != 0:
                a_out -= ks_a[h - 1, j, i].astype(np.int64)
                b_out -= np.int64(ks_b[h - 1, j, i])
    return w32(a_out), w32(b_out)


# --- C8: bootstrap (src/bootstrap.jl) ---


def mux_rotate(accum, gsw, barai, decomp_length, log2_base, balanced=False):
    """accum += gsw (x) [(x^barai - 1) * accum]."""
    temp = w32(
        np.stack([mul_by_monomial(p, barai) for p in accum]).astype(np.int64)
        - accum.astype(np.int64)
    )
    return w32(
        accum.astype(np.int64)
        + tgsw_extern_mul(temp, gsw, decomp_length, log2_base,
                          balanced).astype(np.int64)
    )


def blind_rotate(accum, bk, bara, decomp_length, log2_base, balanced=False):
    """bk: [n, l, k+1, k+1, N] coefficient-domain TGSW keys; bara: [n] in [0, 2N)."""
    for i in range(len(bara)):
        if bara[i] != 0:
            accum = mux_rotate(accum, bk[i], int(bara[i]), decomp_length,
                               log2_base, balanced)
    return accum


def blind_rotate_and_extract(v, bk, barb, bara, mask_size, decomp_length, log2_base):
    testvectbis = mul_by_monomial(v, -int(barb))
    n = len(v)
    accum = np.concatenate(
        [np.zeros((mask_size, n), np.int32), testvectbis[None]], axis=0
    )
    accum = blind_rotate(accum, bk, bara, decomp_length, log2_base)
    return tlwe_extract_sample(accum)


def bootstrap_wo_keyswitch(bk, mu, sample_a, sample_b, poly_degree, mask_size,
                           decomp_length, log2_base):
    bara = decode_message(sample_a, poly_degree * 2).astype(np.int32)
    barb = decode_message(sample_b, poly_degree * 2)
    testvect = np.full(poly_degree, mu, np.int32)
    return blind_rotate_and_extract(
        testvect, bk, barb, bara, mask_size, decomp_length, log2_base
    )
