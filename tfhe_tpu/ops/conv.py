"""Exact negacyclic convolution engines (the FFTW replacement).

The reference multiplies polynomials mod x^N+1 with a float64 tangent FFT
(reference: src/polynomials.jl:44-144) whose rounding recovers the exact
integer convolution provided the small operand stays below ~11 bits
(src/polynomials.jl:135-141). Torus arithmetic is mod 2^32, so *any* exact
convolution mod 2^32 reproduces the reference bit-for-bit (SURVEY.md section 2,
bit-exactness contract item 2). On TPU we therefore skip floating transforms
entirely and compute the convolution as integer matrix products:

* int32 two's-complement wraparound IS arithmetic mod 2^32, and
* the MXU natively contracts int8 x int8 -> int32, so splitting the torus
  operand into four balanced signed 8-bit limbs turns a negacyclic convolution
  into int8 matmuls against a negacyclic Toeplitz matrix, recombined with
  shifts mod 2^32. Partial sums are bounded by 2^7 * 2^7 * N <= 2^24 << 2^31,
  so every step is exact.

Two orientations, chosen by which operand is shared across the batch:

* `poly_mul_batched_small`: Toeplitz of the *torus* operand (e.g. the
  bootstrap-key step, shared by every ciphertext in the batch); the batched
  small operand (decomposition digits) rides the matmul M dimension. This is
  the blind-rotate hot path.
* `poly_mul_batched_torus`: Toeplitz of the *small* operand (e.g. the binary
  secret key, shared by every encryption); the batched torus operand is limb
  split. This is the keygen hot path.
* `negacyclic_mul`: plain pairwise int32 einsum for low-volume paths.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

_I32 = jnp.int32
_I8 = jnp.int8


@functools.lru_cache(maxsize=None)
def _doubled_toeplitz_index(n: int):
    """Static [N(m), N(r)] gather index (r - m) mod 2N into the doubled array
    t2 = [t, -t], which encodes the negacyclic sign structure:
    T[m, r] = t2[(r - m) mod 2N] = sign(r, m) * t[(r - m) mod N].
    Then (d conv t)[r] = sum_m d[m] * T[m, r]  (exactly, mod 2^32).

    The negation lives in int32 (where -(-2^31) wraps correctly mod 2^32)
    BEFORE any limb split — negating int8 limbs would overflow at -128.

    Returns a NumPy constant (NOT a jnp array): this function is lru_cached
    and may first be called inside a jit trace — caching a traced array
    would leak the tracer into later traces.
    """
    import numpy as np

    r = np.arange(n)[None, :]
    m = np.arange(n)[:, None]
    return np.asarray((r - m) % (2 * n), np.int32)


def negacyclic_toeplitz(t):
    """t: [..., N] int32 -> Toeplitz [..., N(m), N(r)], T[m, r] = +-t[(r-m)%N]."""
    n = t.shape[-1]
    doubled = jnp.concatenate([t, -t], axis=-1)
    return jnp.take(doubled, _doubled_toeplitz_index(n), axis=-1)


def split_torus_limbs(x):
    """int32 [...] -> 4 balanced signed int8 limbs, x == sum_j limb_j * 2^(8j) (mod 2^32).

    astype(int8) wraps mod 256 into [-128, 128), giving the balanced low byte;
    subtracting it leaves an exact multiple of 256 for the arithmetic shift.
    """
    limbs = []
    cur = x
    for _ in range(3):
        b = cur.astype(_I8)
        limbs.append(b)
        cur = (cur - b.astype(_I32)) >> 8
    limbs.append(cur.astype(_I8))  # top limb only matters mod 2^8
    return jnp.stack(limbs)  # [4, ...]


def split_small_limbs(d, bound_bits: int):
    """Split small signed ints |d| <= 2^bound_bits into int8 limbs.

    Returns (limbs [S, ...] int8, shifts tuple of S ints). Decomposition
    digits lie in [-B/2, B/2]; for log2_base <= 7 a single limb suffices
    (128-bit preset, B=2^7). For larger bases (80-bit preset, B=2^10) we
    split base-16: d = hi*16 + lo with lo in [-8, 8), |hi| <= (2^bound+8)/16.
    """
    if bound_bits <= 7:
        return d.astype(_I8)[None], (0,)
    lo = ((d & 15) ^ 8) - 8
    hi = (d - lo) >> 4
    assert bound_bits <= 11, "small operand too large for two int8 limbs"
    return jnp.stack([lo.astype(_I8), hi.astype(_I8)]), (0, 4)


def _i8_matmul(a, b):
    """Exact int8 x int8 -> int32 contraction (MXU-native on TPU)."""
    return lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), preferred_element_type=_I32
    )


def prepare_shared_torus(t_shared):
    """Precompute the limb-doubled form of shared torus operands.

    t_shared: [..., P, K, N] int32 -> [..., 4, P, K, 2N] int8, the static
    per-key representation consumed by `poly_mul_prepared` (built once at
    keygen, analogous to the reference storing its bootstrap key
    pre-transformed, src/bootstrap.jl:12). Double-and-negate happens in int32
    (exact mod 2^32) BEFORE the limb split — negating int8 limbs would
    overflow at -128.
    """
    doubled = jnp.concatenate([t_shared, -t_shared], axis=-1)  # [..., P, K, 2N]
    limbs = split_torus_limbs(doubled)  # [4, ..., P, K, 2N] int8
    return jnp.moveaxis(limbs, 0, -4)  # [..., 4, P, K, 2N]


def poly_mul_prepared(digits, t_limbs_doubled, small_bound_bits: int,
                      max_toeplitz_bytes: int = 256 * 2**20):
    """out[b, k] = sum_p negacyclic_conv(digits[b, p], t[p, k]), mod 2^32.

    digits:          [B, P, N] int32, |digits| <= 2^small_bound_bits
    t_limbs_doubled: [4, P, K, 2N] int8 from `prepare_shared_torus`
    returns          [B, K, N] int32

    The torus side becomes a limb Toeplitz [P*N, K*4*N] int8 shared by the
    whole batch; the digits ride the matmul M dimension. When the full
    Toeplitz would exceed `max_toeplitz_bytes` (large multi-key operands:
    4*P*K*N^2 grows as parties^2), the contraction is chunked over P —
    int32 sums commute exactly, so chunking is bit-identical. This is the
    external-product hot kernel (reference: src/tgsw.jl:125-129).
    """
    B, P, n = digits.shape
    K = t_limbs_doubled.shape[-2]
    d_limbs, d_shifts = split_small_limbs(digits, small_bound_bits)  # [S, B, P, N]
    S = d_limbs.shape[0]

    full_bytes = 4 * P * K * n * n
    p_chunk = P
    if full_bytes > max_toeplitz_bytes:
        p_chunk = max(1, P * max_toeplitz_bytes // full_bytes)

    prods = jnp.zeros((S * B, K * 4 * n), _I32)
    idx = _doubled_toeplitz_index(n)
    for p0 in range(0, P, p_chunk):
        p1 = min(P, p0 + p_chunk)
        toep = jnp.take(t_limbs_doubled[:, p0:p1], idx, axis=-1)
        # [4, pc, K, N(m), N(r)] -> [pc*N(m), K*4*N(r)]
        toep = toep.transpose(1, 3, 2, 0, 4).reshape((p1 - p0) * n, K * 4 * n)
        lhs = d_limbs[:, :, p0:p1].reshape(S * B, (p1 - p0) * n)
        prods = prods + _i8_matmul(lhs, toep)
    prods = prods.reshape(S, B, K, 4, n)

    out = jnp.zeros((B, K, n), _I32)
    for s in range(S):
        for j in range(4):
            shift = d_shifts[s] + 8 * j
            if shift < 32:
                out = out + (prods[s, :, :, j, :] << shift)
    return out


def poly_mul_batched_small(digits, t_shared, small_bound_bits: int):
    """One-shot form of `poly_mul_prepared` (limb prep inlined).

    digits:   [B, P, N] int32 (batched, varies); t_shared: [P, K, N] int32
    (shared across batch); returns [B, K, N] int32.
    """
    return poly_mul_prepared(
        digits, prepare_shared_torus(t_shared), small_bound_bits
    )


@functools.lru_cache(maxsize=None)
def _block_toeplitz_index(n: int, t: int):
    """Static [2M, T, T] index (d*T + w - u) mod 2N into the doubled array,
    M = N/T. Block (i, o) of the full negacyclic Toeplitz equals baked block
    d = (o - i) mod 2M, so the N x N Toeplitz never has to be materialized at
    gate time. NumPy constant (lru_cache must never hold traced arrays)."""
    import numpy as np

    m2 = 2 * n // t
    d = np.arange(m2)[:, None, None]
    u = np.arange(t)[None, :, None]
    w = np.arange(t)[None, None, :]
    idx = ((d * t + w - u) % (2 * n)).astype(np.int32)
    # PERMUTED storage: baked[j] holds block shift (M - 1 - j) mod 2M. With
    # this layout the weight window of output block o is ONE contiguous,
    # never-wrapping slice: digit block i pairs with baked[(M-1-o) + i]
    # (i + M-1-o <= 2M-2 < 2M), which the Pallas matmul kernel consumes as a
    # single dot operand with zero copies.
    m = n // t
    return idx[(m - 1 - np.arange(m2)) % m2]


def bake_block_toeplitz(limbs_doubled, t: int, chunk: int = 16):
    """Pre-gather the blocked Toeplitz form of prepared torus operands.

    limbs_doubled: [n_steps, 4, P, K, 2N] int8 (prepare_shared_torus output)
    returns E:     [n_steps, 2M, P*T, K*4*T] int8, rows (p, u), cols (k, limb, w)

    This is the keygen-time replacement for the per-step Toeplitz gather:
    TPU gathers run ~2 Gelem/s while int8 matmuls run hundreds of TOP/s, so
    all gathers are baked into the key. Memory: n * 2N * P * K*4 * T bytes
    (4.0 GB for the 128-bit preset at T=64) — the TPU-resident analogue of
    the reference's pre-FFT'd bootstrap key (src/bootstrap.jl:12). Baking
    runs in `chunk`-step pieces via lax.map so the gather/transpose temps
    stay bounded (~2 * chunk/n of the final size) instead of OOMing HBM.
    """
    steps, four, p, k, n2 = limbs_doubled.shape
    n = n2 // 2
    assert n % t == 0, (n, t)
    idx = jnp.asarray(_block_toeplitz_index(n, t).reshape(-1))  # [2M*T*T]
    m2 = 2 * n // t

    def bake_steps(limbs):  # [c, 4, P, K, 2N] -> [c, 2M*P*T, K*4*T]
        e = jnp.take(limbs, idx, axis=-1)
        e = e.reshape(limbs.shape[:-1] + (m2, t, t))
        e = e.transpose(0, 4, 2, 5, 3, 1, 6)  # [c, 2M, P, T(u), K, 4, T(w)]
        # Stored 2D (block rows flattened): weight windows are then plain 2D
        # row slices, which the Pallas kernel DMAs and feeds to the MXU
        # without any in-VMEM reshape/copy.
        return e.reshape(limbs.shape[0], m2 * p * t, k * 4 * t)

    if steps <= chunk:
        return bake_steps(limbs_doubled)
    # lax.map(batch_size=...) pads the leading dim if it doesn't divide; keep
    # it exact by splitting off the remainder.
    main = (steps // chunk) * chunk
    out = lax.map(
        lambda x: bake_steps(x),
        limbs_doubled[:main].reshape(steps // chunk, chunk, four, p, k, n2),
    ).reshape(main, m2 * p * t, k * 4 * t)
    if main < steps:
        out = jnp.concatenate([out, bake_steps(limbs_doubled[main:])], axis=0)
    return out


def block_toeplitz_matmul(d_limbs, e_step, t: int):
    """Negacyclic conv against a baked block-Toeplitz operand, exact MAC count.

    d_limbs: [S, B, P, N] int8 digit limbs; e_step: [2M*P*T, K*4*T] int8.
    Returns [S, B, M, K*4*T] int32 (output block o at row o, cols (k, limb, w)).

    out[o] = sum_i D[i] @ E[(o - i) mod 2M]; per baked block d the valid
    (i, o) pairs form a contiguous range, so the sum is 2M-1 dense matmuls
    with zero wasted MACs (sum over all d of valid pairs = M^2).
    """
    s, b, p, n = d_limbs.shape
    m = n // t
    m2 = 2 * m
    cols = e_step.shape[-1]
    e_step = e_step.reshape(m2, p * t, cols)
    dl = (
        d_limbs.reshape(s, b, p, m, t)
        .transpose(0, 1, 3, 2, 4)
        .reshape(s * b, m, p * t)
    )
    out = jnp.zeros((s * b, m, cols), jnp.int32)
    for d in range(m2):
        e_d = e_step[(m - 1 - d) % m2]  # keys store the PERMUTED-d layout
        if d < m:
            vo = m - d  # o in [d, m), i = o - d in [0, vo)
            lhs = dl[:, 0:vo].reshape(s * b * vo, p * t)
            prod = _i8_matmul(lhs, e_d).reshape(s * b, vo, cols)
            out = out.at[:, d:m].add(prod)
        elif d > m:
            c = d - m  # o in [0, c), i = o - d + 2m in [2m - d, m)
            lhs = dl[:, 2 * m - d : m].reshape(s * b * c, p * t)
            prod = _i8_matmul(lhs, e_d).reshape(s * b, c, cols)
            out = out.at[:, 0:c].add(prod)
    return out.reshape(s, b, m, cols)


def recombine_block_prods(prods, k_out: int, d_shifts):
    """Recombine limb-plane partial products into int32 polynomials mod 2^32.

    prods: [S, B, M, K*4*T] int32 from `block_toeplitz_matmul`;
    d_shifts: per-digit-limb bit shifts from `split_small_limbs`.
    Returns [B, K, N] int32.
    """
    s, b, m, cols = prods.shape
    t = cols // (k_out * 4)
    pr = prods.reshape(s, b, m, k_out, 4, t)
    acc = jnp.zeros((b, k_out, m, t), jnp.int32)
    for si in range(s):
        for j in range(4):
            shift = int(d_shifts[si]) + 8 * j
            if shift < 32:
                acc = acc + (jnp.swapaxes(pr[si, :, :, :, j, :], 1, 2) << shift)
    return acc.reshape(b, k_out, m * t)


def poly_mul_batched_torus(a_batch, s_shared):
    """out[b] = sum_p negacyclic_conv(s_shared[p], a_batch[b, p]), mod 2^32.

    a_batch:  [B, P, N] int32 torus polynomials (batched, varies)
    s_shared: [P, N] small ints fitting int8 (e.g. binary key; shared)
    returns   [B, N] int32

    Toeplitz of the small shared operand; the batched torus side is limb
    split. This is the keygen hot path (reference: src/tlwe.jl:63-73 summing
    transformed_mul(key, a)).
    """
    B, P, n = a_batch.shape
    # Sign handling in int32 via negacyclic_toeplitz, then narrow to int8
    # (safe: |s| <= 127 by contract, so +-s fits int8).
    toep = negacyclic_toeplitz(s_shared.astype(_I32)).astype(_I8)  # [P, N(m), N(r)]
    toep = toep.reshape(P * n, n)
    a_limbs = split_torus_limbs(a_batch)  # [4, B, P, N]
    prods = _i8_matmul(a_limbs.reshape(4 * B, P * n), toep)  # [4*B, N]
    prods = prods.reshape(4, B, n)
    out = jnp.zeros((B, n), _I32)
    for j in range(4):
        out = out + (prods[j] << (8 * j))
    return out


def poly_mul_batched_torus_multi(a_batch, s_shared):
    """out[b, k] = sum_p negacyclic_conv(s_shared[k, p], a_batch[b, p]), mod 2^32.

    a_batch:  [B, P, N] int32 torus polynomials (batched, varies)
    s_shared: [K, P, N] small ints fitting int8 (shared across batch)
    returns   [B, K, N] int32

    Multi-output variant of `poly_mul_batched_torus`: one Toeplitz of the
    shared small operand ([P*N, K*N] int8) serves every batch element and
    every output k — used by the MK expansion where the gadget digits of
    public-key differences are shared while f0/f1 vary per uni-encryption
    (reference contraction: src/mk_internals.jl:319-336).
    """
    b, p, n = a_batch.shape
    k = s_shared.shape[0]
    toep = negacyclic_toeplitz(s_shared.astype(_I32)).astype(_I8)  # [K,P,N,N]
    toep = toep.transpose(1, 2, 0, 3).reshape(p * n, k * n)
    a_limbs = split_torus_limbs(a_batch)  # [4, B, P, N]
    prods = _i8_matmul(a_limbs.reshape(4 * b, p * n), toep)
    prods = prods.reshape(4, b, k, n)
    out = jnp.zeros((b, k, n), _I32)
    for j in range(4):
        out = out + (prods[j] << (8 * j))
    return out


def negacyclic_mul(x_small, y_torus):
    """Pairwise exact negacyclic product, broadcasting leading dims.

    x_small: [..., N] int32 (the small operand), y_torus: [..., N] int32.
    Materialises the Toeplitz of y ([..., N, N] int32), so reserve this for
    low-volume paths (parameter-sized key ceremonies, unit tests).
    """
    toep = negacyclic_toeplitz(y_torus)  # [..., N(m), N(r)]
    return jnp.einsum(
        "...m,...mr->...r", x_small, toep, preferred_element_type=_I32
    ).astype(_I32)
