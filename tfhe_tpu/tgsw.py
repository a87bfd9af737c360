"""TGSW (gadget/GSW) encryption, signed decomposition, external product.

TPU-native counterpart of the reference's TGSW layer
(reference: src/tgsw.jl:1-129). A TGSW sample is one int32 array
`[..., l, k+1, k+1, N]` (decomposition row, TLWE row, poly index, coeff).
The external product is a single int8 MXU contraction (ops/conv.py) instead
of the reference's decompose -> FFT -> pointwise -> iFFT pipeline
(src/tgsw.jl:125-129); exactness per SURVEY.md section 2 item 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .tlwe import TLweSample, tlwe_encrypt_zero, tlwe_encrypt_zero_core
from .ops import conv


@functools.lru_cache(maxsize=None)
def gadget_values(decomp_length: int, log2_base: int):
    """Nonzero gadget entries 2^(32 - (i+1)*b) as int32 (NumPy constant —
    lru_cache must never hold jnp arrays: one first materialized inside a
    jit trace is a tracer, and the cache leaks it into later traces).

    Reference: src/tgsw.jl:12-14.
    """
    import numpy as np

    vals = [1 << (32 - (i + 1) * log2_base) for i in range(decomp_length)]
    return np.asarray(vals, np.uint32).astype(np.int32)


@functools.lru_cache(maxsize=None)
def decomp_offset(decomp_length: int, log2_base: int,
                  balanced: bool = False) -> int:
    """offset = (B/2) * sum(gadget) as a wrapped int32. Reference: src/tgsw.jl:16-20.

    With balanced=True, an extra half-ulp (2^(31 - l*b)) is folded in, which
    turns the decomposition's truncation into ROUND-TO-NEAREST (ties toward
    +inf): the reconstruction error becomes zero-mean in [-ulp/2, +ulp/2]
    instead of carrying the reference construction's -ulp/2 bias — the bias
    whose key-convolved phase error is O(N*ulp) per CMUX step
    (noise.py:decompose_bias_var; docs/params_fast.md). The reference uses
    the same nearest-rounding idea in its keyswitch (src/keyswitch.jl:58-59
    `prec_offset`) but not in its gadget; `balanced` brings the gadget in
    line. decompose(0) == 0 is preserved: 0 + ulp/2 truncates to 0.
    """
    import numpy as np

    g = np.asarray(
        [1 << (32 - (i + 1) * log2_base) for i in range(decomp_length)], np.uint64
    )
    total = int(g.sum()) * (1 << (log2_base - 1))
    if balanced and decomp_length * log2_base < 32:
        # l*b == 32 decomposes exactly (ulp = 1): nothing to balance
        total += 1 << (31 - decomp_length * log2_base)
    return int(np.uint32(total & 0xFFFFFFFF).astype(np.int32))


def decompose(poly, decomp_length: int, log2_base: int,
              balanced: bool = False):
    """Signed base-2^b digit decomposition of a torus polynomial.

    poly: int32[..., N] -> int32[..., l, N], digits in [-B/2, B/2), satisfying
    sum_j digit_j * gadget_j == poly rounded to l*b bits (exactly, mod 2^32;
    truncation-rounded for balanced=False — the reference-exact construction
    — and nearest-rounded for balanced=True, see `decomp_offset`).
    decompose(0) == 0 in BOTH modes, which is what makes the branchless
    blind rotate exact (SURVEY.md section 2 item 3).
    Reference: src/tgsw.jl:99-117.
    """
    offset = jnp.int32(decomp_offset(decomp_length, log2_base, balanced))
    mask = jnp.int32((1 << log2_base) - 1)
    half = jnp.int32(1 << (log2_base - 1))
    shifted = jnp.asarray(poly, jnp.int32) + offset
    shifts = jnp.asarray(
        [32 - (p + 1) * log2_base for p in range(decomp_length)], jnp.int32
    )
    digits = (shifted[..., None, :] >> shifts[:, None]) & mask
    return digits - half


def tgsw_add_gadget_times_message(samples, message, decomp_length: int, log2_base: int):
    """samples: int32[..., l, k+1, k+1, N]; adds message * gadget[i] to the
    constant coefficient of the diagonal blocks (i, j, j).

    Reference: src/tgsw.jl:52-72 (poly + scalar adds to the constant term,
    DarkIntegers semantics per SURVEY.md C2).
    """
    kp1 = samples.shape[-3]
    n = samples.shape[-1]
    g = gadget_values(decomp_length, log2_base)  # [l]
    message = jnp.asarray(message, jnp.int32)
    eye = jnp.eye(kp1, dtype=jnp.int32)  # [j, c]
    const_coeff = jnp.zeros((n,), jnp.int32).at[0].set(1)
    bump = (
        message[..., None, None, None, None]
        * g[:, None, None, None]
        * eye[:, :, None]
        * const_coeff
    )
    return samples + bump


def tgsw_encrypt_zero_core(a_parts, noises_t32, key) -> jax.Array:
    """l*(k+1) homogeneous TLWE encryptions with injected randomness.

    a_parts: int32[..., l, k+1, k, N]; noises_t32: int32[..., l, k+1, N];
    key: int32[k, N]. Returns int32[..., l, k+1, k+1, N].
    Reference: src/tgsw.jl:75-81.
    """
    return tlwe_encrypt_zero_core(a_parts, noises_t32, key).a


def tgsw_encrypt(rng, message, alpha: float, key, decomp_length: int,
                 log2_base: int, batch_shape=()) -> jax.Array:
    """Fresh TGSW encryption(s) of small int message(s).

    message: int32 [...] broadcastable to batch_shape.
    Returns int32[..., l, k+1, k+1, N]. Reference: src/tgsw.jl:84-88.
    """
    k = key.shape[0]
    zero = tlwe_encrypt_zero(
        rng, alpha, key, batch_shape + (decomp_length, k + 1)
    ).a
    return tgsw_add_gadget_times_message(zero, message, decomp_length, log2_base)


def prepare_tgsw(gsw, decomp_length: int, log2_base: int):
    """Reorder + limb-split a TGSW sample for the external-product contraction.

    gsw: int32[..., l(i), k+1(j), k+1(c), N] -> int8[..., 4, (k+1)*l, k+1, 2N]
    with the contraction dim ordered j-major (matching the decomposition
    layout [..., k+1(j), l(i), N] flattened). The analogue of the reference
    pre-transforming its bootstrap key (src/bootstrap.jl:12).
    """
    moved = jnp.moveaxis(gsw, -4, -3)  # [..., k+1(j), l(i), k+1(c), N]
    shape = moved.shape
    p = shape[-4] * shape[-3]
    flat = moved.reshape(shape[:-4] + (p,) + shape[-2:])  # [..., P, k+1, N]
    return conv.prepare_shared_torus(flat)  # [..., 4, P, k+1, 2N]


def tgsw_extern_mul_prepared(accum: TLweSample, gsw_limbs,
                             decomp_length: int, log2_base: int,
                             balanced: bool = False) -> TLweSample:
    """External product gsw (x) accum with a prepared (limb-split) TGSW operand.

    accum: TLweSample with a[B, k+1, N] (exactly one batch dim);
    gsw_limbs: int8[4, P, k+1, 2N]. out[c] = sum_{j,i} conv(digits[j,i], gsw[i,j,c]).
    Reference: src/tgsw.jl:125-129.
    """
    b, kp1, n = accum.a.shape
    digits = decompose(accum.a, decomp_length, log2_base, balanced)
    digits = digits.reshape(b, kp1 * decomp_length, n)  # j-major
    out = conv.poly_mul_prepared(digits, gsw_limbs, log2_base - 1)
    return TLweSample(out, accum.cv)


def tgsw_extern_mul(accum: TLweSample, gsw, decomp_length: int,
                    log2_base: int, balanced: bool = False) -> TLweSample:
    """External product against a coefficient-domain TGSW sample
    (gsw: int32[l, k+1, k+1, N]); accum batched [B, k+1, N]."""
    return tgsw_extern_mul_prepared(
        accum, prepare_tgsw(gsw, decomp_length, log2_base),
        decomp_length, log2_base, balanced,
    )
