"""Radix-encoded integer arithmetic: one bootstrap per bit.

Capability extension beyond the reference (whose only word circuits are
bit-level bootstrapped gates, examples/tutorial.jl:42-62). Words are split
into base-4 digits (2 bits each) carried in the programmable-bootstrapping
encoding (pbs.py) with message space S = 8: a digit holds values 0..3, and
the headroom up to 7 absorbs digit+digit+carry before the LUT bootstrap
re-normalises. An add of a w-bit word then costs w/2 digit positions x 2
LUT rotations = **one blind rotation per bit**, vs 5/bit for the
ripple-carry gate adder (circuits.py) — the same radix decomposition used
by modern integer-FHE stacks, here riding the same baked keys and Pallas
megakernels as the gates.

Layout: a radix word batch is ONE LweSample with batch dims
[..., n_digits], least-significant digit first; the digit loop is the
(inherently sequential) carry chain while the word batch rides the MXU
batch dimension. The per-position sum and carry LUTs are evaluated in a
single PBS call via per-sample tables (pbs.py allows a stacked table
axis), so each digit position is one batched blind rotation of 2x the
word count.

Noise margin: the PBS input is digit+digit+carry — three bootstrap-fresh
samples — so the phase error is sqrt(3) x the per-sample noise against the
1/(4S) = 1/32 decision margin. At the 128-bit preset (sigma_out ~ 0.004)
that is a > 4.5 sigma margin per digit position; see
tests/test_radix.py for the decrypt-level checks and
docs/leveled_mode.md for why deeper-packed digits (S = 16+) are not safe
on the 32-bit torus.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .api import CloudKey, SecretKey
from .lwe import LweSample, lwe_noiseless_trivial
from .pbs import decrypt_pbs, encode_pbs, encrypt_pbs, programmable_bootstrap

BITS_PER_DIGIT = 2
DIGIT_BASE = 1 << BITS_PER_DIGIT  # 4
SPACE = 2 * DIGIT_BASE  # 8: one carry bit of headroom inside the padded half


def int_to_digits(values, n_digits: int):
    """int[...] -> int32[..., n_digits] base-4 digits, LSB first."""
    values = jnp.asarray(values, jnp.uint32)
    shifts = jnp.arange(n_digits, dtype=jnp.uint32) * BITS_PER_DIGIT
    return ((values[..., None] >> shifts) & (DIGIT_BASE - 1)).astype(jnp.int32)


def digits_to_int(digits):
    """int32[..., n_digits] -> uint32[...] (mod 2^32; wrap-exact for words
    up to 16 digits, which is the full torus word width)."""
    digits = jnp.asarray(digits, jnp.uint32)
    shifts = jnp.arange(digits.shape[-1], dtype=jnp.uint32) * BITS_PER_DIGIT
    return jnp.sum(digits << shifts, axis=-1, dtype=jnp.uint32)


def encrypt_radix(rng, key: SecretKey, values, bits: int) -> LweSample:
    """Encrypt int[...] as [..., bits/2] base-4 PBS digits."""
    assert bits % BITS_PER_DIGIT == 0
    return encrypt_pbs(rng, key, int_to_digits(values, bits // BITS_PER_DIGIT),
                       SPACE)


def decrypt_radix(key: SecretKey, word: LweSample):
    """Decrypt a radix word batch back to uint32[...]."""
    digits = decrypt_pbs(key, word, SPACE)
    # maximum-likelihood decode: clean digits are in [0, 4); folding mod 4
    # maps a noise-corrupted digit to some wrong value (never an exception)
    return digits_to_int(digits % DIGIT_BASE)


def _digit(word: LweSample, i: int) -> LweSample:
    return LweSample(word.a[..., i, :], word.b[..., i], word.cv[..., i])


def _stack_digits(digit_list) -> LweSample:
    return LweSample(
        jnp.stack([d.a for d in digit_list], axis=-2),
        jnp.stack([d.b for d in digit_list], axis=-1),
        jnp.stack([d.cv for d in digit_list], axis=-1),
    )


def _trivial_digit(value: int, like: LweSample) -> LweSample:
    """Noiseless digit constant shaped like one digit slice of a word."""
    n = like.a.shape[-1]
    return lwe_noiseless_trivial(
        jnp.int32(encode_pbs(value, SPACE)), n, like.b.shape)


# Per-position LUTs over the s = digit+digit+carry range [0, 8): the
# renormalised digit and the outgoing carry, evaluated together as one
# PBS call with a stacked per-sample table axis.
_SUM_CARRY_TABLES = [
    [s % DIGIT_BASE for s in range(SPACE)],  # sum digit
    [s // DIGIT_BASE for s in range(SPACE)],  # carry out (0/1)
]


def _add_chain(ck: CloudKey, a: LweSample, b: LweSample,
               carry: LweSample):
    """Shared ripple core: per digit, s = a_i + b_i + carry, then one PBS
    batch evaluating (s mod 4, s div 4). Returns (word, carry_out)."""
    d = a.b.shape[-1]
    tables = jnp.asarray(_SUM_CARRY_TABLES, jnp.int32)  # [2, S]
    out = []
    for i in range(d):
        s = _digit(a, i) + _digit(b, i) + carry
        pair = LweSample(
            jnp.stack([s.a, s.a], axis=-2),
            jnp.stack([s.b, s.b], axis=-1),
            jnp.stack([s.cv, s.cv], axis=-1),
        )
        res = programmable_bootstrap(
            ck.bootstrap_key, ck.keyswitch_key, tables, pair, SPACE)
        out.append(LweSample(res.a[..., 0, :], res.b[..., 0], res.cv[..., 0]))
        carry = LweSample(res.a[..., 1, :], res.b[..., 1], res.cv[..., 1])
    return _stack_digits(out), carry


def radix_add(ck: CloudKey, a: LweSample, b: LweSample) -> LweSample:
    """a + b mod 4^d over radix words: one blind rotation per bit."""
    return _add_chain(ck, a, b, _trivial_digit(0, _digit(a, 0)))[0]


def radix_scalar_add(ck: CloudKey, a: LweSample, scalar: int) -> LweSample:
    """a + plaintext scalar (mod 4^d), same carry chain."""
    d = a.b.shape[-1]
    b = _stack_digits([
        _trivial_digit((int(scalar) >> (BITS_PER_DIGIT * i)) & (DIGIT_BASE - 1),
                       _digit(a, 0))
        for i in range(d)
    ])
    return radix_add(ck, a, b)


def _complement(b: LweSample) -> LweSample:
    """Digit-wise 3 - b_i: exact affine (negation plus a trivial constant)."""
    top = lwe_noiseless_trivial(
        jnp.int32(encode_pbs(DIGIT_BASE - 1, SPACE)),
        b.a.shape[-1], b.b.shape)
    return top - b


def radix_sub(ck: CloudKey, a: LweSample, b: LweSample) -> LweSample:
    """a - b mod 4^d via a + complement(b) + 1 (borrow-free two's complement)."""
    return _add_chain(ck, a, _complement(b),
                      _trivial_digit(1, _digit(a, 0)))[0]


def radix_geq(ck: CloudKey, a: LweSample, b: LweSample) -> LweSample:
    """Encrypted [a >= b] as a 0/1 radix digit: the subtraction chain's
    carry-out (standard two's-complement comparison), at no extra cost
    beyond the subtract."""
    return _add_chain(ck, a, _complement(b),
                      _trivial_digit(1, _digit(a, 0)))[1]


def radix_eq(ck: CloudKey, a: LweSample, b: LweSample) -> LweSample:
    """Encrypted [a == b] as a 0/1 radix digit.

    Per digit, |a_i - b_i| == 0 is read off the difference digit with an
    is-zero LUT; the indicator digits are then summed (at most 7 per group
    fits the S = 8 headroom) and collapsed with an is-d LUT, log-tree style
    for wide words. Cost: d + ceil(d/7) + ... rotations.
    """
    d = a.b.shape[-1]
    diff = radix_sub(ck, a, b)
    is_zero = jnp.asarray([1 if s == 0 else 0 for s in range(SPACE)],
                          jnp.int32)
    flags = programmable_bootstrap(
        ck.bootstrap_key, ck.keyswitch_key, is_zero, diff, SPACE)
    flag_list = [_digit(flags, i) for i in range(d)]
    while len(flag_list) > 1:
        groups = [flag_list[i:i + 7] for i in range(0, len(flag_list), 7)]
        next_flags = []
        for g in groups:
            total = g[0]
            for f in g[1:]:
                total = total + f
            if len(g) == 1:
                next_flags.append(total)
                continue
            is_all = jnp.asarray(
                [1 if s == len(g) else 0 for s in range(SPACE)], jnp.int32)
            next_flags.append(programmable_bootstrap(
                ck.bootstrap_key, ck.keyswitch_key, is_all, total, SPACE))
        flag_list = next_flags
    return flag_list[0]
