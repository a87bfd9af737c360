"""Negacyclic polynomial ring Z_2^32[x]/(x^N + 1), batched over leading dims.

Polynomials are plain int32 arrays of shape [..., N] (coefficient order
c[0] + c[1] x + ... + c[N-1] x^(N-1)) — no class hierarchy. TPU-native
counterpart of the reference's DarkIntegers-backed layer
(reference: src/polynomials.jl:1-35 and DarkIntegers' mul_by_monomial).
Exact products live in ops/conv.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def mul_by_monomial(p, shift):
    """p * x^shift mod (x^N + 1), exact for any integer shift (incl. negative).

    Barrel rotation of the doubled array [p, -p]: since x^N = -1 the
    coefficients are 2N-periodic with sign flip every N, so the product is
    roll(doubled, s)[..., :N] with s = shift mod 2N. The roll is computed as
    log2(2N) stages of static rolls + per-element selects on the shift's
    bits — fully vectorized over the batch, no data-dependent gather (TPU
    gathers run ~2 Gelem/s; rolls and selects run at memory bandwidth).
    `shift` may be a scalar or batched with shape == p.shape[:-1].
    Reference semantics: DarkIntegers mul_by_monomial, used at
    src/tlwe.jl:92-93 and src/bootstrap.jl:54 (negative shifts).
    """
    n = p.shape[-1]
    doubled = jnp.concatenate([p, -p], axis=-1)  # [..., 2N]
    s = jnp.mod(jnp.asarray(shift, jnp.int32), 2 * n)[..., None]  # [..., 1]
    stages = (2 * n - 1).bit_length()
    for j in range(stages):
        rolled = jnp.roll(doubled, 1 << j, axis=-1)
        take = (s >> j) & 1
        doubled = jnp.where(take != 0, rolled, doubled)
    return doubled[..., :n]


def reverse_polynomial(p):
    """p(x) -> p(1/x) mod (x^N + 1): out[0] = p[0], out[r] = -p[N-r] for r >= 1.

    Used only by sample extraction. Reference: src/polynomials.jl:32-35
    (reverse coefficients then multiply by x^(N+1)).
    """
    flipped = jnp.flip(p, axis=-1)  # [p[N-1], ..., p[0]]
    rolled = jnp.roll(flipped, 1, axis=-1)  # [p[0], p[N-1], ..., p[1]]
    sign = jnp.concatenate(
        [jnp.ones((1,), p.dtype), jnp.full((p.shape[-1] - 1,), -1, p.dtype)]
    )
    return rolled * sign


def constant_polynomial(value, n: int):
    """The constant-coefficient-everywhere polynomial [v, v, ..., v] (the
    bootstrap test vector, reference: src/bootstrap.jl:78)."""
    return jnp.full((n,), value, jnp.int32)
