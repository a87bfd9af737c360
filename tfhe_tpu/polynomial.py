"""Negacyclic polynomial ring Z_2^32[x]/(x^N + 1), batched over leading dims.

Polynomials are plain int32 arrays of shape [..., N] (coefficient order
c[0] + c[1] x + ... + c[N-1] x^(N-1)) — no class hierarchy. TPU-native
counterpart of the reference's DarkIntegers-backed layer
(reference: src/polynomials.jl:1-35 and DarkIntegers' mul_by_monomial).
Exact products live in ops/conv.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _monomial_gather_base(n: int):
    """Static [N] iota used to build monomial-rotation gather indices.

    NumPy constant (NOT jnp): lru_cached values must never be traced arrays,
    or a tracer from one jit scope would leak into later traces."""
    import numpy as np

    return np.arange(n, dtype=np.int32)


def mul_by_monomial(p, shift):
    """p * x^shift mod (x^N + 1), exact for any integer shift (incl. negative).

    Branchless gather from the doubled array [p, -p]: since x^N = -1, the
    coefficients are 2N-periodic with sign flip every N. `shift` may be a
    scalar or batched with shape == p.shape[:-1] (per-ciphertext rotations in
    blind rotate). Reference semantics: DarkIntegers mul_by_monomial, used at
    src/tlwe.jl:92-93 and src/bootstrap.jl:54 (negative shifts).
    """
    n = p.shape[-1]
    doubled = jnp.concatenate([p, -p], axis=-1)  # [..., 2N]
    r = _monomial_gather_base(n)  # [N]
    shift = jnp.asarray(shift, jnp.int32)
    idx = jnp.mod(r - shift[..., None], 2 * n)  # [..., N]
    if idx.ndim == 1:
        return jnp.take(doubled, idx, axis=-1)
    return jnp.take_along_axis(doubled, idx, axis=-1)


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
