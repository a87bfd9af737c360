"""TLWE (ring-LWE over the torus), batched struct-of-arrays style.

TPU-native counterpart of the reference's TLWE layer
(reference: src/tlwe.jl:1-111). A TLWE sample is one int32 array
`a[..., k+1, N]` — the k mask polynomials plus the body (last row). There is
no frequency-domain twin type: exact integer convolution engines
(ops/conv.py) replace the reference's forward/inverse FFT pair
(src/tlwe.jl:96-111), and products are fused where they are used.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import polynomial
from .lwe import LweSample
from .numeric import dtot32, rand_uniform_bool, rand_uniform_torus32
from .ops import conv


class TLweSample(NamedTuple):
    """Batch of TLWE ciphertexts: body = sum_i s_i * a_i + message + noise.

    a: int32[..., k+1, N] — mask polys + body last; cv: float32[...] advisory.
    Reference: src/tlwe.jl:34-41.
    """

    a: jax.Array
    cv: jax.Array

    @property
    def mask(self) -> jax.Array:
        return self.a[..., :-1, :]

    @property
    def body(self) -> jax.Array:
        return self.a[..., -1, :]

    def __add__(self, other: "TLweSample") -> "TLweSample":
        return TLweSample(self.a + other.a, self.cv + other.cv)

    def __sub__(self, other: "TLweSample") -> "TLweSample":
        return TLweSample(self.a - other.a, self.cv + other.cv)


def tlwe_key_gen(rng, n: int, mask_size: int) -> jax.Array:
    """k uniform binary polynomials, int32[k, N]. Reference: src/tlwe.jl:15-20."""
    return rand_uniform_bool(rng, (mask_size, n))


def extract_lwe_key(tlwe_key) -> jax.Array:
    """Concatenate ring-key coefficients into an LWE key of size N*k.

    Reference: src/tlwe.jl:25-31.
    """
    return tlwe_key.reshape(-1)


def tlwe_extract_sample(sample: TLweSample) -> LweSample:
    """Extract the constant coefficient as an (N*k)-dim LWE sample.

    a = reverse_polynomial of each mask poly, concatenated; b = body[0].
    Reference: src/tlwe.jl:55-59.
    """
    rev = polynomial.reverse_polynomial(sample.mask)  # [..., k, N]
    a = rev.reshape(rev.shape[:-2] + (rev.shape[-2] * rev.shape[-1],))
    b = sample.body[..., 0]
    # extraction is exact: the constant coefficient's variance is the
    # ring sample's variance (reference leaves this 0.0, issue #7)
    return LweSample(a, b, jnp.broadcast_to(sample.cv, b.shape))


def tlwe_encrypt_zero_core(a_part, noise_t32, key) -> TLweSample:
    """Deterministic homogeneous-encryption core with injected randomness.

    a_part: int32[..., k, N] uniform masks; noise_t32: int32[..., N];
    key: int32[k, N] binary. body = noise + sum_i conv(s_i, a_i) mod 2^32.
    Reference: src/tlwe.jl:63-73 (arithmetic after sampling).
    """
    batch_shape = a_part.shape[:-2]
    k, n = key.shape
    flat = a_part.reshape((-1, k, n))
    body = conv.poly_mul_batched_torus(flat, key).reshape(batch_shape + (n,))
    body = body + jnp.asarray(noise_t32, jnp.int32)
    full = jnp.concatenate([a_part, body[..., None, :]], axis=-2)
    return TLweSample(full, jnp.zeros(batch_shape, jnp.float32))


def tlwe_encrypt_zero(rng, alpha: float, key, batch_shape=()) -> TLweSample:
    """Fresh homogeneous encryption(s) of zero. Reference: src/tlwe.jl:63-73."""
    k, n = key.shape
    rng_a, rng_e = jax.random.split(rng)
    a_part = rand_uniform_torus32(rng_a, batch_shape + (k, n))
    noise = dtot32(jax.random.normal(rng_e, batch_shape + (n,), jnp.float32) * alpha)
    sample = tlwe_encrypt_zero_core(a_part, noise, key)
    return sample._replace(cv=jnp.full(batch_shape, alpha**2, jnp.float32))


def tlwe_noiseless_trivial(mu, mask_size: int) -> TLweSample:
    """(0, mu) for a torus polynomial mu[..., N]. Reference: src/tlwe.jl:77-81."""
    mu = jnp.asarray(mu, jnp.int32)
    zeros = jnp.zeros(mu.shape[:-1] + (mask_size,) + mu.shape[-1:], jnp.int32)
    full = jnp.concatenate([zeros, mu[..., None, :]], axis=-2)
    return TLweSample(full, jnp.zeros(mu.shape[:-1], jnp.float32))


def tlwe_mul_by_monomial(sample: TLweSample, shift) -> TLweSample:
    """All k+1 polynomials times X^shift; shift may be batched ([...] matching
    the sample's batch dims). Reference: src/tlwe.jl:92-93.
    """
    shift = jnp.asarray(shift, jnp.int32)
    return TLweSample(
        polynomial.mul_by_monomial(sample.a, shift[..., None]), sample.cv
    )
