"""LWE over the torus, batched struct-of-arrays style.

TPU-native counterpart of the reference's LWE layer (reference: src/lwe.jl:1-83).
A batch of ciphertexts is ONE pytree — `a: int32[..., n]`, `b: int32[...]` —
and every operation is a pure vectorized function; there is no per-sample
object. `cv` carries the reference's advisory noise-variance bookkeeping
(reference: src/lwe.jl:25; never read by decryption or control flow,
SURVEY.md section 2 item 7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .numeric import dtot32, rand_uniform_bool, rand_uniform_torus32


class LweSample(NamedTuple):
    """Batch of LWE ciphertexts: b = <a, s> + message + noise.

    a: int32[..., n] masks; b: int32[...] bodies; cv: float32[...] advisory
    noise variance. Leading dims are the ciphertext batch.
    Reference: src/lwe.jl:21-29.
    """

    a: jax.Array
    b: jax.Array
    cv: jax.Array

    @property
    def n(self) -> int:
        return self.a.shape[-1]

    @property
    def batch_shape(self):
        return self.a.shape[:-1]

    def __add__(self, other: "LweSample") -> "LweSample":
        return LweSample(self.a + other.a, self.b + other.b, self.cv + other.cv)

    def __sub__(self, other: "LweSample") -> "LweSample":
        return LweSample(self.a - other.a, self.b - other.b, self.cv + other.cv)

    def __neg__(self) -> "LweSample":
        return LweSample(-self.a, -self.b, self.cv)

    def __mul__(self, y: int) -> "LweSample":
        ty = jnp.int32(y)
        return LweSample(self.a * ty, self.b * ty, self.cv * float(y) ** 2)

    __rmul__ = __mul__


def lwe_key_gen(rng, n: int) -> jax.Array:
    """Uniform binary key s in {0,1}^n. Reference: src/lwe.jl:10-13."""
    return rand_uniform_bool(rng, (n,))


def lwe_encrypt_core(message, a, noise_t32, key) -> LweSample:
    """Deterministic encryption core with injected randomness.

    b = message + noise + <a, s>, all int32 wrapping. message/noise broadcast
    over the batch; a: int32[..., n]; key: int32[n].
    Reference: src/lwe.jl:38-43 (the arithmetic after sampling).
    """
    message = jnp.asarray(message, jnp.int32)
    b = message + jnp.asarray(noise_t32, jnp.int32)
    b = b + jnp.sum(a * key, axis=-1, dtype=jnp.int32)
    return LweSample(a, b, jnp.zeros(b.shape, jnp.float32))


def lwe_encrypt(rng, message, alpha: float, key) -> LweSample:
    """b = message + N(0, alpha^2) + <a, s> with fresh uniform a.

    message: int32 scalar or [...] batch. Reference: src/lwe.jl:38-43.
    """
    message = jnp.asarray(message, jnp.int32)
    rng_a, rng_e = jax.random.split(rng)
    n = key.shape[-1]
    a = rand_uniform_torus32(rng_a, message.shape + (n,))
    noise = dtot32(jax.random.normal(rng_e, message.shape, jnp.float32) * alpha)
    sample = lwe_encrypt_core(message, a, noise, key)
    return sample._replace(cv=jnp.full(sample.b.shape, alpha**2, jnp.float32))


def lwe_encrypt_with_noise(rng, message, noise_float, alpha: float, key) -> LweSample:
    """Encryption with externally supplied float noise values (keyswitch keygen
    uses a recentred noise matrix). Reference: src/lwe.jl:49-55.
    """
    message = jnp.asarray(message, jnp.int32)
    n = key.shape[-1]
    a = rand_uniform_torus32(rng, message.shape + (n,))
    sample = lwe_encrypt_core(message, a, dtot32(noise_float), key)
    return sample._replace(cv=jnp.full(sample.b.shape, alpha**2, jnp.float32))


def lwe_phase(sample: LweSample, key) -> jax.Array:
    """phi = b - <a, s> (int32 wrapping). Reference: src/lwe.jl:59."""
    return sample.b - jnp.sum(sample.a * key, axis=-1, dtype=jnp.int32)


def lwe_noiseless_trivial(mu, n: int, batch_shape=()) -> LweSample:
    """(0, mu): a trivial sample anyone can decrypt. Reference: src/lwe.jl:63-64."""
    mu = jnp.broadcast_to(jnp.asarray(mu, jnp.int32), batch_shape)
    return LweSample(
        jnp.zeros(batch_shape + (n,), jnp.int32),
        mu,
        jnp.zeros(batch_shape, jnp.float32),
    )
