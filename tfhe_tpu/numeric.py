"""Torus numerics: Torus32 arithmetic, message encode/decode, samplers.

TPU-native counterpart of the reference's torus layer
(reference: src/numeric-functions.jl:1-53). The torus T = R/Z is represented by
int32 words ("Torus32"): the real x in [-1/2, 1/2) maps to round(x * 2^32) with
wraparound. All arithmetic is exact int32 two's-complement wraparound, which is
exactly arithmetic mod 2^32 (verified: XLA integer ops wrap).

Randomness is drawn from `jax.random` (threefry) with explicitly threaded keys;
the reference uses MersenneTwister, so streams differ by construction.
Bit-exactness against the executable spec (spec/oracle.py) is established by
injecting identical random draws into both (SURVEY.md section 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Torus32 = jnp.int32

# 2^32 as a float; used only to scale unit-range floats into torus words.
_TWO32 = float(2**32)


def encode_message(mu: int, message_space: int) -> int:
    """Phase of integer message `mu` in a power-of-2 message space.

    encode(mu, ms) = mu << (32 - log2(ms)) as an int32 (wrapping).
    Reference: src/numeric-functions.jl:42-45.
    """
    log2_ms = message_space.bit_length() - 1
    assert 1 << log2_ms == message_space, "message_space must be a power of 2"
    # Pure-Python two's complement (NO device scalar: a device->host scalar
    # read here would permanently degrade jit dispatch to a synchronous
    # ~25 ms round-trip per call on tunneled-TPU runtimes, and this runs at
    # import time via the gate-library constants).
    v = (mu << (32 - log2_ms)) & 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def decode_message(phase, message_space: int):
    """Round a torus phase to the nearest message in [-ms/2, ms/2).

    (phase + 2^(32-log2ms-1)) >> (32-log2ms), with int32 wraparound addition
    and arithmetic shift. Also used as modulus switching to 2N inside the
    bootstrap. Reference: src/numeric-functions.jl:31-34.
    """
    log2_ms = message_space.bit_length() - 1
    assert 1 << log2_ms == message_space, "message_space must be a power of 2"
    phase = jnp.asarray(phase, jnp.int32)
    half = jnp.int32(1) << (32 - log2_ms - 1)
    return (phase + half) >> (32 - log2_ms)


def dtot32(d):
    """float in [-0.5, 0.5) -> Torus32 = trunc(d * 2^32).

    Reference: src/numeric-functions.jl:51-53. Computed in float32 (the
    framework's noise pipeline is defined in f32; the spec oracle mirrors it).
    """
    return jnp.trunc(jnp.asarray(d, jnp.float32) * _TWO32).astype(jnp.int32)


def rand_uniform_bool(key, shape=()):
    """Uniform {0,1} as int32. Reference: src/numeric-functions.jl:4-6."""
    return jax.random.bits(key, shape, jnp.uint32).astype(jnp.int32) & 1


def rand_uniform_torus32(key, shape=()):
    """Uniform over all 2^32 torus words. Reference: src/numeric-functions.jl:9-11."""
    return jax.random.bits(key, shape, jnp.uint32).astype(jnp.int32)


def rand_gaussian_float(key, sigma: float, shape=()):
    """N(0, sigma^2) floats. Reference: src/numeric-functions.jl:14-16."""
    return jax.random.normal(key, shape, jnp.float32) * jnp.float32(sigma)


def rand_gaussian_torus32(key, message, sigma: float, shape=()):
    """Gaussian torus sample centred at `message` with stddev `sigma`.

    message + dtot32(randn * sigma). Reference: src/numeric-functions.jl:19-23.
    """
    err = jax.random.normal(key, shape, jnp.float32) * jnp.float32(sigma)
    return jnp.asarray(message, jnp.int32) + dtot32(err)
