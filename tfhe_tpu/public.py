"""Public-key encryption for LWE ciphertexts.

The reference is secret-key only (`encrypt` needs the client key,
reference: src/api.jl:155-158); production TFHE stacks also ship a
Regev-style public key so untrusted writers can contribute ciphertexts.
The public key is a batch of M encryptions of zero; encryption is a random
binary subset-sum plus the message on the body:

    ct = sum_i u_i * PK_i + (0, mu),   u uniform in {0,1}^M

which is one [batch, M] x [M, n+1] int32 matmul on the MXU. The leftover
hash lemma sizes M >= (n+1)*log2(q) + 2*lambda for statistical security of
the mask distribution; the default uses lambda = 128. The subset-sum noise
has variance (M/2) * alpha^2 — for the shipped presets that is ~100x the
fresh-ciphertext sigma and still ~20x inside the gate contract's 1/16
margin (reference: src/gates.jl:1-6), so public-key ciphertexts feed gates
directly.

The public key itself is just an `LweSample` batch, so it serializes and —
because the messages are all zero — seeds down to M+2 words via
`compressed`: `make_public_key_seeded` ships ~80 KB instead of ~50 MB at
the 128-bit preset.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .api import SecretKey
from .compressed import SeededLweSample, expand_lwe
from .lwe import LweSample, lwe_encrypt
from .numeric import encode_message, rand_uniform_torus32
from .params import SchemeParameters


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["zeros"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class LwePublicKey:
    """M encryptions of zero under the secret LWE key."""

    params: SchemeParameters
    zeros: LweSample  # batch [M]

    @property
    def count(self) -> int:
        return self.zeros.b.shape[0]


def default_count(params: SchemeParameters, security: int = 128) -> int:
    """Leftover-hash-lemma mask count: (n+1)*log2(q) + 2*security."""
    return (params.lwe_size + 1) * 32 + 2 * security


def make_public_key(rng, key: SecretKey, count: int | None = None) -> LwePublicKey:
    """M fresh zero encryptions (the whole batch is one vectorized call)."""
    params = key.params
    m = default_count(params) if count is None else count
    zeros = lwe_encrypt(
        rng, jnp.zeros((m,), jnp.int32), params.lwe_noise_stddev, key.key
    )
    return LwePublicKey(params, zeros)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["zeros"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class SeededLwePublicKey:
    """Seeded wire form: the zero-encryption bodies plus one mask seed."""

    params: SchemeParameters
    zeros: SeededLweSample


def make_public_key_seeded(rng, key: SecretKey,
                           count: int | None = None) -> SeededLwePublicKey:
    """Seeded twin of `make_public_key` (bit-identical after expansion)."""
    from .compressed import _seed_data
    from .lwe import lwe_encrypt_core
    from .numeric import dtot32

    params = key.params
    m = default_count(params) if count is None else count
    alpha = params.lwe_noise_stddev
    rng_a, rng_e = jax.random.split(rng)
    n = key.key.shape[-1]
    a = rand_uniform_torus32(rng_a, (m, n))
    noise = dtot32(jax.random.normal(rng_e, (m,), jnp.float32) * alpha)
    sample = lwe_encrypt_core(jnp.zeros((m,), jnp.int32), a, noise, key.key)
    return SeededLwePublicKey(
        params,
        SeededLweSample(_seed_data(rng_a), sample.b,
                        jnp.full((m,), alpha**2, jnp.float32), n),
    )


def expand_public_key(pk: SeededLwePublicKey) -> LwePublicKey:
    return LwePublicKey(pk.params, expand_lwe(pk.zeros))


def encrypt_public(rng, pk: LwePublicKey, message) -> LweSample:
    """Encrypt boolean bit(s) with the PUBLIC key: mu = encode(+-1, 8).

    message: bool[...]. One Bernoulli(1/2) selector row per output bit; the
    combination is a single int32 contraction over the key batch.
    """
    message = jnp.asarray(message, bool)
    mu = jnp.where(
        message,
        jnp.int32(encode_message(1, 8)),
        jnp.int32(encode_message(-1, 8)),
    )
    m = pk.count
    u = jax.random.bernoulli(rng, 0.5, message.shape + (m,)).astype(jnp.int32)
    flat_u = u.reshape((-1, m))
    a = jax.lax.dot_general(
        flat_u, pk.zeros.a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(message.shape + (pk.zeros.a.shape[-1],))
    b = jnp.sum(u * pk.zeros.b, axis=-1, dtype=jnp.int32) + mu
    alpha2 = float(pk.params.lwe_noise_stddev) ** 2
    cv = jnp.full(message.shape, 0.5 * m * alpha2, jnp.float32)
    return LweSample(a, b, cv)
