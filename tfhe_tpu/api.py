"""User-facing single-key API: keys, key pairs, bit encrypt/decrypt.

TPU-native counterpart of the reference's scheme API
(reference: src/api.jl:92-169). Keys are registered pytree dataclasses so the
whole CloudKey rides `jit` as one argument (params static); `encrypt`/
`decrypt` operate on boolean batches of any shape.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .bootstrap import BootstrapKey, bootstrap_key_gen
from .keyswitch import KeyswitchKey, keyswitch_key_gen
from .lwe import LweSample, lwe_encrypt, lwe_key_gen, lwe_phase
from .numeric import encode_message
from .params import SchemeParameters, tfhe_parameters_80
from .tlwe import extract_lwe_key, tlwe_key_gen


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["key"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class SecretKey:
    """Client-side secret key: the binary LWE key. Reference: src/api.jl:92-100."""

    params: SchemeParameters
    key: jax.Array  # int32[n] in {0,1}


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["bootstrap_key", "keyswitch_key"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class CloudKey:
    """Server-side evaluation key: bootstrap + keyswitch keys.

    A fresh TLWE key is generated inside the constructor path and never
    leaves it (reference: src/api.jl:111-127).
    """

    params: SchemeParameters
    bootstrap_key: BootstrapKey
    keyswitch_key: KeyswitchKey


def make_secret_key(rng, params: SchemeParameters) -> SecretKey:
    """Reference: src/api.jl:96-99."""
    return SecretKey(params, lwe_key_gen(rng, params.lwe_size))


def make_cloud_key(rng, secret_key: SecretKey) -> CloudKey:
    """Derive bootstrap + keyswitch keys from a fresh internal TLWE key.

    Reference: src/api.jl:116-126.
    """
    params = secret_key.params
    rng_tlwe, rng_bs, rng_ks = jax.random.split(rng, 3)
    tlwe_key = tlwe_key_gen(
        rng_tlwe, params.tlwe_polynomial_degree, params.tlwe_mask_size
    )
    bs_key = bootstrap_key_gen(
        rng_bs, params.bs_noise_stddev, secret_key.key, tlwe_key,
        params.bs_decomp_length, params.bs_log2_base,
        balanced=params.gadget_balanced,
    )
    ks_key = keyswitch_key_gen(
        rng_ks, params.ks_noise_stddev,
        extract_lwe_key(tlwe_key), secret_key.key,
        params.ks_decomp_length, params.ks_log2_base,
    )
    return CloudKey(params, bs_key, ks_key)


def make_key_pair(rng, params: SchemeParameters | None = None):
    """Reference: src/api.jl:139-146 (defaults to the 80-bit preset)."""
    if params is None:
        params = tfhe_parameters_80()
    rng_sk, rng_ck = jax.random.split(rng)
    secret_key = make_secret_key(rng_sk, params)
    cloud_key = make_cloud_key(rng_ck, secret_key)
    return secret_key, cloud_key


def encrypt(rng, key: SecretKey, message) -> LweSample:
    """Encrypt boolean bit(s): mu = encode(+-1, 8). message: bool[...].

    Reference: src/api.jl:155-158.
    """
    message = jnp.asarray(message, bool)
    mu = jnp.where(
        message,
        jnp.int32(encode_message(1, 8)),
        jnp.int32(encode_message(-1, 8)),
    )
    return lwe_encrypt(rng, mu, key.params.lwe_noise_stddev, key.key)


def decrypt(key: SecretKey, sample: LweSample) -> jax.Array:
    """Decrypt to boolean(s): sign of the phase. Reference: src/api.jl:167-169."""
    return lwe_phase(sample, key.key) > 0
