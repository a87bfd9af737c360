"""Multi-key TFHE user API: parameter presets, key ceremony, encrypt/decrypt.

TPU-native counterpart of the reference's MK API (reference: src/mk_api.jl).
The trust boundaries match the reference's ceremony (SURVEY.md section 3.4):
the server makes a SharedKey; each party derives a CloudKeyPart from its
SecretKey + the SharedKey; the server assembles the MKCloudKey (expansion);
encryption/decryption need all parties' secret keys jointly (reference
issue #6 notes the same limitation).
"""

from __future__ import annotations

import dataclasses
import functools

import math

import jax
import jax.numpy as jnp

from ..api import SecretKey
from ..keyswitch import KeyswitchKey, keyswitch_key_gen
from ..numeric import dtot32, encode_message, rand_uniform_torus32
from ..params import SchemeParameters
from ..tlwe import tlwe_key_gen
from .internals import (
    MKBootstrapKey,
    MKLweSample,
    MKTGswUESample,
    mk_bootstrap_key,
    mk_lwe_phase,
    mk_tgsw_encrypt,
    public_key_gen,
    shared_key_gen,
)


def mktfhe_parameters_2party() -> SchemeParameters:
    """The REFERENCE-FIDELITY 2-party preset (src/mk_api.jl:4-10).

    WARNING: this preset carries an intrinsic ~1.5% per-gate failure rate
    inherited from the reference's own parameter choice (sigma_rot ~ 0.054
    against the 0.125 decision margin — docs/mk_noise_budget.md). It exists
    for parity with the reference; production use should prefer
    `mktfhe_parameters_2party_lownoise` (failure < 1e-18/gate at ~0.9x the
    throughput), which is also what the benchmark suite headlines.
    """
    return SchemeParameters(
        lwe_size=500, lwe_noise_stddev=0.012467,
        tlwe_polynomial_degree=1024, tlwe_mask_size=1,
        bs_decomp_length=4, bs_log2_base=7, bs_noise_stddev=3.29e-10,
        ks_decomp_length=8, ks_log2_base=2, ks_noise_stddev=2.44e-5,
        max_parties=2,
    )


def mktfhe_parameters_2party_lownoise() -> SchemeParameters:
    """2-party preset with the 4-party bootstrap gadget (l=5, base 2^6).

    The reference's own 2-party preset carries an intrinsic ~1.5%/gate
    failure rate (docs/mk_noise_budget.md: sigma_rot ~ 0.054 against the
    0.125 margin — its own 10-trial CI goes red ~14% of the time). Deepening
    the gadget to the 4-party preset's (5, 2^6) at 2 parties cuts the
    rotation noise to sigma_rot ~ 0.014: failure < 1e-18/gate, at ~0.8x the
    throughput (5/4 more decomposition rows per step). Asserted by
    tests/test_noise_model.py::test_mk_lownoise_preset_margin; on-chip
    throughput in STATUS.md.
    """
    return SchemeParameters(
        lwe_size=500, lwe_noise_stddev=0.012467,
        tlwe_polynomial_degree=1024, tlwe_mask_size=1,
        bs_decomp_length=5, bs_log2_base=6, bs_noise_stddev=3.29e-10,
        ks_decomp_length=8, ks_log2_base=2, ks_noise_stddev=2.44e-5,
        max_parties=2,
    )


def mktfhe_parameters_4party() -> SchemeParameters:
    """Reference: src/mk_api.jl:16-22."""
    return SchemeParameters(
        lwe_size=500, lwe_noise_stddev=0.012467,
        tlwe_polynomial_degree=1024, tlwe_mask_size=1,
        bs_decomp_length=5, bs_log2_base=6, bs_noise_stddev=3.29e-10,
        ks_decomp_length=8, ks_log2_base=2, ks_noise_stddev=2.44e-5,
        max_parties=4,
    )


def mktfhe_parameters_8party() -> SchemeParameters:
    """Reference: src/mk_api.jl:28-34."""
    return SchemeParameters(
        lwe_size=500, lwe_noise_stddev=0.012467,
        tlwe_polynomial_degree=1024, tlwe_mask_size=1,
        bs_decomp_length=8, bs_log2_base=4, bs_noise_stddev=3.29e-10,
        ks_decomp_length=8, ks_log2_base=2, ks_noise_stddev=2.44e-5,
        max_parties=8,
    )


def mktfhe_parameters_toy(max_parties: int = 2) -> SchemeParameters:
    """Tiny insecure MK preset for fast tests (exact arithmetic at any size).

    bs noise matches the production presets: MK expansion multiplies the key
    noise by ~sqrt(l*N)*(B/2) twice (uni-enc -> expand -> extern product), so
    a loose stddev breaks decrypt margins even at toy sizes.
    """
    return SchemeParameters(
        lwe_size=16, lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=256, tlwe_mask_size=1,
        bs_decomp_length=4, bs_log2_base=7, bs_noise_stddev=3.29e-10,
        ks_decomp_length=8, ks_log2_base=2, ks_noise_stddev=2.0**-15,
        max_parties=max_parties,
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class SharedKey:
    """Server-generated l uniform torus polynomials, common to all parties.

    Reference: src/mk_api.jl:44-50 -> src/mk_internals.jl:106-111.
    """

    params: SchemeParameters
    a: jax.Array  # int32[l, N]


def make_shared_key(rng, params: SchemeParameters) -> SharedKey:
    assert params.tlwe_mask_size == 1, "MK-TFHE requires k=1 (reference issue #2)"
    return SharedKey(
        params,
        shared_key_gen(rng, params.bs_decomp_length, params.tlwe_polynomial_degree),
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["public_key", "key_uni_enc", "keyswitch_key"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class CloudKeyPart:
    """One party's contribution: public key, uni-encrypted LWE key bits,
    party-local keyswitch key. Travels party -> server.
    Reference: src/mk_api.jl:61-77.
    """

    params: SchemeParameters
    public_key: jax.Array  # int32[l, N]
    key_uni_enc: MKTGswUESample  # [n, 6, l, N]
    keyswitch_key: KeyswitchKey


def make_cloud_key_part(rng, secret_key: SecretKey,
                        shared: SharedKey) -> CloudKeyPart:
    """Party-side keygen (fresh internal TLWE key never leaves this function).

    Reference: src/mk_api.jl:66-76.
    """
    params = secret_key.params
    rng_tlwe, rng_pk, rng_bk, rng_ks = jax.random.split(rng, 4)
    tlwe_key = tlwe_key_gen(rng_tlwe, params.tlwe_polynomial_degree, 1)
    pk = public_key_gen(rng_pk, tlwe_key, params.bs_noise_stddev, shared.a)
    uni = mk_tgsw_encrypt(
        rng_bk, secret_key.key, params.bs_noise_stddev, tlwe_key, shared.a, pk,
        params.bs_decomp_length, params.bs_log2_base,
        batch_shape=(params.lwe_size,),
    )
    ks = keyswitch_key_gen(
        rng_ks, params.ks_noise_stddev, tlwe_key.reshape(-1), secret_key.key,
        params.ks_decomp_length, params.ks_log2_base,
    )
    return CloudKeyPart(params, pk, uni, ks)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["bootstrap_key", "keyswitch_keys"],
    meta_fields=["params", "parties"],
)
@dataclasses.dataclass(frozen=True)
class MKCloudKey:
    """Assembled server-side evaluation key. Reference: src/mk_api.jl:85-101."""

    params: SchemeParameters
    parties: int
    bootstrap_key: MKBootstrapKey
    keyswitch_keys: tuple  # tuple of KeyswitchKey, one per party


def make_mk_cloud_key(parts) -> MKCloudKey:
    """Server-side assembly: expand every party's uni-encryptions against all
    public keys. Reference: src/mk_api.jl:91-100."""
    params = parts[0].params
    parties = len(parts)
    assert parties <= params.max_parties, (parties, params.max_parties)
    pk_bs = jnp.stack([p.public_key for p in parts])  # [parties, l, N]
    bk = mk_bootstrap_key(
        [p.key_uni_enc for p in parts], pk_bs,
        params.bs_decomp_length, params.bs_log2_base,
        noise_stddev=params.bs_noise_stddev,
        balanced=params.gadget_balanced,
    )
    return MKCloudKey(params, parties, bk, tuple(p.keyswitch_key for p in parts))


def mk_encrypt(rng, secret_keys, message) -> MKLweSample:
    """Joint encryption (needs ALL parties' secret keys; reference issue #6).

    message: bool[...]. Reference: src/mk_api.jl:110-126.
    """
    params = secret_keys[0].params
    parties = len(secret_keys)
    n = params.lwe_size
    alpha = params.lwe_noise_stddev
    message = jnp.asarray(message, bool)
    mu = jnp.where(
        message,
        jnp.int32(encode_message(1, 8)),
        jnp.int32(encode_message(-1, 8)),
    )
    rng_a, rng_e = jax.random.split(rng)
    a = rand_uniform_torus32(rng_a, message.shape + (parties, n))
    keys = jnp.stack([sk.key for sk in secret_keys])  # [parties, n]
    b = mu + dtot32(
        jax.random.normal(rng_e, message.shape, jnp.float32) * jnp.float32(alpha)
    )
    b = b + jnp.sum(a * keys, axis=(-1, -2), dtype=jnp.int32)
    return MKLweSample(a, b, jnp.full(b.shape, alpha**2, jnp.float32))


def mk_decrypt(secret_keys, sample: MKLweSample) -> jax.Array:
    """Joint decryption: sign of the joined phase. Reference: src/mk_api.jl:135-138."""
    keys = jnp.stack([sk.key for sk in secret_keys])
    return mk_lwe_phase(sample, keys) > 0


def mk_partial_decrypt(rng, secret_key: SecretKey, sample: MKLweSample,
                       party: int, smudging_stddev: float | None = None,
                       statistical_security: float | None = None):
    """One party's decryption share: <a_party, s_party> + smudging noise.

    Distributed decryption removes the reference's all-keys-in-one-place
    limitation (its own TODO, reference issue #6 at src/mk_api.jl:110):
    each party publishes only this share, and `mk_combine_shares` finishes
    the decryption without any secret key.

    The smudging noise must drown the share's key-dependent content, and
    there is no safe universal default — so the caller must choose exactly
    one of:

    * `statistical_security=lam`: the standard smudging-lemma calibration
      sigma_smudge = 2^lam * B_share, where B_share = 8 * sigma_share is a
      HIGH-PROBABILITY MAGNITUDE bound on the share's key-dependent
      content (sigma_share from the honest `sample.cv`; P(|e| > 8 sigma)
      ~ 1e-15 — the lemma needs a bound, not a stddev, so calibrating
      against sigma_share itself would overstate the achieved distance) —
      the share distribution then sits within ~2^-lam statistical distance
      of one computed from any same-plaintext ciphertext. A correctness
      guard rejects calibrations whose combined flooding would break
      decryption (all parties' smudges add into `mk_combine_shares`),
      solving 16*(sigma_share^2 + parties*sigma_smudge^2) <= 0.125^2
      exactly: on the 32-bit torus this caps achievable lam at ~7 bits for
      FRESH ciphertexts at the shipped presets and ~0 bits for
      BOOTSTRAPPED ones (sigma ~0.05 at the reference's 2-party preset).
      That is an intrinsic limitation of a 32-bit modulus, not of this
      implementation; deployments needing 40+ smudging bits use
      larger-modulus threshold schemes. docs/mk_noise_budget.md section
      "share flooding" has the arithmetic; the hiding claim is tested in
      tests/test_mk.py.
    * `smudging_stddev`: an explicit stddev, for callers who have done the
      calibration themselves (no guard applied beyond the torus range).
    """
    parties = sample.a.shape[-2]
    if (smudging_stddev is None) == (statistical_security is None):
        raise ValueError(
            "pass exactly one of smudging_stddev / statistical_security "
            "(there is no safe default flooding noise; see docstring)")
    if statistical_security is not None:
        sigma_share = float(jnp.max(sample.cv)) ** 0.5
        if sigma_share == 0.0:
            raise ValueError(
                "sample.cv carries no noise estimate; pass an explicit "
                "smudging_stddev")
        # smudging-lemma bound: the lemma floods a MAGNITUDE bound, not a
        # stddev — use the high-probability bound 8*sigma (P ~ 1e-15)
        b_share = 8.0 * sigma_share
        smudging_stddev = (2.0 ** statistical_security) * b_share
        # correctness guard: combined flooding of all parties' shares must
        # leave >= 4 sigma of the boolean 1/8 decision margin; max_lam
        # solves 16*(sigma_share^2 + parties*sigma_smudge^2) = 0.125^2
        total = (sigma_share**2 + parties * smudging_stddev**2) ** 0.5
        if 4.0 * total > 0.125:
            headroom = (0.125 / 4.0) ** 2 - sigma_share**2
            max_lam = (math.log2((headroom / parties) ** 0.5 / b_share)
                       if headroom > 0 else float("-inf"))
            raise ValueError(
                f"statistical_security={statistical_security} needs "
                f"sigma_smudge={smudging_stddev:.3g}, but {parties} such "
                f"shares break the 1/8 decision margin "
                f"(4*sigma_total={4 * total:.3g}); max achievable on this "
                f"ciphertext is ~{max_lam:.1f} bits — use lower-noise "
                "parameters or an explicit smudging_stddev")
    dot = jnp.sum(
        sample.a[..., party, :] * secret_key.key, axis=-1, dtype=jnp.int32
    )
    smudge = dtot32(
        jax.random.normal(rng, dot.shape, jnp.float32)
        * jnp.float32(smudging_stddev)
    )
    return dot + smudge


def mk_combine_shares(sample: MKLweSample, shares) -> jax.Array:
    """Finish a distributed decryption from every party's share (no keys):
    sign of b - sum_i share_i."""
    total = jnp.sum(jnp.stack(list(shares)), axis=0)
    return (sample.b - total) > 0
