"""Seeded (compressed) ciphertexts and keys.

Every uniform mask in the scheme is pseudorandom output of a PRNG, so a
ciphertext or key can travel as (PRNG seed, bodies) and the receiver
regenerates the masks locally — the standard "seeded" compression of modern
TFHE stacks. The reference has no wire format at all, but its MK ceremony
implies one (CloudKeyPart travels party -> server,
reference: examples/multikey.jl:19-23); this module makes that wire format
small:

* `SeededLweSample` — (seed, b): n+1 torus words -> 1 per ciphertext
  (~500x for the shipped presets). Expansion is bit-identical to
  `api.encrypt` with the same rng (same split discipline).
* `SeededKeyswitchKey` — (seed, b[base-1, l, n_in]): the 49 MB prepared
  table (reference layout src/keyswitch.jl:36-38) travels as ~100 KB.
  Expansion is bit-identical to `keyswitch_key_gen` with the same rng.
* `SeededBootstrapKey` — (seed, bodies[n, l, k+1, N]). The gadget message
  lands on mask rows in the reference's TGSW layout (src/tgsw.jl:52-72),
  which would make masks non-pseudorandom; here each row (i, j<k) carries
  the equivalent message -m*g_i*s_j in its BODY instead (identical phase,
  hence identical external-product semantics and noise; the row-(i,k)
  message +m*g_i stays on the body's constant term). Masks are then pure
  PRNG output and the key ships at half the raw coefficient size — and
  ~1000x smaller than the server's baked MXU form, which is rebuilt
  locally on expansion.
* `SeededCloudKey` — params + the two seeded keys: the whole evaluation
  key ships in one small artifact.

All of it round-trips through `utils.serialization` like every other type.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .api import CloudKey, SecretKey
from .bootstrap import BootstrapKey, bootstrap_key_from_raw
from .keyswitch import KeyswitchKey, keyswitch_key_core
from .lwe import LweSample, lwe_encrypt_core
from .numeric import dtot32, encode_message, rand_uniform_torus32
from .params import SchemeParameters
from .tgsw import gadget_values
from .tlwe import extract_lwe_key, tlwe_encrypt_zero_core, tlwe_key_gen


def _seed_data(rng) -> jax.Array:
    """Raw array form of a PRNG key (handles typed and legacy keys)."""
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(rng)
    return rng


def _seed_key(data: jax.Array):
    """PRNG key usable by jax.random from stored raw data (threefry)."""
    if jnp.issubdtype(data.dtype, jax.dtypes.prng_key):
        return data
    return jax.random.wrap_key_data(jnp.asarray(data, jnp.uint32))


# ---------------------------------------------------------------------------
# Seeded LWE ciphertexts
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["seed", "b", "cv"],
    meta_fields=["n"],
)
@dataclasses.dataclass(frozen=True)
class SeededLweSample:
    """Batch of fresh LWE ciphertexts as (mask seed, bodies).

    seed: uint32 raw PRNG key data; b: int32[...]; n: the LWE dimension the
    masks expand to. One seed covers the whole batch (the mask tensor is one
    PRNG draw, exactly as in `lwe.lwe_encrypt`).
    """

    seed: jax.Array
    b: jax.Array
    cv: jax.Array
    n: int

    @property
    def batch_shape(self):
        return self.b.shape


def encrypt_seeded(rng, key: SecretKey, message) -> SeededLweSample:
    """Seeded twin of `api.encrypt`: same rng discipline, 1 word/ciphertext.

    `expand_lwe(encrypt_seeded(rng, sk, m))` is bit-identical to
    `api.encrypt(rng, sk, m)`.
    """
    message = jnp.asarray(message, bool)
    mu = jnp.where(
        message,
        jnp.int32(encode_message(1, 8)),
        jnp.int32(encode_message(-1, 8)),
    )
    alpha = key.params.lwe_noise_stddev
    rng_a, rng_e = jax.random.split(rng)
    n = key.key.shape[-1]
    a = rand_uniform_torus32(rng_a, mu.shape + (n,))
    noise = dtot32(jax.random.normal(rng_e, mu.shape, jnp.float32) * alpha)
    sample = lwe_encrypt_core(mu, a, noise, key.key)
    return SeededLweSample(
        _seed_data(rng_a), sample.b,
        jnp.full(sample.b.shape, alpha**2, jnp.float32), n,
    )


def expand_lwe(sample: SeededLweSample) -> LweSample:
    """Regenerate the masks from the seed: the full LweSample."""
    a = rand_uniform_torus32(_seed_key(sample.seed),
                             sample.b.shape + (sample.n,))
    return LweSample(a, sample.b, sample.cv)


# ---------------------------------------------------------------------------
# Seeded keyswitch key
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["seed", "b"],
    meta_fields=["n_in", "n_out", "decomp_length", "log2_base",
                 "noise_stddev"],
)
@dataclasses.dataclass(frozen=True)
class SeededKeyswitchKey:
    """Keyswitch key as (mask seed, bodies b[base-1, l, n_in]).

    Expansion rebuilds the prepared one-hot matmul table
    (keyswitch.prepare_keyswitch_table) bit-identically to
    `keyswitch_key_gen` run with the same rng.
    """

    seed: jax.Array
    b: jax.Array
    n_in: int
    n_out: int
    decomp_length: int
    log2_base: int
    noise_stddev: float = 0.0


def keyswitch_key_gen_seeded(rng, alpha: float, in_key, out_key,
                             decomp_length: int,
                             log2_base: int) -> SeededKeyswitchKey:
    """Seeded twin of `keyswitch_key_gen` (same rng splits, same recentred
    noise recipe; reference: src/keyswitch.jl:28-38)."""
    base = 1 << log2_base
    n_in = in_key.shape[0]
    n_out = out_key.shape[0]
    rng_n, rng_a = jax.random.split(rng)
    noise = jax.random.normal(
        rng_n, (n_in, decomp_length, base - 1), jnp.float32
    ) * jnp.float32(alpha)
    noise = noise - jnp.mean(noise)
    a = rand_uniform_torus32(rng_a, (base - 1, decomp_length, n_in, n_out))
    h = jnp.arange(1, base, dtype=jnp.int32)
    j = jnp.arange(1, decomp_length + 1, dtype=jnp.int32)
    message = (in_key[None, None, :] * h[:, None, None]) << (
        32 - j[None, :, None] * log2_base
    )
    b = message + dtot32(noise.transpose(2, 1, 0))
    b = b + jnp.sum(a * out_key, axis=-1, dtype=jnp.int32)
    return SeededKeyswitchKey(
        _seed_data(rng_a), b, n_in, n_out, decomp_length, log2_base,
        noise_stddev=alpha,
    )


def expand_keyswitch_key(ks: SeededKeyswitchKey) -> KeyswitchKey:
    """Regenerate masks and rebuild the prepared limb table."""
    from .keyswitch import prepare_keyswitch_table

    base = 1 << ks.log2_base
    a = rand_uniform_torus32(
        _seed_key(ks.seed),
        (base - 1, ks.decomp_length, ks.n_in, ks.n_out),
    )
    return KeyswitchKey(
        prepare_keyswitch_table(a, ks.b, ks.n_out),
        ks.n_in, ks.n_out, ks.decomp_length, ks.log2_base, ks.noise_stddev,
    )


# ---------------------------------------------------------------------------
# Seeded bootstrap key
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["seed", "body"],
    meta_fields=["decomp_length", "log2_base", "polynomial_degree",
                 "mask_size", "noise_stddev", "balanced"],
)
@dataclasses.dataclass(frozen=True)
class SeededBootstrapKey:
    """Bootstrap key as (mask seed, row bodies int32[n, l, k+1, N]).

    Rows use the body-side message placement (module docstring): phases —
    and therefore blind-rotation semantics and noise — match the reference's
    TGSW layout (src/tgsw.jl:52-72) exactly, while every mask stays pure
    PRNG output.
    """

    seed: jax.Array
    body: jax.Array
    decomp_length: int
    log2_base: int
    polynomial_degree: int
    mask_size: int
    noise_stddev: float = 0.0
    balanced: bool = False  # gate-time gadget rounding (tgsw.decomp_offset)

    @property
    def n(self) -> int:
        return self.body.shape[0]


def bootstrap_key_gen_seeded(rng, alpha: float, lwe_key, tlwe_key,
                             decomp_length: int, log2_base: int,
                             balanced: bool = False) -> SeededBootstrapKey:
    """TGSW-encrypt each LWE key bit with body-side message placement.

    Reference semantics: src/bootstrap.jl:6-15 + src/tgsw.jl:52-88; the
    message m*g_i moves from mask row j's constant coefficient into the
    body as -m*g_i*s_j (identical phase per row).
    """
    n = lwe_key.shape[0]
    k, poly_n = tlwe_key.shape
    l = decomp_length
    rng_a, rng_e = jax.random.split(rng)
    a_part = rand_uniform_torus32(rng_a, (n, l, k + 1, k, poly_n))
    noise = dtot32(
        jax.random.normal(rng_e, (n, l, k + 1, poly_n), jnp.float32)
        * alpha
    )
    body = tlwe_encrypt_zero_core(a_part, noise, tlwe_key).a[..., -1, :]
    g = gadget_values(l, log2_base)  # [l]
    mg = jnp.asarray(lwe_key, jnp.int32)[:, None] * g[None, :]  # [n, l]
    mask_row_bump = -(mg[:, :, None, None] * tlwe_key[None, None, :, :])
    const_coeff = jnp.zeros((poly_n,), jnp.int32).at[0].set(1)
    body_row_bump = mg[:, :, None] * const_coeff
    bump = jnp.concatenate(
        [mask_row_bump, body_row_bump[:, :, None, :]], axis=2
    )  # [n, l, k+1, N]
    return SeededBootstrapKey(
        _seed_data(rng_a), body + bump, l, log2_base, poly_n, k,
        noise_stddev=alpha, balanced=balanced,
    )


def expand_bootstrap_key(bk: SeededBootstrapKey, block: int | None = None,
                         depth: int | None = None) -> BootstrapKey:
    """Regenerate masks, reassemble raw TGSW rows, and bake the MXU form."""
    n, l = bk.body.shape[0], bk.decomp_length
    k, poly_n = bk.mask_size, bk.polynomial_degree
    a_part = rand_uniform_torus32(_seed_key(bk.seed),
                                  (n, l, k + 1, k, poly_n))
    gsw = jnp.concatenate([a_part, bk.body[..., None, :]], axis=-2)
    return bootstrap_key_from_raw(gsw, l, bk.log2_base, block, depth,
                                  noise_stddev=bk.noise_stddev,
                                  balanced=bk.balanced)


# ---------------------------------------------------------------------------
# Seeded cloud key
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["bootstrap_key", "keyswitch_key"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class SeededCloudKey:
    """The full evaluation key as one small wire artifact."""

    params: SchemeParameters
    bootstrap_key: SeededBootstrapKey
    keyswitch_key: SeededKeyswitchKey


def make_seeded_cloud_key(rng, secret_key: SecretKey) -> SeededCloudKey:
    """Seeded twin of `api.make_cloud_key` (same 3-way rng split; the fresh
    internal TLWE key never leaves, reference: src/api.jl:111-127)."""
    params = secret_key.params
    rng_tlwe, rng_bs, rng_ks = jax.random.split(rng, 3)
    tlwe_key = tlwe_key_gen(
        rng_tlwe, params.tlwe_polynomial_degree, params.tlwe_mask_size
    )
    bs_key = bootstrap_key_gen_seeded(
        rng_bs, params.bs_noise_stddev, secret_key.key, tlwe_key,
        params.bs_decomp_length, params.bs_log2_base,
        balanced=params.gadget_balanced,
    )
    ks_key = keyswitch_key_gen_seeded(
        rng_ks, params.ks_noise_stddev,
        extract_lwe_key(tlwe_key), secret_key.key,
        params.ks_decomp_length, params.ks_log2_base,
    )
    return SeededCloudKey(params, bs_key, ks_key)


def expand_cloud_key(ck: SeededCloudKey, block: int | None = None,
                     depth: int | None = None) -> CloudKey:
    """Server-side expansion into the baked, jit-ready CloudKey."""
    return CloudKey(
        ck.params,
        expand_bootstrap_key(ck.bootstrap_key, block, depth),
        expand_keyswitch_key(ck.keyswitch_key),
    )


# ---------------------------------------------------------------------------
# Seeded multi-key ceremony artifacts
# ---------------------------------------------------------------------------
#
# The MK ceremony is where wire size actually matters (CloudKeyPart travels
# party -> server, reference: examples/multikey.jl:19-23). Seedable pieces:
# the SharedKey is pure public randomness (ships as ONE seed); inside each
# uni-encryption (reference: src/mk_internals.jl:185-227) c1 and f1 are
# uniform (2 of 6 polynomial vectors), and the party keyswitch key seeds as
# in the single-key case. The encryption randomness r and all noise draws
# come from sibling threefry subkeys that are never shipped, so publishing
# the c1/f1 subkeys reveals exactly the public values they already equal.


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["seed"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class SeededSharedKey:
    """The common reference string as a single PRNG seed."""

    params: SchemeParameters
    seed: jax.Array


def make_shared_key_seeded(rng, params: SchemeParameters) -> SeededSharedKey:
    """Seeded twin of `mk.make_shared_key`: expansion is bit-identical."""
    assert params.tlwe_mask_size == 1, "MK-TFHE requires k=1 (reference issue #2)"
    return SeededSharedKey(params, _seed_data(rng))


def expand_shared_key(sk: SeededSharedKey):
    from .mk.api import SharedKey
    from .mk.internals import shared_key_gen

    return SharedKey(
        sk.params,
        shared_key_gen(_seed_key(sk.seed), sk.params.bs_decomp_length,
                       sk.params.tlwe_polynomial_degree),
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["public_key", "ue_seeds", "ue_bodies", "keyswitch_key"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class SeededCloudKeyPart:
    """One party's ceremony contribution in seeded wire form.

    public_key: int32[l, N] bodies (masks ARE the shared key);
    ue_seeds: the c1/f1 PRNG subkeys, stacked [2, ...];
    ue_bodies: int32[n, 4, l, N] — the (c0, d0, d1, f0) rows of each
    uni-encryption; keyswitch_key: seeded party-local keyswitch key.
    Expansion is bit-identical to `mk.make_cloud_key_part` with the same rng.
    """

    params: SchemeParameters
    public_key: jax.Array
    ue_seeds: jax.Array
    ue_bodies: jax.Array
    keyswitch_key: SeededKeyswitchKey


def make_seeded_cloud_key_part(rng, secret_key: SecretKey,
                               shared) -> SeededCloudKeyPart:
    """Party-side seeded keygen (same rng discipline as
    `mk.make_cloud_key_part`, reference: src/mk_api.jl:66-76)."""
    from .mk.internals import mk_tgsw_encrypt, public_key_gen

    params = secret_key.params
    rng_tlwe, rng_pk, rng_bk, rng_ks = jax.random.split(rng, 4)
    tlwe_key = tlwe_key_gen(rng_tlwe, params.tlwe_polynomial_degree, 1)
    pk = public_key_gen(rng_pk, tlwe_key, params.bs_noise_stddev, shared.a)
    uni = mk_tgsw_encrypt(
        rng_bk, secret_key.key, params.bs_noise_stddev, tlwe_key, shared.a,
        pk, params.bs_decomp_length, params.bs_log2_base,
        batch_shape=(params.lwe_size,),
    )
    # mk_tgsw_encrypt's internal 7-way split: keys[1] -> c1, keys[2] -> f1.
    keys = jax.random.split(rng_bk, 7)
    ue_seeds = jnp.stack([_seed_data(keys[1]), _seed_data(keys[2])])
    ue_bodies = uni.cd[:, jnp.asarray([0, 2, 3, 4]), :, :]
    ks = keyswitch_key_gen_seeded(
        rng_ks, params.ks_noise_stddev, tlwe_key.reshape(-1), secret_key.key,
        params.ks_decomp_length, params.ks_log2_base,
    )
    return SeededCloudKeyPart(params, pk, ue_seeds, ue_bodies, ks)


def expand_cloud_key_part(part: SeededCloudKeyPart):
    """Server-side expansion into the full CloudKeyPart."""
    from .mk.api import CloudKeyPart
    from .mk.internals import MKTGswUESample

    params = part.params
    n = part.ue_bodies.shape[0]
    l = params.bs_decomp_length
    poly_n = params.tlwe_polynomial_degree
    c1 = rand_uniform_torus32(_seed_key(part.ue_seeds[0]), (n, l, poly_n))
    f1 = rand_uniform_torus32(_seed_key(part.ue_seeds[1]), (n, l, poly_n))
    c0, d0, d1, f0 = (part.ue_bodies[:, i] for i in range(4))
    cd = jnp.stack([c0, c1, d0, d1, f0, f1], axis=1)
    return CloudKeyPart(
        params, part.public_key, MKTGswUESample(cd),
        expand_keyswitch_key(part.keyswitch_key),
    )


# ---------------------------------------------------------------------------
# Post-compute ciphertext compression (modulus switching)
# ---------------------------------------------------------------------------
#
# Seeding only works for FRESH encryptions; results coming back from the
# server have computed masks. Those compress by modulus switching: round
# every torus word to the top `bits` bits (the same round-to-nearest the
# bootstrap's 2N-switch uses, reference: src/bootstrap.jl:74-75 via
# decode_message) and ship small integers. Rounding adds uniform noise of
# width 2^-bits per word; across the phase that is
# var ~= (1 + n/4) * 2^(-2*bits) / 12 (binary key, n/2 live terms of
# variance u^2/3... folded into the honest cv so telemetry stays truthful).
# 16 bits halves the result wire at ~7e-5 sigma — negligible against the
# 1/16 gate margin; 8 bits quarters it and stays inside the margin for
# final results that only face decryption.


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "b", "cv"],
    meta_fields=["bits"],
)
@dataclasses.dataclass(frozen=True)
class CompressedLweSample:
    """Modulus-switched LWE batch: words hold the top `bits` bits.

    a: [..., n], b: [...] hold values in [-2^(bits-1), 2^(bits-1)) at the
    narrowest integer dtype that fits (int8/int16/int32), so the
    serialized artifact really is `bits/32` of the full ciphertext.
    """

    a: jax.Array
    b: jax.Array
    cv: jax.Array
    bits: int


def _narrow_dtype(bits: int):
    return jnp.int8 if bits <= 8 else jnp.int16 if bits <= 16 else jnp.int32


def compress_lwe(sample: LweSample, bits: int = 16) -> CompressedLweSample:
    """Round a ciphertext batch to `bits`-bit torus words."""
    assert 1 < bits <= 32
    from .numeric import decode_message

    if bits == 32:
        return CompressedLweSample(sample.a, sample.b, sample.cv, bits)
    space = 1 << bits  # decode_message keeps log2(space) = bits top bits
    dt = _narrow_dtype(bits)
    a = decode_message(sample.a, space).astype(dt)
    b = decode_message(sample.b, space).astype(dt)
    n = sample.a.shape[-1]
    round_var = (1.0 + n / 4.0) * float(2.0 ** (-2 * bits)) / 12.0
    cv = sample.cv + jnp.float32(round_var)
    return CompressedLweSample(a, b, cv, bits)


def decompress_lwe(c: CompressedLweSample) -> LweSample:
    """Back to full torus words (top bits, zeros below)."""
    if c.bits == 32:
        return LweSample(c.a, c.b, c.cv)
    shift = 32 - c.bits
    return LweSample(
        (jnp.asarray(c.a, jnp.int32) << shift),
        (jnp.asarray(c.b, jnp.int32) << shift),
        c.cv,
    )
