"""Programmable bootstrapping: arbitrary lookup tables in one bootstrap.

Capability extension beyond the reference, whose bootstrap is sign-only —
a constant-mu test vector (src/bootstrap.jl:69-82). The blind rotation
itself already evaluates `testvector[phase_index]` for free; encoding a
lookup table into the test polynomial turns each bootstrap into an exact
S-entry table evaluation (the primitive behind modern integer-FHE stacks).
Runs on the same baked keys and fused Pallas megakernels as the gates.

Encoding (one padding bit): message m in [0, S) has phase m/(2S), so the
mod-switched rotation index is mu = m*(N/S) +- noise, always in the first
half of the 2N ring. A half-window pre-rotation (barb + w/2, exact int
arithmetic after the modulus switch) recenters each message's noise window
to [m*w, (m+1)*w), so the negacyclic wrap can never flip the sign of the
extracted coefficient, and the test polynomial simply repeats each LUT
entry w = N/S times. Correctness requires |phase noise| < 1/(4S) — the
gate presets (1/16 margin) support S <= 4 fresh->fresh chains; larger S
needs the same margin analysis as any TFHE parameter choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .api import SecretKey
from .bootstrap import BootstrapKey, blind_rotate_and_extract
from .keyswitch import KeyswitchKey, keyswitch
from .lwe import LweSample, lwe_encrypt, lwe_phase
from .numeric import decode_message


def _log2(space: int) -> int:
    log2_s = space.bit_length() - 1
    assert 1 << log2_s == space, "message space must be a power of 2"
    return log2_s


def encode_pbs(message, space: int):
    """m in [0, S) -> torus phase m/(2S) (one padding bit)."""
    shift = 32 - (_log2(space) + 1)
    return (jnp.asarray(message, jnp.int32) << shift).astype(jnp.int32)


def decode_pbs(phase, space: int):
    """Torus phase -> nearest message in [0, S) (mod 2S on the ring)."""
    return decode_message(phase, 2 * space) % (2 * space)


def encrypt_pbs(rng, key: SecretKey, message, space: int) -> LweSample:
    """Encrypt integer message(s) in [0, S) under the PBS encoding."""
    mu = encode_pbs(message, space)
    return lwe_encrypt(rng, mu, key.params.lwe_noise_stddev, key.key)


def decrypt_pbs(key: SecretKey, sample: LweSample, space: int) -> jax.Array:
    """Decrypt to integer message(s) in [0, 2S) (values >= S mean failure)."""
    return decode_pbs(lwe_phase(sample, key.key), space)


def lut_test_polynomial(table, space: int, polynomial_degree: int):
    """LUT (plaintext ints in [0, S), shape [..., S]) -> test polynomial.

    Each entry is repeated across its w = N/S index window; outputs carry
    the same PBS encoding, so bootstraps compose.
    """
    table = jnp.asarray(table, jnp.int32)
    assert table.shape[-1] == space
    w = polynomial_degree // space
    assert w * space == polynomial_degree
    return jnp.repeat(encode_pbs(table, space), w, axis=-1)


def programmable_bootstrap_wo_keyswitch(bk: BootstrapKey, table,
                                        x: LweSample,
                                        space: int) -> LweSample:
    """The LUT blind rotation, in the extracted (N*k)-dim LWE space.

    table: int[..., S] plaintext LUT (leading dims broadcast against x's
    batch shape — per-sample tables are allowed). Reuses the gate
    bootstrap's blind rotation verbatim; only the test vector and the
    half-window pre-rotation differ (reference sign-bootstrap:
    src/bootstrap.jl:69-82).
    """
    p_degree = bk.polynomial_degree
    w = p_degree // space
    batch_shape = x.b.shape
    flat = LweSample(
        x.a.reshape((-1, x.a.shape[-1])), x.b.reshape(-1), x.cv.reshape(-1)
    )
    bara = decode_message(flat.a, p_degree * 2)
    barb = decode_message(flat.b, p_degree * 2) + jnp.int32(w // 2)
    testvect = jnp.broadcast_to(
        lut_test_polynomial(table, space, p_degree),
        batch_shape + (p_degree,),
    ).reshape((-1, p_degree))
    out = blind_rotate_and_extract(testvect, bk, barb, bara)
    return LweSample(
        out.a.reshape(batch_shape + (out.a.shape[-1],)),
        out.b.reshape(batch_shape),
        out.cv.reshape(batch_shape),
    )


def programmable_bootstrap(bk: BootstrapKey, ks: KeyswitchKey, table,
                           x: LweSample, space: int) -> LweSample:
    """LWE(table[m]/(2S)) from LWE(m/(2S)): one LUT evaluation per sample."""
    return keyswitch(ks, programmable_bootstrap_wo_keyswitch(
        bk, table, x, space))


# --- Multi-key PBS: the MK bootstrap generalizes identically ---


def mk_encrypt_pbs(rng, secret_keys, message, space: int):
    """Joint MK encryption of integer message(s) in [0, S) (PBS encoding)."""
    from .mk.internals import MKLweSample
    from .numeric import dtot32, rand_uniform_torus32

    params = secret_keys[0].params
    parties, n = len(secret_keys), params.lwe_size
    mu = encode_pbs(message, space)
    rng_a, rng_e = jax.random.split(rng)
    a = rand_uniform_torus32(rng_a, mu.shape + (parties, n))
    keys = jnp.stack([sk.key for sk in secret_keys])
    b = mu + dtot32(
        jax.random.normal(rng_e, mu.shape, jnp.float32)
        * jnp.float32(params.lwe_noise_stddev))
    b = b + jnp.sum(a * keys, axis=(-1, -2), dtype=jnp.int32)
    return MKLweSample(
        a, b, jnp.full(b.shape, params.lwe_noise_stddev**2, jnp.float32))


def mk_decrypt_pbs(secret_keys, sample, space: int):
    """Joint MK decryption to integer message(s) in [0, 2S)."""
    from .mk.internals import mk_lwe_phase

    keys = jnp.stack([sk.key for sk in secret_keys])
    return decode_pbs(mk_lwe_phase(sample, keys), space)


def mk_programmable_bootstrap(bk, ks_keys, table, x, space: int,
                              segments: int = 1):
    """Multi-key LUT evaluation: one MK bootstrap per sample.

    Same construction as `programmable_bootstrap` on the MK blind rotation
    (reference sign-only analogue: src/mk_internals.jl:498-515).
    """
    from .mk.internals import mk_blind_rotate_and_extract, mk_keyswitch

    p_degree = bk.polynomial_degree
    w = p_degree // space
    bara = decode_message(x.a, p_degree * 2)
    barb = decode_message(x.b, p_degree * 2) + jnp.int32(w // 2)
    testvect = jnp.broadcast_to(
        lut_test_polynomial(table, space, p_degree),
        x.b.shape + (p_degree,),
    )
    u = mk_blind_rotate_and_extract(testvect, bk, barb, bara, segments)
    return mk_keyswitch(ks_keys, u)
