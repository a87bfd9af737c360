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


# --- Many-LUT: q tables per blind rotation (PBSmanyLUT) ---
#
# The blind rotation lands the accumulator at v * X^(-p) with
# p = m*w + w/2 + e; the single-LUT path only ever reads coefficient 0.
# Rounding the modulus switch to multiples of q (one coarser switch: the
# 2N/q grid) pins p = w/2 (mod q), so coefficients 0..q-1 of the SAME
# rotated polynomial stably address q interleaved tables:
# v[m*w + r] = T_{r mod q}[m]. One rotation then yields q LUT outputs —
# extraction at coefficient r is an exact monomial shift, not a rotation.
# Price: the mod-switch rounding error grows by q (in torus units
# q*sqrt(n/48)/2N ~ 0.0035 at q=2, 128-bit preset — small against the
# fresh-sample phase noise that dominates the window margin).
# Technique: Chillotti-Ligier-Orfila-Tap, "Improved Programmable
# Bootstrapping..." (the PBSmanyLUT of modern integer-FHE stacks).


def lut_many_test_polynomial(tables, space: int, q: int,
                             polynomial_degree: int):
    """tables int[..., q, S] -> v[..., N] with v[m*w + r] = enc(T_{r%q}[m])."""
    tables = jnp.asarray(tables, jnp.int32)
    assert tables.shape[-2] == q and tables.shape[-1] == space
    w = polynomial_degree // space
    assert w * space == polynomial_degree and w % q == 0
    enc = encode_pbs(tables, space)  # [..., q, S]
    cols = enc[..., jnp.arange(w) % q, :]  # [..., w, S]
    v = jnp.moveaxis(cols, -2, -1)  # [..., S, w]
    return v.reshape(v.shape[:-2] + (space * w,))


def programmable_bootstrap_many_wo_keyswitch(bk: BootstrapKey, tables,
                                             x: LweSample, space: int,
                                             q: int) -> LweSample:
    """q LUT evaluations per sample from ONE blind rotation.

    tables: int[..., q, S] (leading dims broadcast against x's batch);
    returns samples with batch shape x.batch + (q,) in the extracted
    (N*k)-dim space, entry r holding tables[r][m].
    """
    from . import polynomial
    from .bootstrap import blind_rotate
    from .tlwe import (tlwe_extract_sample, tlwe_mul_by_monomial,
                       tlwe_noiseless_trivial)

    p_degree = bk.polynomial_degree
    w = p_degree // space
    assert q >= 1 and (q & (q - 1)) == 0 and (w // 2) % q == 0, (q, w)
    batch_shape = x.b.shape
    flat = LweSample(
        x.a.reshape((-1, x.a.shape[-1])), x.b.reshape(-1), x.cv.reshape(-1)
    )
    grid = (p_degree * 2) // q
    bara = decode_message(flat.a, grid) * jnp.int32(q)
    barb = decode_message(flat.b, grid) * jnp.int32(q) + jnp.int32(w // 2)
    testvect = jnp.broadcast_to(
        lut_many_test_polynomial(tables, space, q, p_degree),
        batch_shape + (p_degree,),
    ).reshape((-1, p_degree))
    accum = tlwe_noiseless_trivial(
        polynomial.mul_by_monomial(testvect, -barb), bk.mask_size)
    accum = blind_rotate(accum, bk, bara)
    outs = []
    for r in range(q):
        rot = tlwe_mul_by_monomial(accum, jnp.int32(-r)) if r else accum
        outs.append(tlwe_extract_sample(rot))
    a = jnp.stack([o.a for o in outs], axis=-2)
    b = jnp.stack([o.b for o in outs], axis=-1)
    cv = jnp.stack([o.cv for o in outs], axis=-1)
    return LweSample(
        a.reshape(batch_shape + (q, a.shape[-1])),
        b.reshape(batch_shape + (q,)),
        cv.reshape(batch_shape + (q,)),
    )


def programmable_bootstrap_many(bk: BootstrapKey, ks: KeyswitchKey, tables,
                                x: LweSample, space: int,
                                q: int) -> LweSample:
    """q LUT outputs per input sample, one blind rotation + one keyswitch
    batch; result batch shape x.batch + (q,)."""
    return keyswitch(ks, programmable_bootstrap_many_wo_keyswitch(
        bk, tables, x, space, q))


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


def mk_programmable_bootstrap_many(bk, ks_keys, tables, x, space: int,
                                   q: int, segments: int = 1):
    """Multi-key PBSmanyLUT: q LUT outputs per MK blind rotation.

    Identical construction to `programmable_bootstrap_many` on the MK
    rotation: 2N/q-grid modulus switch, interleaved test polynomial,
    extraction at coefficients 0..q-1 (exact monomial shifts). Result
    batch shape x.batch + (q,).
    """
    from . import polynomial
    from .mk.internals import (mk_blind_rotate, mk_keyswitch,
                               mk_tlwe_extract_sample,
                               mk_tlwe_noiseless_trivial)
    from .tlwe import TLweSample

    p_degree = bk.polynomial_degree
    w = p_degree // space
    assert q >= 1 and (q & (q - 1)) == 0 and (w // 2) % q == 0, (q, w)
    grid = (p_degree * 2) // q
    bara = decode_message(x.a, grid) * jnp.int32(q)
    barb = decode_message(x.b, grid) * jnp.int32(q) + jnp.int32(w // 2)
    testvect = jnp.broadcast_to(
        lut_many_test_polynomial(tables, space, q, p_degree),
        x.b.shape + (p_degree,),
    )
    accum = mk_tlwe_noiseless_trivial(
        polynomial.mul_by_monomial(testvect, -barb), bk.parties)
    accum = mk_blind_rotate(accum, bk, bara, segments)
    outs = []
    for r in range(q):
        rot = (TLweSample(polynomial.mul_by_monomial(
            accum.a, jnp.int32(-r)), accum.cv) if r else accum)
        outs.append(mk_keyswitch(ks_keys, mk_tlwe_extract_sample(rot)))
    from .mk.internals import MKLweSample
    return MKLweSample(
        jnp.stack([o.a for o in outs], axis=-3),
        jnp.stack([o.b for o in outs], axis=-1),
        jnp.stack([o.cv for o in outs], axis=-1),
    )
