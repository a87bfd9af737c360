"""LWE-to-LWE key switching as a dense one-hot MXU contraction.

TPU-native counterpart of the reference's keyswitch layer
(reference: src/keyswitch.jl:1-80). The reference walks the digit table with
data-dependent skips (`if a[i,j] != 0`, src/keyswitch.jl:73); here the table
gets an explicit zero row at digit 0 (provably identical, SURVEY.md section 2
item 3) and the whole accumulation becomes ONE int8 matmul of the batched
digit one-hots against a limb-split key table — gather-free, MXU-resident.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .lwe import LweSample
from .numeric import dtot32, rand_uniform_torus32
from .ops.conv import split_torus_limbs


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["table_limbs"],
    meta_fields=["n_in", "n_out", "decomp_length", "log2_base",
                 "noise_stddev"],
)
@dataclasses.dataclass(frozen=True)
class KeyswitchKey:
    """Prepared keyswitch key.

    table_limbs: int8[l*base*n_in, 4*cols_p] — the (j-major, then h, then i)
    flattened table of LWE samples Enc(s_in[i] * h * 2^(32-(j+1)*b)), with a
    zero row at h=0 and the int32 words split into 4 balanced signed limbs;
    cols_p = n_out+1 rounded up to a lane multiple (a || b columns, padded).
    Row order puts n_in INNERMOST so the gate-time one-hot builds as
    [..., l, base, n_in] with n_in on the TPU lane axis — the previous
    (i, j, h) order forced base(=4)-innermost intermediates that XLA pads
    32x to the 128-lane tile (8 GB of temp at radix batch sizes).
    Reference layout being flattened: ks[h,j,i] at src/keyswitch.jl:36-38.
    """

    table_limbs: jax.Array
    n_in: int
    n_out: int
    decomp_length: int
    log2_base: int
    noise_stddev: float = 0.0  # keygen sigma, feeds the honest cv model


def prepare_keyswitch_table(ks_a, ks_b, n_out: int) -> jax.Array:
    """Pack the raw table (ks_a: int32[base-1, l, n_in, n_out],
    ks_b: int32[base-1, l, n_in]) into the matmul operand described above."""
    bm1, l, n_in, _ = ks_a.shape
    cols = n_out + 1
    cols_p = _round_up(cols, 128)
    tbl = jnp.concatenate([ks_a, ks_b[..., None]], axis=-1)  # [base-1, l, n_in, cols]
    tbl = jnp.pad(tbl, ((1, 0), (0, 0), (0, 0), (0, cols_p - cols)))  # zero h=0 row
    # (j, h, i) row order — n_in innermost (see KeyswitchKey docstring)
    tbl = tbl.transpose(1, 0, 2, 3).reshape(l * (bm1 + 1) * n_in, cols_p)
    limbs = split_torus_limbs(tbl)  # [4, K_dim, cols_p]
    return limbs.transpose(1, 0, 2).reshape(-1, 4 * cols_p)


def keyswitch_key_core(in_key, out_key, a_uniform, noise_t32,
                       decomp_length: int, log2_base: int,
                       noise_stddev: float = 0.0) -> KeyswitchKey:
    """Deterministic keyswitch keygen with injected randomness.

    in_key: int32[n_in] (extracted TLWE key); out_key: int32[n_out];
    a_uniform: int32[base-1, l, n_in, n_out]; noise_t32: int32[base-1, l, n_in].
    ks[h,j,i] = Enc(s_in[i] * (h+1) * 2^(32-(j+1)*b)).
    Reference: src/keyswitch.jl:28-38.
    """
    base = 1 << log2_base
    n_in = in_key.shape[0]
    n_out = out_key.shape[0]
    h = jnp.arange(1, base, dtype=jnp.int32)  # [base-1]
    j = jnp.arange(1, decomp_length + 1, dtype=jnp.int32)  # [l]
    message = (in_key[None, None, :] * h[:, None, None]) << (
        32 - j[None, :, None] * log2_base
    )  # [base-1, l, n_in]
    b = message + jnp.asarray(noise_t32, jnp.int32)
    b = b + jnp.sum(a_uniform * out_key, axis=-1, dtype=jnp.int32)
    return KeyswitchKey(
        prepare_keyswitch_table(a_uniform, b, n_out),
        n_in, n_out, decomp_length, log2_base, noise_stddev,
    )


def keyswitch_key_gen(rng, alpha: float, in_key, out_key,
                      decomp_length: int, log2_base: int) -> KeyswitchKey:
    """Fresh keyswitch key with the reference's recentred-noise recipe.

    Noise matrix is N(0, alpha^2) floats of shape (n_in, l, base-1) recentred
    to zero mean, then truncated to the torus. Reference: src/keyswitch.jl:28-29.
    """
    base = 1 << log2_base
    n_in = in_key.shape[0]
    n_out = out_key.shape[0]
    rng_n, rng_a = jax.random.split(rng)
    noise = jax.random.normal(
        rng_n, (n_in, decomp_length, base - 1), jnp.float32
    ) * jnp.float32(alpha)
    noise = noise - jnp.mean(noise)
    a = rand_uniform_torus32(rng_a, (base - 1, decomp_length, n_in, n_out))
    return keyswitch_key_core(
        in_key, out_key, a, dtot32(noise.transpose(2, 1, 0)),
        decomp_length, log2_base, noise_stddev=alpha,
    )


def keyswitch_digits(a, decomp_length: int, log2_base: int) -> jax.Array:
    """Round a[..., n_in] to l*b bits and extract unsigned digits
    [..., l, n_in] in [0, base) — n_in kept INNERMOST (lane axis); a
    trailing l would be padded 16x to the 128-lane tile.
    Reference: src/keyswitch.jl:58-67."""
    prec_offset = jnp.int32(1 << (32 - (1 + log2_base * decomp_length)))
    mask = jnp.int32((1 << log2_base) - 1)
    aibar = jnp.asarray(a, jnp.int32) + prec_offset
    shifts = jnp.asarray(
        [32 - (j + 1) * log2_base for j in range(decomp_length)], jnp.int32
    )
    return (aibar[..., None, :] >> shifts[:, None]) & mask


def keyswitch_onehot(a, decomp_length: int, log2_base: int) -> jax.Array:
    """One-hot digit operand int8[..., l*base*n_in] in the table's (j, h, i)
    row order — every intermediate keeps n_in on the lane axis."""
    base = 1 << log2_base
    digits = keyswitch_digits(a, decomp_length, log2_base)  # [..., l, n_in]
    onehot = (digits[..., None, :]
              == jnp.arange(base, dtype=jnp.int32)[:, None]).astype(jnp.int8)
    # [..., l, base, n_in] -> flat (j, h, i)
    return onehot.reshape(onehot.shape[:-3] + (-1,))


def keyswitch(ks: KeyswitchKey, sample: LweSample) -> LweSample:
    """Switch a batch of (n_in)-dim samples to the out-key's (n_out)-dim space.

    result = (0, b) - sum_{i,j} ks[digit_ij, j, i], computed as a single
    one-hot int8 contraction against the limb-split table.
    Reference: src/keyswitch.jl:45-80.
    """
    l, b = ks.decomp_length, ks.log2_base
    base = 1 << b
    cols_p = ks.table_limbs.shape[-1] // 4
    batch_shape = sample.b.shape

    onehot = keyswitch_onehot(sample.a, l, b).reshape(
        (-1, l * base * ks.n_in))

    prods = jax.lax.dot_general(
        onehot, ks.table_limbs,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape((-1, 4, cols_p))
    acc = jnp.zeros((prods.shape[0], cols_p), jnp.int32)
    for limb in range(4):
        acc = acc + (prods[:, limb, :] << (8 * limb))
    acc = acc.reshape(batch_shape + (cols_p,))

    a_out = -acc[..., : ks.n_out]
    b_out = sample.b - acc[..., ks.n_out]
    from .noise import keyswitch_var

    cv = sample.cv + keyswitch_var(ks.n_in, l, b, ks.noise_stddev)
    return LweSample(a_out, b_out, cv)
