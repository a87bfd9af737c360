"""Compact (prepared-limb) bootstrap keys: the multi-tenant serving form.

TuningConfig.bs_bake_budget keeps the key in prepared limbs
(int8[n, 4, P, K, 2N], ~T x smaller than the bakes) and the blind rotation
expands each step's Toeplitz rows on the fly. Both the fused-kernel path
(interpret here) and the XLA prepared fallback must be bitwise identical
to the baked rotation; gates must decrypt through the public API.
docs/serving.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import gates, tuning


@pytest.fixture(scope="module")
def baked_keys():
    params = tt.tfhe_parameters_toy()
    return params, *tt.make_key_pair(jax.random.PRNGKey(9), params)


@pytest.fixture(scope="module")
def compact_keys():
    params = tt.tfhe_parameters_toy()
    with tuning.override(bs_bake_budget=0):  # force the compact form
        sk, ck = tt.make_key_pair(jax.random.PRNGKey(9), params)
    assert ck.bootstrap_key.compact
    return params, sk, ck


def test_compact_key_bytes(baked_keys, compact_keys):
    baked = baked_keys[2].bootstrap_key
    compact = compact_keys[2].bootstrap_key
    assert compact.baked.dtype == jnp.int8
    # prepared form: [n, 4, P, K, 2N]
    n, k1 = baked.n, baked.mask_size + 1
    p = k1 * baked.decomp_length
    assert compact.baked.shape == (
        n, 4, p, k1, 2 * baked.polynomial_degree)
    assert compact.baked.size * 16 < baked.baked.size  # >=16x smaller


@pytest.mark.parametrize("cmux", ["pallas", "xla"])
def test_compact_blind_rotate_bit_identical(baked_keys, compact_keys, cmux):
    """Compact rotation (fused expand kernel AND the XLA prepared fallback)
    == the baked rotation, bitwise, on random accumulators."""
    import tfhe_tpu.bootstrap as bs
    from tfhe_tpu.tlwe import TLweSample

    params, _, ck_b = baked_keys
    _, _, ck_c = compact_keys
    rng = np.random.default_rng(4)
    B = 8
    n = params.tlwe_polynomial_degree
    acc0 = rng.integers(-(2**31), 2**31, (B, 2, n), dtype=np.int64).astype(
        np.int32)
    bara = rng.integers(0, 2 * n, (B, params.lwe_size)).astype(np.int32)

    want = bs.blind_rotate(
        TLweSample(jnp.asarray(acc0), jnp.zeros(B, jnp.float32)),
        ck_b.bootstrap_key, jnp.asarray(bara)).a
    with tuning.override(cmux=cmux):
        got = bs.blind_rotate(
            TLweSample(jnp.asarray(acc0), jnp.zeros(B, jnp.float32)),
            ck_c.bootstrap_key, jnp.asarray(bara)).a
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_compact_gate_round_trip(compact_keys):
    params, sk, ck = compact_keys
    B = 8
    bits_x = jnp.arange(B) % 2 == 0
    bits_y = jnp.arange(B) % 3 == 0
    cx = tt.encrypt(jax.random.PRNGKey(1), sk, bits_x)
    cy = tt.encrypt(jax.random.PRNGKey(2), sk, bits_y)
    out = tt.decrypt(sk, jax.jit(gates.gate_nand)(ck, cx, cy))
    np.testing.assert_array_equal(
        np.asarray(out), ~(np.asarray(bits_x) & np.asarray(bits_y)))


def test_budget_threshold_selects_form():
    """bs_bake_budget > 0: bake iff the baked key fits the byte budget."""
    params = tt.tfhe_parameters_toy()
    with tuning.override(bs_bake_budget=1):  # nothing fits 1 byte
        _, ck = tt.make_key_pair(jax.random.PRNGKey(3), params)
    assert ck.bootstrap_key.compact
    with tuning.override(bs_bake_budget=1 << 40):  # everything fits
        _, ck = tt.make_key_pair(jax.random.PRNGKey(3), params)
    assert not ck.bootstrap_key.compact


def test_compact_key_serialization_round_trip(compact_keys, tmp_path):
    from tfhe_tpu.utils import serialization as ser

    _, _, ck = compact_keys
    path = tmp_path / "ck.npz"
    ser.save(ck, str(path))
    back = ser.load(str(path))
    assert back.bootstrap_key.compact
    np.testing.assert_array_equal(
        np.asarray(back.bootstrap_key.baked),
        np.asarray(ck.bootstrap_key.baked))


@pytest.mark.parametrize("btc,group_budget", [(1, 1 << 30), (2, 4096)])
def test_compact_megakernel_tiling_bit_identical(baked_keys, compact_keys,
                                                 btc, group_budget):
    """The compact megakernel (in-kernel Toeplitz expansion, resident
    accumulator) is bitwise identical to the baked rotation across its
    tiling axes: per-cell batch tile (btc) and the resident-group budget
    (the (2, 4096) case forces multiple groups, each re-running the
    per-step expansion)."""
    import tfhe_tpu.bootstrap as bs
    from tfhe_tpu.ops.pallas_cmux import blind_rotate_pallas_compact
    from tfhe_tpu.tgsw import decomp_offset
    from tfhe_tpu.tlwe import TLweSample

    params, _, ck_b = baked_keys
    _, _, ck_c = compact_keys
    rng = np.random.default_rng(11 + btc)
    B = 4
    n = params.tlwe_polynomial_degree
    acc0 = rng.integers(-(2**31), 2**31, (B, 2, n), dtype=np.int64).astype(
        np.int32)
    bara = rng.integers(0, 2 * n, (B, params.lwe_size)).astype(np.int32)

    want = bs.blind_rotate(
        TLweSample(jnp.asarray(acc0), jnp.zeros(B, jnp.float32)),
        ck_b.bootstrap_key, jnp.asarray(bara)).a
    bk = ck_c.bootstrap_key
    got = blind_rotate_pallas_compact(
        jnp.asarray(acc0), bk.baked,
        jnp.swapaxes(jnp.asarray(bara), 0, 1),
        n=n, k1=bk.mask_size + 1, l=bk.decomp_length, b=bk.log2_base,
        t=bk.block, plan=bk.plan,
        offset=decomp_offset(bk.decomp_length, bk.log2_base, bk.balanced),
        interpret=True, btc=btc, group_budget=group_budget)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
