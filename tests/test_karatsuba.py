"""Bit-exactness of the block-Karatsuba CMUX contraction vs the dense path.

The dense block-Toeplitz path (ops/conv.py) is oracle-exact (established by
tests/test_oracle_equivalence.py), so exact agreement here makes every
Karatsuba depth oracle-exact by composition. Covers depths 0-3, both digit
bases shipped in presets (2^7 and 2^10), adversarial extremes (digits at
+-B/2, torus words at -2^31), and MAC accounting.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu.ops import conv
from tfhe_tpu.ops.karatsuba import (
    bake_karatsuba,
    karatsuba_delta,
    karatsuba_plan,
)


def _dense_reference(digits, key, bound_bits):
    """Round-1 path: poly_mul_batched_small == sum_p conv(digits_p, key_pk)."""
    return np.asarray(conv.poly_mul_batched_small(digits, key, bound_bits))


def _random_case(rng, b, p, k, n, log2_base):
    half = 1 << (log2_base - 1)
    digits = rng.integers(-half, half, (b, p, n)).astype(np.int32)
    key = rng.integers(-(2**31), 2**31, (p, k, n), dtype=np.int64).astype(
        np.int32
    )
    return jnp.asarray(digits), jnp.asarray(key)


@pytest.mark.parametrize("depth", [0, 1, 2, 3])
@pytest.mark.parametrize("log2_base", [7, 10])
def test_karatsuba_matches_dense(depth, log2_base):
    rng = np.random.default_rng(42 + depth)
    t, n, p, k, b = 32, 256, 6, 2, 3
    digits, key = _random_case(rng, b, p, k, n, log2_base)
    want = _dense_reference(digits, key, log2_base - 1)

    plan = karatsuba_plan(n // t, depth, log2_base)
    limbs = conv.prepare_shared_torus(key)  # [4, P, K, 2N]
    e = bake_karatsuba(limbs[None], t, plan)[0]
    got = np.asarray(karatsuba_delta(digits, e, t, plan))
    np.testing.assert_array_equal(got, want)


def test_karatsuba_extremes():
    """Digits at the decomposition extremes, torus words at -2^31 (the limb
    edge the round-1 docs flag), T=128 production block size."""
    t, n, p, k = 128, 1024, 6, 2
    rng = np.random.default_rng(7)
    digits = rng.choice(
        np.asarray([-64, -64, 63, 63, 0, 1], np.int32), (2, p, n)
    ).astype(np.int32)
    key = np.full((p, k, n), -(2**31), np.int32)
    key[:, :, ::3] = 2**31 - 1
    key[:, :, ::5] = rng.integers(-(2**31), 2**31, key[:, :, ::5].shape)
    digits, key = jnp.asarray(digits), jnp.asarray(key)
    want = _dense_reference(digits, key, 6)
    for depth in (2, 3):
        plan = karatsuba_plan(n // t, depth, 7)
        e = bake_karatsuba(conv.prepare_shared_torus(key)[None], t, plan)[0]
        got = np.asarray(karatsuba_delta(digits, e, t, plan))
        np.testing.assert_array_equal(got, want)


def test_plan_mac_counts():
    """The whole point: super-block products drop 64 -> 48 -> 40 -> 34."""
    counts = {
        d: karatsuba_plan(8, d, 7).macs_superblocks for d in range(4)
    }
    assert counts == {0: 64, 1: 48, 2: 40, 3: 34}
    # storage rows: 8 -> 12 -> 18 -> 27
    rows = {d: karatsuba_plan(8, d, 7).total_rows for d in range(4)}
    assert rows == {0: 8, 1: 12, 2: 18, 3: 27}
    # base 2^10 digits always need two limbs: MACs exactly double
    assert karatsuba_plan(8, 3, 10).macs_superblocks == 2 * 27


@pytest.mark.parametrize("depth", [2, 3])
def test_blind_rotate_karatsuba_matches_dense(depth):
    """Full blind rotation: Karatsuba-baked key == dense-baked key, bitwise."""
    import tfhe_tpu.bootstrap as bs
    from tfhe_tpu.tlwe import TLweSample

    rng = np.random.default_rng(11 + depth)
    n, l, b, k1, n_lwe, batch = 256, 3, 7, 2, 5, 4
    gsw = rng.integers(
        -(2**31), 2**31, (n_lwe, l, k1, k1, n), dtype=np.int64
    ).astype(np.int32)
    acc0 = rng.integers(-(2**31), 2**31, (batch, k1, n), dtype=np.int64).astype(
        np.int32
    )
    bara = rng.integers(0, 2 * n, size=(batch, n_lwe)).astype(np.int32)
    bara[0, 0] = 0  # no-op lane
    acc = TLweSample(jnp.asarray(acc0), jnp.zeros(batch, jnp.float32))

    bk_dense = bs.bootstrap_key_from_raw(jnp.asarray(gsw), l, b, depth=0)
    bk_kara = bs.bootstrap_key_from_raw(jnp.asarray(gsw), l, b, depth=depth)
    want = np.asarray(bs.blind_rotate(acc, bk_dense, bara).a)
    got = np.asarray(bs.blind_rotate(acc, bk_kara, bara).a)
    np.testing.assert_array_equal(got, want)


def test_multistep_bake_chunking():
    """bake_karatsuba's lax.map chunking is exact across the chunk seam."""
    rng = np.random.default_rng(3)
    t, n, p, k, steps = 32, 128, 2, 2, 11
    key = jnp.asarray(
        rng.integers(-(2**31), 2**31, (steps, p, k, n), dtype=np.int64).astype(
            np.int32
        )
    )
    limbs = conv.prepare_shared_torus(key)
    plan = karatsuba_plan(n // t, 2, 7)
    whole = bake_karatsuba(limbs, t, plan, chunk=32)  # single shot
    chunked = bake_karatsuba(limbs, t, plan, chunk=4)  # 4+4+3
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))


@pytest.mark.parametrize("depth", [1, 2])
def test_expand_step_matches_bake(depth):
    """Gate-time expansion of one compact step (expand_karatsuba_step) is
    bit-identical to the bake-time rows (bake_karatsuba) — the identity the
    compact serving path's chunked rotation rides."""
    from tfhe_tpu.ops.karatsuba import expand_karatsuba_step

    rng = np.random.default_rng(91 + depth)
    t, n, p, k, steps = 32, 256, 6, 2, 3
    key = rng.integers(
        -(2**31), 2**31, (steps, p, k, n), dtype=np.int64
    ).astype(np.int32)
    plan = karatsuba_plan(n // t, depth, 7)
    limbs = conv.prepare_shared_torus(jnp.asarray(key))  # [S, 4, P, K, 2N]
    want = np.asarray(bake_karatsuba(limbs, t, plan))
    for s in range(steps):
        got = np.asarray(expand_karatsuba_step(limbs[s], t, plan))
        np.testing.assert_array_equal(got, want[s])
