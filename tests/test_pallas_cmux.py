"""Differential tests: fused Pallas CMUX kernels vs the XLA path, bit-exact.

Runs the kernels in interpret mode on CPU; bit-exactness vs the NumPy oracle
follows by composition with tests/test_oracle_equivalence.py (the XLA path is
oracle-exact).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import tfhe_tpu.bootstrap as bs
import tfhe_tpu.tlwe as tlwe_mod
from tfhe_tpu.ops.conv import split_small_limbs
from tfhe_tpu.ops.pallas_cmux import cmux_step_pallas
from tfhe_tpu.tgsw import decomp_offset


def rand_t32(rng, shape):
    return rng.integers(-(2**31), 2**31, size=shape, dtype=np.int64).astype(np.int32)


@pytest.mark.parametrize(
    "n,l,b,t,batch",
    [
        (64, 3, 7, 32, 8),     # 128-bit-style decomposition, single digit limb
        (64, 2, 10, 32, 8),    # 80-bit-style: two digit limbs
        (256, 3, 7, 64, 4),    # toy production shape
    ],
)
def test_cmux_step_pallas_matches_xla(rng, n, l, b, t, batch):
    k1 = 2
    gsw = rand_t32(rng, (1, l, k1, k1, n))
    bk = bs.bootstrap_key_from_raw(gsw, l, b, block=t, depth=0)
    acc = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=batch).astype(np.int32)
    bara[0] = 0  # no-op lane

    want = bs.mux_rotate_baked(acc, bk.baked[0], bara, l, b, t)

    _, d_shifts = split_small_limbs(np.zeros((1,), np.int32), b - 1)
    got = cmux_step_pallas(
        acc, bk.baked[0], bara,
        n=n, k1=k1, l=l, b=b, t=t,
        s_limbs=len(d_shifts), d_shifts=tuple(d_shifts),
        offset=decomp_offset(l, b), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "n,l,b,t,batch,depth",
    [
        (64, 3, 7, 32, 8, 1),   # shallow plan, single digit limb
        (128, 3, 7, 32, 8, 2),  # M=4, depth 2
        (256, 3, 7, 32, 8, 3),  # M=8 full depth, 128-bit-style decomposition
        (256, 2, 10, 32, 8, 3),  # 80-bit-style: two digit limbs everywhere
        (256, 3, 7, 64, 4, 2),  # toy production block
    ],
)
def test_cmux_step_pallas_karatsuba_matches_xla(rng, n, l, b, t, batch, depth):
    from tfhe_tpu.ops.pallas_cmux import cmux_step_pallas_karatsuba

    k1 = 2
    gsw = rand_t32(rng, (1, l, k1, k1, n))
    bk = bs.bootstrap_key_from_raw(gsw, l, b, block=t, depth=depth)
    acc = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=batch).astype(np.int32)
    bara[0] = 0  # no-op lane

    want = bs.mux_rotate_karatsuba(acc, bk.baked[0], bara, l, b, t, bk.plan)
    got = cmux_step_pallas_karatsuba(
        acc, bk.baked[0], bara,
        n=n, k1=k1, l=l, b=b, t=t, plan=bk.plan,
        offset=decomp_offset(l, b), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "n,l,b,t,depth,k1",
    [
        (256, 3, 7, 32, 2, 2),   # M=8, depth 2
        (256, 3, 7, 32, 3, 2),   # M=8, full depth
        (256, 2, 10, 32, 2, 2),  # 80-bit-style two-limb digits
        (128, 2, 8, 32, 2, 3),   # k=2, M=4, b=8 family
        (64, 2, 8, 32, 1, 5),    # 128_fast shape family: k=4, M=2, b=8
    ],
)
def test_blind_rotate_megakernel_matches_xla(rng, n, l, b, t, depth, k1):
    """Whole-rotation megakernel (interpret) == XLA Karatsuba scan, bitwise."""
    from tfhe_tpu.ops.pallas_cmux import blind_rotate_pallas_karatsuba

    n_lwe, batch = 5, 4
    gsw = rand_t32(rng, (n_lwe, l, k1, k1, n))
    bk = bs.bootstrap_key_from_raw(gsw, l, b, block=t, depth=depth)
    acc0 = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=(batch, n_lwe)).astype(np.int32)
    bara[0, 0] = 0  # no-op lane

    want = acc0
    for s in range(n_lwe):
        want = bs.mux_rotate_karatsuba(
            want, bk.baked[s], bara[:, s], l, b, t, bk.plan)

    got = blind_rotate_pallas_karatsuba(
        acc0, bk.baked, jnp.asarray(bara).T,
        n=n, k1=k1, l=l, b=b, t=t, plan=bk.plan,
        offset=decomp_offset(l, b), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "n,l,b,t,depth,k1",
    [
        (256, 3, 7, 32, 2, 2),   # M=8, depth 2 (production shape)
        (256, 2, 10, 32, 2, 2),  # 80-bit-style two-limb digits
        (256, 3, 7, 32, 3, 2),   # full depth: 27 leaves, 3-slot ring
        (128, 2, 8, 32, 2, 3),   # k=2, M=4, b=8 family
        (64, 2, 8, 32, 1, 5),    # 128_fast shape family: k=4, M=2, b=8
    ],
)
def test_blind_rotate_pipelined_matches_xla(rng, n, l, b, t, depth, k1):
    """Two-subtile pipelined megakernel (interpret) == XLA scan, bitwise."""
    from tfhe_tpu.ops.pallas_cmux import blind_rotate_pallas_pipelined

    n_lwe, batch = 5, 8
    gsw = rand_t32(rng, (n_lwe, l, k1, k1, n))
    bk = bs.bootstrap_key_from_raw(gsw, l, b, block=t, depth=depth)
    acc0 = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=(batch, n_lwe)).astype(np.int32)
    bara[0, 0] = 0  # no-op lane

    want = acc0
    for s in range(n_lwe):
        want = bs.mux_rotate_karatsuba(
            want, bk.baked[s], bara[:, s], l, b, t, bk.plan)

    got = blind_rotate_pallas_pipelined(
        acc0, bk.baked, jnp.asarray(bara).T,
        n=n, k1=k1, l=l, b=b, t=t, plan=bk.plan,
        offset=decomp_offset(l, b), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_blind_rotate_pallas_dispatch(rng, monkeypatch):
    """Full blind rotate through the Pallas path (interpret) == XLA path."""
    n, l, b, k1, n_lwe, batch = 64, 3, 7, 2, 6, 4
    gsw = rand_t32(rng, (n_lwe, l, k1, k1, n))
    bk = bs.bootstrap_key_from_raw(gsw, l, b, depth=0)
    acc0 = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=(batch, n_lwe)).astype(np.int32)
    acc = tlwe_mod.TLweSample(acc0, np.zeros(batch, np.float32))

    monkeypatch.setenv("TFHE_TPU_CMUX", "xla")
    want = bs.blind_rotate(acc, bk, bara).a
    monkeypatch.setenv("TFHE_TPU_CMUX", "pallas")
    got = bs.blind_rotate(acc, bk, bara).a
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_debug_mode_crosschecks(rng, monkeypatch):
    """TFHE_TPU_DEBUG=1: blind_rotate crosschecks engine vs XLA and raises
    FHEDebugError on injected corruption; clean runs return the XLA bits."""
    from tfhe_tpu import tuning
    from tfhe_tpu.debug import FHEDebugError
    import tfhe_tpu.ops.pallas_cmux as pc

    n, l, b, k1, n_lwe, batch = 64, 3, 7, 2, 4, 4
    gsw = rand_t32(rng, (n_lwe, l, k1, k1, n))
    bk = bs.bootstrap_key_from_raw(gsw, l, b, depth=2)
    acc0 = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=(batch, n_lwe)).astype(np.int32)
    acc = tlwe_mod.TLweSample(acc0, np.zeros(batch, np.float32))

    monkeypatch.setenv("TFHE_TPU_CMUX", "pallas")  # force the engine on CPU
    with tuning.override(cmux="pallas", debug=True):
        got = bs.blind_rotate(acc, bk, bara).a
    with tuning.override(cmux="xla"):
        want = bs.blind_rotate(acc, bk, bara).a
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # fault injection: corrupt the engine output; debug mode must raise
    real = pc.blind_rotate_pallas_karatsuba

    def corrupted(*args, **kw):
        out = real(*args, **kw)
        return out.at[0, 0, 0].add(1)

    monkeypatch.setattr(pc, "blind_rotate_pallas_karatsuba", corrupted)
    monkeypatch.setattr(
        pc, "blind_rotate_pallas_pipelined", corrupted)
    with tuning.override(cmux="pallas", debug=True):
        with pytest.raises(FHEDebugError, match="crosscheck failed"):
            np.asarray(bs.blind_rotate(acc, bk, bara).a)
