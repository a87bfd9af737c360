"""Parameter-space fuzzing against the executable spec.

The fixed-shape oracle tests (test_oracle_equivalence.py) pin one toy
geometry; a shared misreading of the reference could in principle hide in
shape-dependent code (block size selection, Karatsuba plan depth, padding,
limb splits). This module draws random scheme geometries — polynomial
degree, mask size, decomposition length/base, Karatsuba depth — and
asserts the TPU kernels stay BIT-identical to the NumPy spec on random
inputs, covering the dense and Karatsuba bakes at shapes no preset uses.
"""

import numpy as np
import pytest

import spec.oracle as oracle
import tfhe_tpu.bootstrap as bs
import tfhe_tpu.keyswitch as ksw
import tfhe_tpu.tlwe as tlwe_mod


def rand_t32(rng, shape):
    return rng.integers(-(2**31), 2**31, size=shape, dtype=np.int64).astype(np.int32)


def _configs(seed, count):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(count):
        out.append(dict(
            n_poly=int(rng.choice([32, 64, 128, 256])),
            k=int(rng.choice([1, 2])),
            l=int(rng.choice([2, 3, 4])),
            b=int(rng.choice([4, 6, 7, 8, 10])),
            depth=int(rng.choice([0, 1, 2])),
            n_lwe=int(rng.choice([5, 8])),
            balanced=bool(rng.integers(0, 2)),
        ))
    return out


@pytest.mark.parametrize("cfg", _configs(2026, 6))
def test_blind_rotate_fuzz(cfg):
    """Full blind rotation, random geometry, bit-exact vs the spec."""
    rng = np.random.default_rng(hash(tuple(sorted(cfg.items()))) % 2**32)
    n_poly, k, l, b = cfg["n_poly"], cfg["k"], cfg["l"], cfg["b"]
    bk_raw = rand_t32(rng, (cfg["n_lwe"], l, k + 1, k + 1, n_poly))
    bara = rng.integers(0, 2 * n_poly, size=(2, cfg["n_lwe"])).astype(np.int32)
    bara[0, ::2] = 0  # branchless no-op path
    accum0 = rand_t32(rng, (2, k + 1, n_poly))
    bk = bs.bootstrap_key_from_raw(bk_raw, l, b, depth=cfg["depth"],
                                   balanced=cfg["balanced"])
    acc = tlwe_mod.TLweSample(accum0, np.zeros(2, np.float32))
    got = np.asarray(bs.blind_rotate(acc, bk, bara).a)
    for i in range(2):
        want = oracle.blind_rotate(accum0[i], bk_raw, bara[i], l, b,
                                   cfg["balanced"])
        np.testing.assert_array_equal(got[i], want, err_msg=str(cfg))


@pytest.mark.parametrize("ks_l,ks_b,n_in,n_out", [
    (8, 2, 48, 16), (4, 4, 64, 24), (2, 8, 32, 40), (6, 3, 96, 20),
])
def test_keyswitch_fuzz(ks_l, ks_b, n_in, n_out):
    """Keyswitch one-hot contraction, random table geometry, bit-exact."""
    rng = np.random.default_rng(ks_l * 1000 + ks_b * 100 + n_in)
    base = 1 << ks_b
    ks_a = rand_t32(rng, (base - 1, ks_l, n_in, n_out))
    ks_b_tbl = rand_t32(rng, (base - 1, ks_l, n_in))
    sample_a = rand_t32(rng, (3, n_in))
    sample_b = rand_t32(rng, (3,))
    key = ksw.KeyswitchKey(
        ksw.prepare_keyswitch_table(ks_a, ks_b_tbl, n_out),
        n_in, n_out, ks_l, ks_b)
    from tfhe_tpu.lwe import LweSample
    got = ksw.keyswitch(
        key, LweSample(sample_a, sample_b, np.zeros(3, np.float32)))
    for i in range(3):
        wa, wb = oracle.keyswitch(ks_a, ks_b_tbl, sample_a[i], sample_b[i],
                                  ks_l, ks_b)
        np.testing.assert_array_equal(np.asarray(got.a)[i], wa)
        assert int(np.asarray(got.b)[i]) == int(wb)


@pytest.mark.parametrize("l,b", [(2, 8), (3, 7), (2, 10), (4, 8)])
def test_balanced_decompose_invariants(l, b):
    """The balanced gadget rounds to NEAREST with zero-mean error and
    preserves decompose(0) == 0 (the branchless blind-rotate identity)."""
    from tfhe_tpu.tgsw import decompose, gadget_values

    rng = np.random.default_rng(l * 100 + b)
    x = rng.integers(-2**31, 2**31, 8192, dtype=np.int64).astype(np.int32)
    d = np.asarray(decompose(x[:, None], l, b, balanced=True))[:, :, 0]
    g = np.asarray(gadget_values(l, b)).astype(np.int64)
    rec = (d.astype(np.int64) * g).sum(axis=1)
    err = ((x.astype(np.int64) - rec + 2**31) % 2**32) - 2**31
    ulp = 1 << (32 - l * b)
    assert np.abs(err).max() <= ulp // 2, (l, b, np.abs(err).max())
    assert abs(err.mean()) < ulp / 16, (l, b, err.mean())  # zero-mean
    assert np.abs(d).max() <= (1 << (b - 1)), (l, b)  # digit range
    # the no-op identity: zero decomposes to all-zero digits
    d0 = np.asarray(decompose(np.zeros(4, np.int32), l, b, balanced=True))
    assert (d0 == 0).all()
