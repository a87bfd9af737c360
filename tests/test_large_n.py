"""Large-N geometries end-to-end (the SURVEY section-5 "scale the long
dimension" axis).

The reference fixes N=1024 (src/api.jl), so parity never exercises larger
rings — but the framework supports them, and round-2's review noted only
the oracle fuzz touched non-1024 N. This module runs (a) a full
keygen -> gate -> decrypt round-trip at N=2048 with a toy LWE dimension
(decrypt-level correctness through every layer: keygen bake, megadispatch,
extraction at k*N=2048, keyswitch back), and (b) the whole-rotation
megakernel at the PRODUCTION block size T=128 with M=16 blocks in
interpret mode, bit-exact vs the XLA scan.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tfhe_tpu as tt
import tfhe_tpu.bootstrap as bs
import tfhe_tpu.tlwe as tlwe_mod
from tfhe_tpu import gates
from tfhe_tpu.params import SchemeParameters
from tfhe_tpu.tgsw import decomp_offset


def rand_t32(rng, shape):
    return rng.integers(-(2**31), 2**31, size=shape, dtype=np.int64).astype(
        np.int32)


def test_gate_roundtrip_n2048():
    """NAND truth table at N=2048, k=1 (toy n: keygen cost, not security)."""
    params = SchemeParameters(
        lwe_size=16, lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=2048, tlwe_mask_size=1,
        bs_decomp_length=3, bs_log2_base=7, bs_noise_stddev=2.0**-25,
        ks_decomp_length=8, ks_log2_base=2, ks_noise_stddev=2.0**-15,
    )
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(2048), params)
    assert ck.bootstrap_key.polynomial_degree == 2048
    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
    ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, ys)
    out = tt.decrypt(sk, gates.gate_nand(ck, ct_x, ct_y))
    np.testing.assert_array_equal(np.asarray(out), [True, True, True, False])


def test_megakernel_interpret_t128_m16(rng):
    """Whole-rotation megakernel at N=2048, T=128 (M=16 super-blocks) —
    the production lane width at double the production ring degree —
    bitwise vs the XLA Karatsuba scan (interpret mode)."""
    from tfhe_tpu.ops.pallas_cmux import blind_rotate_pallas_karatsuba

    n, l, b, t, k1, n_lwe, batch = 2048, 2, 8, 128, 2, 2, 2
    gsw = rand_t32(rng, (n_lwe, l, k1, k1, n))
    bk = bs.bootstrap_key_from_raw(gsw, l, b, block=t, depth=2)
    assert bk.plan.m == 16
    acc0 = rand_t32(rng, (batch, k1, n))
    bara = rng.integers(0, 2 * n, size=(batch, n_lwe)).astype(np.int32)
    bara[0, 0] = 0

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
