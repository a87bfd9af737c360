"""The M = 1 degenerate block geometry (N == T): the 128_fast8 class.

At N = T = 128 the block-Toeplitz structure collapses to ONE full
negacyclic Toeplitz product per CMUX step (depth-0 single-leaf plan).
These tests pin every dispatch path at a tiny M=1 instance: the compact
megakernel (interpret) and the depth-0 baked two-kernel path must match
the XLA reference bitwise, and the gate round-trip must decrypt the truth
table. Reference CMUX being specialized: src/bootstrap.jl:19-23.
"""

import jax
import jax.numpy as jnp
import numpy as np

import tfhe_tpu as tt
from tfhe_tpu import gates, tuning
from tfhe_tpu.params import SchemeParameters


def _m1_params() -> SchemeParameters:
    return SchemeParameters(
        lwe_size=16, lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=128, tlwe_mask_size=2,
        bs_decomp_length=2, bs_log2_base=8, bs_noise_stddev=2.0**-25,
        ks_decomp_length=8, ks_log2_base=2, ks_noise_stddev=2.0**-15,
        max_parties=1, gadget_balanced=True)


def test_m1_compact_kernel_matches_xla_and_decrypts():
    p = _m1_params()
    xs = jnp.asarray([False, False, True, True])
    ys = jnp.asarray([False, True, False, True])
    want = ~(np.asarray(xs) & np.asarray(ys))

    with tuning.override(bs_bake_budget=0):
        sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), p)
    assert ck.bootstrap_key.compact and ck.bootstrap_key.block == 128
    assert ck.bootstrap_key.depth == 0  # M = 1 forces the depth-0 plan
    cx = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
    cy = tt.encrypt(jax.random.PRNGKey(2), sk, ys)
    with tuning.override(bs_bake_budget=0, cmux="pallas"):
        out_k = gates.gate_nand(ck, cx, cy)
    with tuning.override(bs_bake_budget=0, cmux="xla"):
        out_x = gates.gate_nand(ck, cx, cy)
    np.testing.assert_array_equal(np.asarray(out_k.a), np.asarray(out_x.a))
    np.testing.assert_array_equal(np.asarray(out_k.b), np.asarray(out_x.b))
    got = np.asarray(tt.decrypt(sk, out_k))
    np.testing.assert_array_equal(got, want)


def test_m1_baked_two_kernel_path_matches_xla():
    p = _m1_params()
    xs = jnp.asarray([True, False])
    ys = jnp.asarray([True, True])
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), p)
    assert not ck.bootstrap_key.compact and ck.bootstrap_key.depth == 0
    cx = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
    cy = tt.encrypt(jax.random.PRNGKey(2), sk, ys)
    with tuning.override(cmux="pallas"):
        out_b = gates.gate_nand(ck, cx, cy)
    with tuning.override(cmux="xla"):
        out_x = gates.gate_nand(ck, cx, cy)
    np.testing.assert_array_equal(np.asarray(out_b.a), np.asarray(out_x.a))
    np.testing.assert_array_equal(np.asarray(out_b.b), np.asarray(out_x.b))
    got = np.asarray(tt.decrypt(sk, out_b))
    np.testing.assert_array_equal(got, ~(np.asarray(xs) & np.asarray(ys)))
