"""Roofline counters and profiler hooks (utils/profiling.py).

The MAC counter is checked against the independently-derived dense and
Karatsuba counts from the round-1/2 performance audits (VERDICT round 1:
50.3M byte-MACs per dense CMUX step at 128-bit parameters).
"""

import pytest

import tfhe_tpu as tt
from tfhe_tpu.utils.profiling import Roofline, bootstrap_roofline, trace


def test_dense_mac_count_matches_audit():
    p = tt.tfhe_parameters_128()
    rl = bootstrap_roofline(p, batch=1, depth=0)
    # dense block-Toeplitz: M^2 = 64 superblocks x P*T x K*4*T per step
    per_step = rl.byte_macs / p.lwe_size
    assert per_step == 64 * 6 * 128 * 2 * 4 * 128  # = 50,331,648


def test_karatsuba_depth2_is_40_64_of_dense():
    p = tt.tfhe_parameters_128()
    dense = bootstrap_roofline(p, batch=1, depth=0).byte_macs
    d2 = bootstrap_roofline(p, batch=1, depth=2).byte_macs
    assert d2 * 64 == dense * 40


def test_roofline_scales_linearly_with_batch():
    p = tt.tfhe_parameters_128()
    a = bootstrap_roofline(p, batch=1, depth=2)
    b = bootstrap_roofline(p, batch=64, depth=2, cells=1)
    assert b.byte_macs == 64 * a.byte_macs
    assert b.vpu_elems == 64 * a.vpu_elems


def test_utilization_fractions():
    rl = Roofline(197e12, 819e9, 0, 1.0, 1.0)
    u = rl.utilization(2.0)
    assert u["mxu"] == pytest.approx(0.5)
    assert u["hbm"] == pytest.approx(0.5)
    assert u["floor_s"] == 1.0


def test_trace_context_manager_smoke(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path)) as d:
        (jnp.arange(8) * 2).block_until_ready()
    assert d == str(tmp_path)
