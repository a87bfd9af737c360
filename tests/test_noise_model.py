"""Honest `cv` propagation: predicted variance vs measured phase error.

The reference's `current_variance` is advisory and unmaintained (issue #7);
this framework propagates it through bootstrap/keyswitch/MK via the
analytic model in tfhe_tpu/noise.py. These tests assert the prediction is
(a) nonzero and additive where it must be, and (b) within a factor of the
empirically measured phase-error variance at toy parameters over a large
batch — catching both "decorative zero" and grossly wrong formulas. (The
model uses nominal sigmas and uniform-digit bounds, so a modest systematic
gap is expected; the trunc discretization only shrinks real noise.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import gates
from tfhe_tpu.lwe import lwe_phase
from tfhe_tpu.numeric import encode_message

BATCH = 512
TWO32 = float(2**32)


@pytest.fixture(scope="module")
def toy():
    params = tt.tfhe_parameters_toy()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(9), params)
    return params, sk, ck


def _phase_err_var(sk, sample, want_bits):
    mu = np.int64(encode_message(1, 8))
    expected = np.where(np.asarray(want_bits, bool), mu, -mu)
    phase = np.asarray(lwe_phase(sample, sk.key)).astype(np.int64)
    err = ((phase - expected + 2**31) & 0xFFFFFFFF) - 2**31
    return float((err / TWO32).var())


def test_bootstrap_cv_matches_measurement(toy):
    params, sk, ck = toy
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 2, BATCH).astype(bool))
    ys = jnp.asarray(rng.integers(0, 2, BATCH).astype(bool))
    ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
    ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, ys)
    out = gates.gate_nand(ck, ct_x, ct_y)

    predicted = float(np.asarray(out.cv)[0])
    assert predicted > 0, "cv must be maintained through bootstrap+keyswitch"
    measured = _phase_err_var(sk, out, ~(np.asarray(xs) & np.asarray(ys)))
    ratio = predicted / measured
    assert 1 / 3 < ratio < 3, (predicted, measured, ratio)


def test_cv_additivity_and_scaling(toy):
    params, sk, ck = toy
    bits = jnp.asarray([True, False] * 4, bool)
    ct = tt.encrypt(jax.random.PRNGKey(3), sk, bits)
    two = ct + ct
    np.testing.assert_allclose(np.asarray(two.cv), 2 * np.asarray(ct.cv))
    scaled = ct * 3
    np.testing.assert_allclose(np.asarray(scaled.cv), 9 * np.asarray(ct.cv))


def test_mux_cv_accumulates(toy):
    """MUX = 2 rotations + 1 keyswitch: cv must exceed a single gate's."""
    params, sk, ck = toy
    bits = jnp.asarray([True, False, True, False], bool)
    a = tt.encrypt(jax.random.PRNGKey(4), sk, bits)
    b = tt.encrypt(jax.random.PRNGKey(5), sk, bits)
    c = tt.encrypt(jax.random.PRNGKey(6), sk, bits)
    mux = gates.gate_mux(ck, a, b, c)
    nand = gates.gate_nand(ck, a, b)
    assert float(np.asarray(mux.cv)[0]) > float(np.asarray(nand.cv)[0])


def test_mk_cv_predicts_measurement():
    import tfhe_tpu.mk as mk
    from tfhe_tpu.mk.internals import mk_lwe_phase

    params = mk.mktfhe_parameters_toy(2)
    shared = mk.make_shared_key(jax.random.PRNGKey(100), params)
    sks, parts = [], []
    for p in range(2):
        sk = tt.make_secret_key(jax.random.PRNGKey(200 + p), params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(
            jax.random.PRNGKey(300 + p), sk, shared))
    mck = mk.make_mk_cloud_key(parts)

    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.integers(0, 2, 128).astype(bool))
    ys = jnp.asarray(rng.integers(0, 2, 128).astype(bool))
    e1 = mk.mk_encrypt(jax.random.PRNGKey(7), sks, xs)
    e2 = mk.mk_encrypt(jax.random.PRNGKey(8), sks, ys)
    out = mk.mk_gate_nand(mck, e1, e2)

    predicted = float(np.asarray(out.cv)[0])
    assert predicted > 0
    mu = np.int64(encode_message(1, 8))
    want = ~(np.asarray(xs) & np.asarray(ys))
    expected = np.where(want, mu, -mu)
    keys = jnp.stack([sk.key for sk in sks])
    phase = np.asarray(mk_lwe_phase(out, keys)).astype(np.int64)
    err = (((phase - expected + 2**31) & 0xFFFFFFFF) - 2**31) / TWO32
    measured = float(err.var())
    ratio = predicted / measured
    assert 1 / 4 < ratio < 4, (predicted, measured, ratio)


def test_fast_preset_margins():
    """`tfhe_parameters_128_fast` keeps >= 9 sigma on every boolean gate.

    Pure-model regression guard for the TPU-retuned preset (derivation:
    tools/derive_fast_params.py): a future parameter change that silently
    erodes the decision margin fails here, not in a 1-in-1e38 decrypt flake.
    """
    import math

    from tfhe_tpu.noise import blind_rotate_var, keyswitch_var

    for params, floor in [
        (tt.tfhe_parameters_128_fast(), 9.0),
        (tt.tfhe_parameters_128(), 15.0),
    ]:
        v_out = blind_rotate_var(
            params.lwe_size, params.tlwe_mask_size, params.bs_decomp_length,
            params.bs_log2_base, params.tlwe_polynomial_degree,
            params.bs_noise_stddev, params.gadget_balanced,
        ) + keyswitch_var(
            params.extracted_size, params.ks_decomp_length,
            params.ks_log2_base, params.ks_noise_stddev,
        )
        two_n = 2 * params.tlwe_polynomial_degree
        v_ms = (params.lwe_size * 0.5 + 1) * (1.0 / two_n) ** 2 / 12.0
        # (margin, input amplitude): +-1/8-phase gates and XOR/XNOR (+-1/4, 2x)
        for margin, amp in [(0.125, 1), (0.25, 2)]:
            sigma = math.sqrt(2 * amp * amp * v_out + v_ms)
            assert margin / sigma >= floor, (params, margin, margin / sigma)


def test_fast8_preset_margin_tier():
    """`tfhe_parameters_128_fast8` (k=8, N=128, M=1) is the documented
    ~1e-8/gate reliability TIER: its boolean margin sits in [5.5, 7] sigma
    (model ~5.8 — tools/derive_fast_params.py), clearly below the
    cryptographic-grade 128_fast and clearly above coin-flip territory.
    Pins both sides so a parameter change can't silently move the tier.
    """
    import math

    from tfhe_tpu.noise import blind_rotate_var, keyswitch_var

    params = tt.tfhe_parameters_128_fast8()
    v_out = blind_rotate_var(
        params.lwe_size, params.tlwe_mask_size, params.bs_decomp_length,
        params.bs_log2_base, params.tlwe_polynomial_degree,
        params.bs_noise_stddev, params.gadget_balanced,
    ) + keyswitch_var(
        params.extracted_size, params.ks_decomp_length,
        params.ks_log2_base, params.ks_noise_stddev,
    )
    two_n = 2 * params.tlwe_polynomial_degree
    v_ms = (params.lwe_size * 0.5 + 1) * (1.0 / two_n) ** 2 / 12.0
    sigma1 = math.sqrt(2 * v_out + v_ms)
    assert 5.5 <= 0.125 / sigma1 <= 7.0, 0.125 / sigma1
    sigma2 = math.sqrt(8 * v_out + v_ms)
    assert 0.25 / sigma2 >= 9.0, 0.25 / sigma2  # XOR/XNOR stay strong


def test_mk_lownoise_preset_margin():
    """`mktfhe_parameters_2party_lownoise` pushes the 2-party gate failure
    from the reference preset's ~1.5%/gate to < 1e-12/gate (model;
    docs/mk_noise_budget.md derives ~1e-18 with the measured effective
    discretized sigma)."""
    import math

    import tfhe_tpu.mk as mk
    from tfhe_tpu.noise import mk_blind_rotate_var

    def gate_failure(params, parties):
        v_rot = mk_blind_rotate_var(
            parties, params.lwe_size, params.bs_decomp_length,
            params.bs_log2_base, params.tlwe_polynomial_degree,
            params.bs_noise_stddev)
        sigma = math.sqrt(v_rot)
        return math.erfc(0.125 / (sigma * math.sqrt(2.0)))

    loose = gate_failure(mk.mktfhe_parameters_2party(), 2)
    strict = gate_failure(mk.mktfhe_parameters_2party_lownoise(), 2)
    assert loose > 1e-3, loose      # the reference preset really is lossy
    # model uses the NOMINAL sigma; with the measured discretized
    # sigma_eff ~ 0.76x the bound is ~1e-18 (docs/mk_noise_budget.md)
    assert strict < 1e-10, strict   # the named stricter preset is not


def test_pbs_preset_margins():
    """`tfhe_parameters_128_pbs` keeps >= 8 sigma for 4-entry LUT buckets
    (margin 1/16) on chained PBS inputs; the boolean-tuned fast preset
    does NOT (which is why the PBS preset exists)."""
    import math

    from tfhe_tpu.noise import blind_rotate_var, keyswitch_var

    def lut4_margin_sigmas(params):
        v_out = blind_rotate_var(
            params.lwe_size, params.tlwe_mask_size, params.bs_decomp_length,
            params.bs_log2_base, params.tlwe_polynomial_degree,
            params.bs_noise_stddev, params.gadget_balanced,
        ) + keyswitch_var(
            params.extracted_size, params.ks_decomp_length,
            params.ks_log2_base, params.ks_noise_stddev,
        )
        two_n = 2 * params.tlwe_polynomial_degree
        v_ms = (params.lwe_size * 0.5 + 1) * (1.0 / two_n) ** 2 / 12.0
        return (1.0 / 16) / math.sqrt(v_out + v_ms)

    assert lut4_margin_sigmas(tt.tfhe_parameters_128_pbs()) >= 8.0
    assert lut4_margin_sigmas(tt.tfhe_parameters_128_fast()) < 8.0


def test_radix_preset_margins():
    """`tfhe_parameters_128_radix{,_reliable}` hold their documented S=8
    digit margins (model: docs/leveled_mode.md section 2b,
    tools/derive_fast_params.py radix section), and the manylut
    modulus-switch floor that makes 1e-9/word infeasible at full
    throughput is pinned."""
    import math

    from tfhe_tpu.noise import blind_rotate_var, keyswitch_var

    def digit_margin_sigmas(params, manylut):
        v_out = blind_rotate_var(
            params.lwe_size, params.tlwe_mask_size, params.bs_decomp_length,
            params.bs_log2_base, params.tlwe_polynomial_degree,
            params.bs_noise_stddev, params.gadget_balanced,
        ) + keyswitch_var(
            params.extracted_size, params.ks_decomp_length,
            params.ks_log2_base, params.ks_noise_stddev,
        )
        q = 2 if manylut else 1
        two_n = 2 * params.tlwe_polynomial_degree
        v_ms = (params.lwe_size * 0.5 + 1) * (q / two_n) ** 2 / 12.0
        # PBS input = digit + digit + carry: three bootstrap-fresh samples
        return (1.0 / 32) / math.sqrt(3 * v_out + v_ms)

    # throughput-preserving preset: >= 4.4 sigma (48x the r3 failure rate)
    assert digit_margin_sigmas(tt.tfhe_parameters_128_radix(), True) >= 4.4
    # the r3 config (truncating gadget, ks l8b2) sits below 3.6 sigma
    assert digit_margin_sigmas(tt.tfhe_parameters_128(), True) < 3.6
    # reliable preset without manylut: >= 6.42 sigma = <= 1e-9/word class
    rel = tt.tfhe_parameters_128_radix_reliable()
    assert digit_margin_sigmas(rel, False) >= 6.42
    # ... and the manylut ms floor alone rules 1e-9 out at N=1024: even a
    # zero-noise bootstrap stays under 6.42 sigma with manylut on
    n, two_n = 630, 2048
    ms_only = math.sqrt((n * 0.5 + 1) * (2.0 / two_n) ** 2 / 12.0)
    assert (1.0 / 32) / ms_only < 6.42
