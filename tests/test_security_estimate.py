"""Core-SVP security estimates: anchor validation + preset pins.

The round-3 verdict required the `128_fast` security claim to be a
number-vs-number comparison with the reference preset under a named cost
model. These tests (a) validate the estimator against the published
ADPS16 NewHope-1024 figures, (b) assert the TPU retunes rate IDENTICAL to
the reference 128-bit preset, and (c) regression-pin the committed table
in docs/security.md.
"""

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import security_estimate as se  # noqa: E402


def test_adps16_newhope_anchor(monkeypatch):
    """Reproduce the published ADPS16 Table 4 NewHope-1024 costs
    (n=1024, q=12289, sigma=sqrt(8), secret distributed like the noise):
    primal classical 282, primal quantum 256."""
    monkeypatch.setattr(se, "LOG2_Q", math.log2(12289))
    monkeypatch.setattr(se, "SECRET_STDDEV", math.sqrt(8))  # xi = 1
    inst = se.Instance("newhope1024", 1024, math.sqrt(8))
    assert se.primal_bits(inst) == pytest.approx(282, abs=2)
    assert se.primal_bits(inst, quantum=True) == pytest.approx(256, abs=2)
    # dual lands within a few bits of primal (ADPS16 reports 285; the
    # sieve-amortization refinement accounts for the small difference)
    assert se.dual_bits(inst) == pytest.approx(282, abs=5)


def test_retuned_presets_match_reference():
    """128_fast (k=4 N=256) and 128_pbs (k=2 N=512) present the SAME
    attacker-visible instances as the reference 128-bit preset, so their
    core-SVP estimates are equal — the headline throughput claims exactly
    the reference's security level."""
    import tfhe_tpu as tt

    ref = se.estimate_preset(tt.tfhe_parameters_128())
    fast = se.estimate_preset(tt.tfhe_parameters_128_fast())
    fast8 = se.estimate_preset(tt.tfhe_parameters_128_fast8())
    pbs = se.estimate_preset(tt.tfhe_parameters_128_pbs())
    radix = se.estimate_preset(tt.tfhe_parameters_128_radix())
    radix_rel = se.estimate_preset(tt.tfhe_parameters_128_radix_reliable())
    for est in (fast, fast8, pbs, radix, radix_rel):
        assert est["bits"] == ref["bits"]
        for inst in ("lwe", "ring"):
            assert est[inst]["n"] == ref[inst]["n"]
            assert est[inst]["primal"] == ref[inst]["primal"]
            assert est[inst]["dual"] == ref[inst]["dual"]


def test_preset_pins():
    """Regression-pin the docs/security.md table (classical core-SVP)."""
    import tfhe_tpu as tt
    from tfhe_tpu.mk import api as mk_api

    assert se.estimate_preset(
        tt.tfhe_parameters_128())["bits"] == pytest.approx(97, abs=1.5)
    assert se.estimate_preset(
        tt.tfhe_parameters_80())["bits"] == pytest.approx(70, abs=1.5)
    # every MK preset is bounded by the same (n=500, sigma_ks=2.44e-5)
    # keyswitch instance inherited from src/mk_api.jl:4-34
    for p in (mk_api.mktfhe_parameters_2party(),
              mk_api.mktfhe_parameters_2party_lownoise(),
              mk_api.mktfhe_parameters_4party(),
              mk_api.mktfhe_parameters_8party()):
        est = se.estimate_preset(p)
        assert est["bits"] == pytest.approx(70, abs=1.5)
        assert est["bits"] == est["lwe"]["bits"]  # LWE/ks instance binds


def test_smaller_noise_weaker():
    """Sanity: decreasing sigma at fixed dimension lowers the estimate."""
    hi = se.instance_bits(se.Instance("x", 630, 2.0**-15 * 2.0**32))
    lo = se.instance_bits(se.Instance("x", 630, 2.0**-20 * 2.0**32))
    assert lo < hi


def test_keyswitch_noise_binds():
    """The LWE instance must be rated at min(sigma_lwe, sigma_ks): the
    keyswitch key exposes the same key at sigma_ks."""
    import dataclasses

    import tfhe_tpu as tt

    p = tt.tfhe_parameters_128()
    weaker_ks = dataclasses.replace(p, ks_noise_stddev=2.0**-22)
    insts = {i.name: i for i in se.preset_instances(weaker_ks)}
    assert insts["lwe"].sigma == pytest.approx(2.0**-22 * 2.0**32)
