"""TuningConfig: env parsing, overrides, and sentinel semantics.

The tuning module is the package's single environment boundary; a silent
mis-parse changes kernel dispatch without failing any bit-exactness test
(every path is exact — only speed and, for result-affecting knobs,
semantics differ). These tests pin the parsing rules, the override stack,
and the sentinels that earlier refactors broke (mk_bake_budget = 0 must
mean "force the prepared path", not "use the default").
"""

import dataclasses

from tfhe_tpu import tuning


def test_env_parsing_types(monkeypatch):
    monkeypatch.setenv("TFHE_TPU_BTK", "512")
    monkeypatch.setenv("TFHE_TPU_CMUX", "xla")
    monkeypatch.setenv("TFHE_TPU_DEBUG", "1")
    monkeypatch.setenv("TFHE_TPU_RADIX_MANYLUT", "0")
    monkeypatch.setenv("TFHE_TPU_MK_MEGA", "0")
    cfg = tuning.get_tuning()
    assert cfg.btk == 512
    assert cfg.cmux == "xla"
    assert cfg.debug is True
    assert cfg.radix_manylut is False
    assert cfg.mk_mega == "0"  # tri-state string, not bool


def test_env_bool_falsy_spellings(monkeypatch):
    """TFHE_TPU_DEBUG=False/no/off must disable, not silently enable
    (round-3 advisor finding: anything outside ('0','false','') parsed as
    True, including for result-affecting knobs)."""
    import pytest

    for raw in ("False", "no", "NO", "off", "Off", "0", ""):
        monkeypatch.setenv("TFHE_TPU_DEBUG", raw)
        assert tuning.get_tuning().debug is False, raw
    for raw in ("True", "YES", "on", "1"):
        monkeypatch.setenv("TFHE_TPU_DEBUG", raw)
        assert tuning.get_tuning().debug is True, raw
    monkeypatch.setenv("TFHE_TPU_DEBUG", "maybe")
    with pytest.raises(ValueError, match="TFHE_TPU_DEBUG"):
        tuning.get_tuning()


def test_defaults_without_env(monkeypatch):
    for var in tuning._ENV.values():
        monkeypatch.delenv(var, raising=False)
    cfg = tuning.get_tuning()
    assert cfg == tuning.TuningConfig()
    # sentinel: -1 = caller default; 0 = force the MK prepared path
    assert cfg.mk_bake_budget == -1


def test_bake_budget_zero_forces_prepared(monkeypatch):
    """Regression: TFHE_TPU_MK_BAKE_BUDGET=0 must reach the consumer as 0
    (mk/internals._mk_bake_block returns block 0 = prepared path), NOT be
    swallowed by an `or`-style default."""
    monkeypatch.setenv("TFHE_TPU_MK_BAKE_BUDGET", "0")
    from tfhe_tpu.mk.internals import _mk_bake_block

    assert tuning.get_tuning().mk_bake_budget == 0
    assert _mk_bake_block(4, 8, 2, 256, budget_bytes=1 << 40) == 0


def test_override_stack_and_precedence(monkeypatch):
    monkeypatch.setenv("TFHE_TPU_BTK", "512")
    with tuning.override(btk=64) as cfg:
        assert cfg.btk == 64
        assert tuning.get_tuning().btk == 64
        with tuning.override(eslots=9):
            inner = tuning.get_tuning()
            assert inner.btk == 64 and inner.eslots == 9
        assert tuning.get_tuning().eslots == tuning.TuningConfig().eslots
    assert tuning.get_tuning().btk == 512  # env visible again


def test_result_fingerprint_covers_semantic_knobs():
    base = tuning.TuningConfig()
    for field in tuning.TuningConfig.RESULT_AFFECTING:
        cur = getattr(base, field)
        new = (not cur) if isinstance(cur, bool) else str(cur) + "x"
        changed = dataclasses.replace(base, **{field: new})
        assert changed.result_fingerprint() != base.result_fingerprint(), field
    # schedule knobs must NOT invalidate checkpoints
    assert dataclasses.replace(
        base, btk=999).result_fingerprint() == base.result_fingerprint()
