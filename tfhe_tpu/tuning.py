"""Tuning knobs: ONE frozen config, read at ONE boundary.

Every performance/dispatch knob in the framework lives in `TuningConfig`.
The environment (`TFHE_TPU_*`) is parsed ONLY here; hot modules call
`get_tuning()` and read fields. An explicit config can be installed with
`set_tuning` / the `override(...)` context manager (tests, benchmarks),
which takes precedence over the environment.

Two kinds of knobs, kept honest separately:

* schedule-only knobs (batch tiles, DMA slot counts, kernel/dispatch
  selection): every value is BIT-EXACT by construction — the differential
  tests assert kernel == XLA == oracle for each path — so they are *not*
  part of checkpoint fingerprints (a resumed job may legally run a
  different schedule).
* result-affecting knobs (`radix_manylut` changes the radix PBS wire
  bits via its coarser modulus switch; `pipe_ablate` produces WRONG results
  by design — timing ablations only; `debug` adds assertions): included in
  `result_fingerprint()`, which `utils/jobs.py` folds into the job
  fingerprint so a checkpoint cannot silently resume under different
  semantics.

The reference has no tuning surface at all (a single immutable parameter
struct, src/api.jl:4-21); this module is the TPU build's equivalent of that
discipline for the knobs the reference never needed.

CAVEAT — jit caching: knobs are read at Python trace time, and jax's jit
cache is keyed by function identity + avals, NOT by the active config. A
jitted function whose INPUTS don't change under a knob flip (e.g. keygen
under `bs_bake_budget`) will silently replay the previously traced form;
wrap such calls in a fresh closure per override (see tools/serving_bench.py).
Gate-time knobs are safe in practice because the key pytree's metadata
differs between forms, forcing a retrace.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os


@dataclasses.dataclass(frozen=True)
class TuningConfig:
    # --- key baking / kernel dispatch ---
    karatsuba_depth: int = 2    # block-Karatsuba depth for new bootstrap keys
    cmux: str = "auto"          # auto|pallas|xla: single-key CMUX engine
    pipe: str = "auto"          # auto|0|1: two-subtile pipelined megakernel
    bs_bake_budget: int = -1    # resident-key budget (bytes) for single-key
                                # bootstrap keys: -1 = always bake (fastest,
                                # T x the key bytes), 0 = force the COMPACT
                                # prepared form (~100x smaller; per-step
                                # on-the-fly expansion), >0 = bake only if
                                # the baked key fits the budget — the
                                # multi-tenant serving knob (docs/serving.md)
    # --- single-key batch tiles / DMA ring sizes ---
    btk: int = 128              # serial megakernel batch tile (rows)
    bt_step: int = 256          # single-step fused kernel batch tile
    btp: int = 256              # pipelined megakernel subtile (rows)
    btc: int = 256              # compact megakernel per-cell batch tile
    bs_group_mb: int = 36       # compact megakernel resident-acc VMEM budget
                                # (MB); rows per group = budget / (k1*N*4).
                                # The in-kernel expansion re-runs per group.
                                # Like every kernel knob here, read at TRACE
                                # time: overriding after a jitted gate has
                                # compiled is silently ignored (module
                                # CAVEAT — sweep via fresh closures or env
                                # in a fresh process)
    bta: int = 256              # two-kernel path: rotate tile
    btb: int = 256              # two-kernel path: matmul tile
    eslots: int = 3             # serial megakernel E-fetch ring slots
    pslots: int = 6             # pipelined megakernel shared E-ring slots
    # --- multi-key ---
    mk_btk: int = 0             # MK kernel batch tile; 0 = largest VMEM fit
    mk_bake_budget: int = -1    # bytes for the MK XLA-path bake;
                                # -1 = caller default, 0 = force prepared
    mk_sparse_limbs: str = "auto"  # auto|0|1: sparse nonzero-block storage
    mk_cmux: str = "auto"       # auto|expand|prepared|xla
    mk_chunk: int = 0           # steps per MK megakernel launch; 0 = auto
    mk_mega: str = "auto"       # chunked MK megakernel: auto|0|1 (auto =
                                # parties >= 4; measured r3: 2-party 1567 vs
                                # 1604 per-step, 4-party 386 vs 382)
    mk_compact: str = "auto"    # MK compact megakernel (in-kernel sparse
                                # expansion, zero HBM expanded operand):
                                # auto|0|1; auto = on for compiled TPU runs
    mk_group_mb: int = 56       # MK compact megakernel resident-group VMEM
                                # budget (MB): rows per group = budget /
                                # (acc+digit+comb row bytes); the per-step
                                # in-kernel expansion re-runs once per group,
                                # so bigger groups amortize it over more
                                # batch cells (~100 MB Mosaic scoped limit
                                # minus the step operand caps it). Measured
                                # r5 vs 28 MB: mk2-lownoise 2,096 -> 2,281
                                # (+8.8%), mk4 681 -> 755 (+10.8%), at the
                                # cost of a longer Mosaic compile (mk4:
                                # ~28 min first call). 80 MB: mk2 2,361
                                # (+3.7%) but mk4 only 762 (+1.1%) — the
                                # bigger per-row buffers at 4+ parties make
                                # 56 near-optimal there; 80 at 8 parties is
                                # untested against the ~100 MB scoped limit
    mk_progressive: bool = True  # triangular MK rotation: skip the blocks of
                                 # parties not yet processed (their acc
                                 # components are structurally zero) —
                                 # bit-exact, ~1.27x/1.53x/1.72x fewer MACs
                                 # at 2/4/8 parties (docs/mk_ksplit.md)
    # --- result-affecting ---
    radix_manylut: bool = True  # PBSmanyLUT pairs (coarser mod switch)
    pipe_ablate: str = ""       # timing-only ablations: results are WRONG
    debug: bool = False         # opt-in invariant checks at kernel boundaries

    RESULT_AFFECTING = ("radix_manylut", "pipe_ablate", "debug")

    def result_fingerprint(self) -> str:
        """The knobs a checkpoint must not silently change under."""
        return json.dumps(
            {k: getattr(self, k) for k in self.RESULT_AFFECTING},
            sort_keys=True)

    def describe(self) -> dict:
        """Full knob dict for benchmark logs / STATUS tables."""
        return dataclasses.asdict(self)


_ENV = {
    "karatsuba_depth": "TFHE_TPU_KARATSUBA_DEPTH",
    "bs_bake_budget": "TFHE_TPU_BS_BAKE_BUDGET",
    "cmux": "TFHE_TPU_CMUX",
    "pipe": "TFHE_TPU_PIPE",
    "btk": "TFHE_TPU_BTK",
    "bt_step": "TFHE_TPU_BT_STEP",
    "btp": "TFHE_TPU_BTP",
    "btc": "TFHE_TPU_BTC",
    "bs_group_mb": "TFHE_TPU_BS_GROUP_MB",
    "bta": "TFHE_TPU_BTA",
    "btb": "TFHE_TPU_BTB",
    "eslots": "TFHE_TPU_ESLOTS",
    "pslots": "TFHE_TPU_PSLOTS",
    "mk_btk": "TFHE_TPU_BTMK",
    "mk_bake_budget": "TFHE_TPU_MK_BAKE_BUDGET",
    "mk_sparse_limbs": "TFHE_TPU_MK_SPARSE_LIMBS",
    "mk_cmux": "TFHE_TPU_MK_CMUX",
    "mk_chunk": "TFHE_TPU_MK_CHUNK",
    "mk_mega": "TFHE_TPU_MK_MEGA",
    "mk_compact": "TFHE_TPU_MK_COMPACT",
    "mk_group_mb": "TFHE_TPU_MK_GROUP_MB",
    "mk_progressive": "TFHE_TPU_MK_PROGRESSIVE",
    "radix_manylut": "TFHE_TPU_RADIX_MANYLUT",
    "pipe_ablate": "TFHE_TPU_PIPE_ABLATE",
    "debug": "TFHE_TPU_DEBUG",
}

_OVERRIDE: list = []


def from_env() -> TuningConfig:
    """Parse the TFHE_TPU_* environment into a TuningConfig."""
    kw = {}
    for field in dataclasses.fields(TuningConfig):
        raw = os.environ.get(_ENV[field.name])
        if raw is None:
            continue
        if field.type == "bool":
            low = raw.strip().lower()
            if low in ("1", "true", "yes", "on"):
                kw[field.name] = True
            elif low in ("0", "false", "no", "off", ""):
                kw[field.name] = False
            else:
                raise ValueError(
                    f"{_ENV[field.name]}={raw!r}: expected a boolean "
                    "(1/true/yes/on or 0/false/no/off)"
                )
        elif field.type == "int":
            kw[field.name] = int(raw)
        else:
            kw[field.name] = raw
    return TuningConfig(**kw)


def get_tuning() -> TuningConfig:
    """The active config: explicit override if installed, else the env.

    Env parsing is repeated per call (it is only reached at Python trace
    time, never inside compiled code) so test fixtures that monkeypatch the
    environment behave as expected.
    """
    if _OVERRIDE:
        return _OVERRIDE[-1]
    return from_env()


def set_tuning(cfg: TuningConfig | None) -> None:
    """Install (or, with None, clear) a process-wide explicit config."""
    _OVERRIDE.clear()
    if cfg is not None:
        _OVERRIDE.append(cfg)


@contextlib.contextmanager
def override(**kwargs):
    """Context manager: temporarily replace named knobs."""
    base = get_tuning()
    _OVERRIDE.append(dataclasses.replace(base, **kwargs))
    try:
        yield _OVERRIDE[-1]
    finally:
        _OVERRIDE.pop()


# --- non-tuning environment reads, centralized so the whole package has a
# single env boundary (grep os.environ -> this module only) ---

def env_str(name: str, default: str | None = None) -> str | None:
    return os.environ.get(name, default)


def env_int(name: str, default: int | None = None) -> int | None:
    raw = os.environ.get(name)
    return default if raw is None else int(raw)


def append_xla_flag(flag: str) -> None:
    """XLA dump escape hatch (utils/profiling.py)."""
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = f"{flags} {flag}".strip()
