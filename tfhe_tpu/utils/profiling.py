"""Profiling, roofline counters, and compiler-dump hooks.

The reference has no tracing of any kind (SURVEY.md section 5: no timers, no
`@profile` anywhere in `src/`). For a production TPU framework this module
provides the three standard observability hooks:

* `trace(dir)` — context manager around `jax.profiler` start/stop; view the
  result in TensorBoard/XProf or pass `host=True` for host-side perfetto.
* `bootstrap_roofline(...)` — exact analytic work counters for the gate
  bootstrap hot path (byte-MACs on the MXU, HBM bytes streamed, VPU
  elementwise passes), plus hardware ceilings, so a measured wall time turns
  into utilization numbers. The counters mirror the kernel structure in
  ops/pallas_cmux.py (blind-rotation megakernel) and ops/karatsuba.py.
* `enable_xla_dump(dir)` — escape hatch that sets `--xla_dump_to` for the
  next backend initialization (must run before first device use).

Reference hot-loop being modeled: src/bootstrap.jl:32-39 / src/tgsw.jl:125-129.
"""

from __future__ import annotations

import contextlib
import dataclasses


# v5e per-chip ceilings (int8 MXU MACs/s counts one multiply-add as one MAC)
V5E_INT8_MACS = 197e12
V5E_HBM_BYTES = 819e9


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tfhe_tpu_trace"):
    """Capture a jax.profiler trace of the enclosed block.

    Open the directory with TensorBoard's profile plugin (or xprof) to see
    per-kernel device timelines, HBM traffic and scoped-VMEM usage.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_xla_dump(dump_dir: str = "/tmp/tfhe_tpu_xla_dump") -> str:
    """Arrange for XLA to dump HLO/LLO for every subsequent compilation.

    Must be called before the backend first initializes (XLA reads the env
    var once); raises if a backend already exists so a silent no-op cannot
    masquerade as a dump.
    """
    import jax

    if jax._src.xla_bridge._backends:  # noqa: SLF001 - deliberate guard
        raise RuntimeError(
            "enable_xla_dump must run before the first JAX backend "
            "initialization; set XLA_FLAGS=--xla_dump_to=... in the "
            "environment instead")
    from ..tuning import append_xla_flag

    append_xla_flag(f"--xla_dump_to={dump_dir}")
    return dump_dir


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Work counters for one batched gate bootstrap invocation."""

    byte_macs: int        # int8 MXU multiply-adds
    hbm_bytes: int        # bytes streamed from HBM (key + acc traffic)
    vpu_elems: int        # int32 elementwise results produced on the VPU
    mxu_floor_s: float    # byte_macs / peak MACs
    hbm_floor_s: float    # hbm_bytes / peak bandwidth

    def utilization(self, measured_s: float) -> dict:
        """Fraction of each ceiling achieved by a measured wall time."""
        return {
            "mxu": self.mxu_floor_s / measured_s,
            "hbm": self.hbm_floor_s / measured_s,
            "floor_s": max(self.mxu_floor_s, self.hbm_floor_s),
        }


def bootstrap_roofline(params, batch: int, depth: int = 2,
                       block: int = 128, cells: int | None = None) -> Roofline:
    """Exact work counters for `batch` gate bootstraps at `params`.

    Mirrors the megakernel: per CMUX step, `macs_superblocks(plan)` int8
    dots of [bt, P*T] x [P*T, K*4T]; the whole baked key re-streamed once
    per batch cell per step; the accumulator resident in VMEM (one HBM
    round-trip per cell total). VPU: barrel rotate (log2 N stages, k+1
    rows), digit extraction (l limbs), limb recombination + fold.
    """
    from ..ops.karatsuba import karatsuba_plan

    n = params.tlwe_polynomial_degree
    k1 = params.tlwe_mask_size + 1
    l = params.bs_decomp_length
    b = params.bs_log2_base
    steps = params.lwe_size
    m = n // block
    p = k1 * l
    pt = p * block
    cols = k1 * 4 * block

    plan = karatsuba_plan(m, min(depth, m.bit_length() - 1), b)
    # one counted super-block product = [1, P*T] x [P*T, K*4T] per batch row
    # (dense check: 64 * 768 * 1024 = 50.3M MACs/step/row at 128-bit params)
    byte_macs = batch * steps * plan.macs_superblocks * pt * cols

    if cells is None:
        cells = max(1, batch // 512)  # pipelined default: 512-row cells
    key_bytes = steps * plan.total_rows * pt * cols
    hbm = key_bytes * cells + 2 * batch * k1 * n * 4  # key streams + acc io

    stages = (n - 1).bit_length()
    vpu_row_step = (
        k1 * (2 * stages + 3) * n      # barrel rotate + flip/sub
        + k1 * l * 2 * n               # digit shift/mask/store
        + plan.macs_superblocks * 2 * cols // 4  # recombine+fold (approx)
    )
    vpu = batch * steps * vpu_row_step

    return Roofline(
        byte_macs=int(byte_macs),
        hbm_bytes=int(hbm),
        vpu_elems=int(vpu),
        mxu_floor_s=byte_macs / V5E_INT8_MACS,
        hbm_floor_s=hbm / V5E_HBM_BYTES,
    )
