"""Scheme parameters: one frozen config for single- and multi-key TFHE.

TPU-native counterpart of the reference's parameter layer
(reference: src/api.jl:4-82, presets src/api.jl:30-69 and src/mk_api.jl:4-34).
Parameters are plain hashable Python dataclasses so they can ride jit as
static arguments; all derived quantities are properties computed at trace time.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class SchemeParameters:
    """All scheme parameters (reference: src/api.jl:4-21, the same 11 fields
    plus one TPU-build extension, `gadget_balanced`)."""

    lwe_size: int
    lwe_noise_stddev: float

    tlwe_polynomial_degree: int
    tlwe_mask_size: int

    bs_decomp_length: int
    bs_log2_base: int
    bs_noise_stddev: float

    ks_decomp_length: int
    ks_log2_base: int
    ks_noise_stddev: float

    max_parties: int = 1

    # Nearest-rounding ("balanced") gadget decomposition in the bootstrap's
    # external products. False = the reference-exact truncating construction
    # (src/tgsw.jl:99-117), whose -ulp/2 rounding bias adds O(N * B^-l)
    # phase error per CMUX step (noise.py:decompose_bias_var). True removes
    # the bias the same way the reference's own keyswitch rounds
    # (src/keyswitch.jl:58-59), enabling short-gadget geometries (l*b = 16).
    gadget_balanced: bool = False

    # --- derived (used throughout the kernels) ---

    @property
    def n(self) -> int:
        return self.lwe_size

    @property
    def N(self) -> int:
        return self.tlwe_polynomial_degree

    @property
    def k(self) -> int:
        return self.tlwe_mask_size

    @property
    def extracted_size(self) -> int:
        """LWE dimension after sample extraction (reference: src/tlwe.jl:25-31)."""
        return self.tlwe_polynomial_degree * self.tlwe_mask_size

    @property
    def bs_base(self) -> int:
        return 1 << self.bs_log2_base

    @property
    def ks_base(self) -> int:
        return 1 << self.ks_log2_base


def tfhe_parameters_80(tlwe_mask_size: int = 1) -> SchemeParameters:
    """~80-bit security preset (reference: src/api.jl:30-45, CGGI parameters)."""
    return SchemeParameters(
        lwe_size=500,
        lwe_noise_stddev=2.0**-15 * math.sqrt(2.0 / math.pi),
        tlwe_polynomial_degree=1024,
        tlwe_mask_size=tlwe_mask_size,
        bs_decomp_length=2,
        bs_log2_base=10,
        bs_noise_stddev=9e-9 * math.sqrt(2.0 / math.pi),
        ks_decomp_length=8,
        ks_log2_base=2,
        ks_noise_stddev=2.0**-15 * math.sqrt(2.0 / math.pi),
        max_parties=1,
    )


def tfhe_parameters_128(tlwe_mask_size: int = 1) -> SchemeParameters:
    """~128-bit security preset (reference: src/api.jl:55-69, CGGI2019)."""
    return SchemeParameters(
        lwe_size=630,
        lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=1024,
        tlwe_mask_size=tlwe_mask_size,
        bs_decomp_length=3,
        bs_log2_base=7,
        bs_noise_stddev=2.0**-25,
        ks_decomp_length=8,
        ks_log2_base=2,
        ks_noise_stddev=2.0**-15,
        max_parties=1,
    )


def tfhe_parameters_128_fast() -> SchemeParameters:
    """~128-bit preset retuned for the TPU's MXU cost model (k=4, N=256).

    The reference's 128-bit preset (src/api.jl:55-69: k=1, N=1024, bs l=3
    b=7) caps the v5e at ~9,950 gates/s: per-gate byte-MACs scale as
    n * macs(plan) * (k+1)^2 * l * N^2 but the RING dimension k*N is what
    security sees — so re-splitting the ring is an algorithmic lever the
    scheduler cannot reach. This preset keeps every lattice instance
    IDENTICAL to the reference's:

    * TLWE: k=4 masks of degree N=256 instead of k=1 of N=1024 — the SAME
      unstructured-LWE instance (dimension k*N=1024, modulus 2^32, binary
      secret, sigma 2^-25); module-LWE rank 4 over X^256+1 is not known to
      be weaker than ring-LWE over X^1024+1 at equal dimension, and
      lattice-estimator methodology rates both through that LWE instance.
    * Gadget: l=2 at base 2^8 with the BALANCED (nearest-rounding)
      decomposition — the reference-exact truncating gadget carries a
      -ulp/2 rounding bias whose key-convolved phase error scales as
      2^-(l*b) * N * sqrt(k) per step (measured 2.4e-3/step at l*b=16 at
      k=2 N=512 — broken; noise.py:decompose_bias_var). Balancing the
      gadget the way the reference's own keyswitch already rounds
      (src/keyswitch.jl:58-59) makes l*b=16 safe.
    * LWE (n=630, sigma 2^-15) and keyswitch (n_in = k*N = 1024, l=8,
      base 4, sigma 2^-15): unchanged.

    Net: 8.3G byte-MACs/gate vs 19.8G — algorithmic ceiling ~23,900
    gates/s on v5e; measured 17,400 gates/s (4096/4096 correct). Margin
    analysis (tools/derive_fast_params.py; honest noise model
    tfhe_tpu/noise.py): worst 2-input gate decision margin is 9.7 sigma on
    the conservative model (failure < 3e-22/gate) and ~11 sigma against
    measured noise — vs 19 sigma for the reference preset; the dominant
    term is the coarser 2N = 512 modulus switch. Asserted by
    tests/test_noise_model.py. For multi-valued PBS/radix (margins finer
    than the boolean 1/8) keep `tfhe_parameters_128` — docs/params_fast.md.
    """
    return SchemeParameters(
        lwe_size=630,
        lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=256,
        tlwe_mask_size=4,
        bs_decomp_length=2,
        bs_log2_base=8,
        bs_noise_stddev=2.0**-25,
        ks_decomp_length=8,
        ks_log2_base=2,
        ks_noise_stddev=2.0**-15,
        max_parties=1,
        gadget_balanced=True,
    )


def tfhe_parameters_128_fast8() -> SchemeParameters:
    """The k=8, N=128 frontier re-split of the 128-bit instance (M=1).

    Same attacker-visible lattice instance as `tfhe_parameters_128` /
    `tfhe_parameters_128_fast` (unstructured dimension k*N = 1024, q=2^32,
    binary secret, sigma 2^-25; LWE and keyswitch untouched — the pinned
    core-SVP estimate is bit-for-bit identical, tools/security_estimate.py),
    pushed one step further along the byte-MAC curve
    MACs ∝ n*l*(k+1)^2*N^2: 6.7G byte-MACs/gate vs 128_fast's 10.4G and
    the shipped k=4 preset's 8.3G — algorithmic ceiling ~29,500 gates/s
    (tools/derive_fast_params.py).

    With N = T = 128 the block-Toeplitz structure degenerates to M=1: ONE
    full negacyclic Toeplitz product per CMUX step (depth-0 plan, single
    leaf), fully lane-aligned. The TPU path runs it through the COMPACT
    megakernel (in-kernel Toeplitz expansion — at M=1 the expansion is 18
    strided rolls per step and the whole step operand is 10.6 MB of VMEM),
    so the 6.2 GB baked form is never needed.

    THE TRADE: the boolean decision margin shrinks to 5.8 sigma — model
    failure ~7e-9 per 2-input gate (vs 2e-38 at 128_fast). That is a
    documented reliability TIER, not a free win: use it where ~1e-8/gate
    is acceptable (bulk batch computation with outer error handling);
    keep `tfhe_parameters_128_fast` where cryptographic-grade gate
    reliability matters. Margins: tools/derive_fast_params.py; failure
    model asserted by tests/test_noise_model.py.
    """
    return SchemeParameters(
        lwe_size=630,
        lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=128,
        tlwe_mask_size=8,
        bs_decomp_length=2,
        bs_log2_base=8,
        bs_noise_stddev=2.0**-25,
        ks_decomp_length=8,
        ks_log2_base=2,
        ks_noise_stddev=2.0**-15,
        max_parties=1,
        gadget_balanced=True,
    )


def tfhe_parameters_128_pbs() -> SchemeParameters:
    """~128-bit preset retuned for PROGRAMMABLE bootstrapping (k=2, N=512).

    Multi-valued PBS slices the torus into 2*S buckets, so an S-entry LUT's
    decision margin is 1/(4S) — 1/16 at S=4 — instead of the boolean 1/8.
    `tfhe_parameters_128_fast` (k=4, N=256) optimizes boolean gates and
    leaves only ~5 sigma for S=4 (its 2N=512 modulus switch dominates);
    this intermediate re-split keeps the reference gadget (l=3, b=7 — no
    balanced-gadget dependence) at k=2, N=512: 11.1G byte-MACs/gate (1.8x
    the reference geometry's throughput, measured 11,209 NAND gates/s)
    with S=4 margins ~10 sigma (chained-LUT failure ~3e-24; model
    tools/derive_fast_params.py). Same lattice instances as the reference
    128-bit preset (ring dimension k*N = 1024, sigma 2^-25; LWE and
    keyswitch untouched). Radix arithmetic (effective S=8, margin 1/32)
    stays on `tfhe_parameters_128` — docs/leveled_mode.md.
    """
    return SchemeParameters(
        lwe_size=630,
        lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=512,
        tlwe_mask_size=2,
        bs_decomp_length=3,
        bs_log2_base=7,
        bs_noise_stddev=2.0**-25,
        ks_decomp_length=8,
        ks_log2_base=2,
        ks_noise_stddev=2.0**-15,
        max_parties=1,
    )


def tfhe_parameters_128_radix() -> SchemeParameters:
    """~128-bit preset retuned for RADIX integer arithmetic (S=8 digits).

    The radix decision margin is 1/(4S) = 1/32 against the phase error of
    digit+digit+carry (three bootstrap-fresh samples) plus the PBSmanyLUT
    q=2 modulus switch. At the reference 128 preset the model failure is
    ~3.8e-3/8-bit word (~3.5 sigma/decision). Two retunes, both at
    UNCHANGED lattice instances (dims, moduli, secret distributions and
    noise stddevs identical to src/api.jl:55-69; rated equal by
    tools/security_estimate.py):

    * the BALANCED gadget removes the truncating decomposition's bias term
      (61% of the blind-rotate variance at l*b=21 —
      noise.py:decompose_bias_var), and
    * the keyswitch gadget moves from (l=8, base 4) to (l=4, base 16):
      fewer table samples subtracted per output -> keyswitch-added
      variance 5.7e-6 -> 3.6e-6 at the same sigma_ks (the table grows
      2x to ~98 MB prepared; the contraction stays hidden under rotation).

    Net model failure 7.9e-5/word (4.4 sigma/decision) at UNCHANGED
    rotation cost — same measured words/s as the 128 preset. The 1e-9/word
    class is PROVABLY out of reach at this throughput: the manylut modulus
    switch alone (sigma 5.0e-3 at N=1024) floors failure at 3.6e-9/word
    even with zero bootstrap noise — see `tfhe_parameters_128_radix_reliable`
    and docs/leveled_mode.md section 2b for the Pareto analysis
    (tools/derive_fast_params.py reproduces the numbers).
    """
    return SchemeParameters(
        lwe_size=630,
        lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=1024,
        tlwe_mask_size=1,
        bs_decomp_length=3,
        bs_log2_base=7,
        bs_noise_stddev=2.0**-25,
        ks_decomp_length=4,
        ks_log2_base=4,
        ks_noise_stddev=2.0**-15,
        max_parties=1,
        gadget_balanced=True,
    )


def tfhe_parameters_128_radix_reliable() -> SchemeParameters:
    """~128-bit radix preset for HARD reliability targets (<=1e-9/word).

    Finer bootstrap gadget (l=4, b=6, balanced) on the same lattice
    instances; combined with the stacked two-rotation LUT path
    (TFHE_TPU_RADIX_MANYLUT=0 — the q=2 manylut modulus switch is the
    floor that rules out 1e-9 at N=1024, see tfhe_parameters_128_radix),
    the model failure is 1.6e-10/8-bit word (6.7 sigma/decision) at ~0.37x
    the 128-preset words/s (4/3 rotation MACs x 2 rotations/digit).
    With manylut left on, this preset still gives 7.4e-6/word at 0.75x.

    On a 16 GB chip this preset is COMPACT-serving-only: the l=4 gadget
    bakes to ~11.9 GB, which OOMs once bake temporaries are counted
    (measured round 5, fresh process) — keygen under
    `tuning.override(bs_bake_budget=0)` like `tfhe_parameters_128_fast8`.
    """
    return SchemeParameters(
        lwe_size=630,
        lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=1024,
        tlwe_mask_size=1,
        bs_decomp_length=4,
        bs_log2_base=6,
        bs_noise_stddev=2.0**-25,
        ks_decomp_length=4,
        ks_log2_base=4,
        ks_noise_stddev=2.0**-15,
        max_parties=1,
        gadget_balanced=True,
    )


def tfhe_parameters_toy() -> SchemeParameters:
    """Tiny insecure parameters for fast oracle-equivalence tests only.

    The arithmetic is exact at every size, so bit-exactness checked here
    transfers to the production presets; see tests/.
    """
    return SchemeParameters(
        lwe_size=16,
        lwe_noise_stddev=2.0**-15,
        tlwe_polynomial_degree=256,
        tlwe_mask_size=1,
        bs_decomp_length=3,
        bs_log2_base=7,
        bs_noise_stddev=2.0**-25,
        ks_decomp_length=8,
        ks_log2_base=2,
        ks_noise_stddev=2.0**-15,
        max_parties=1,
    )
