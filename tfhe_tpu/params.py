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
    """All scheme parameters (reference: src/api.jl:4-21, same 11 fields)."""

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
