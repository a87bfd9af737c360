"""Analytic noise-variance model: makes `cv` bookkeeping honest.

The reference carries `current_variance` on every sample but leaves it
unmaintained through the key operations (TODO issue #7 markers at
src/tlwe.jl:58,104,109, src/tgsw.jl:67, src/mk_internals.jl:94,343,389) and
never reads it. This framework ships noise telemetry as a feature, so the
field is propagated for real: the formulas below are the standard TFHE
variance bounds (CGGI16 external-product/keyswitch analysis; MK chain
derived and validated against a 300-gate float64 Monte-Carlo in
docs/mk_noise_budget.md).

All variances are in torus units (fractions of 1, squared). They use the
NOMINAL sampling stddev; the trunc discretization of `dtot32` only shrinks
actual noise (conservative direction). Predicted-vs-measured agreement is
asserted by tests/test_noise_model.py.
"""

from __future__ import annotations


def decompose_bias_var(mask_size: int, decomp_length: int, log2_base: int,
                       poly_degree: int) -> float:
    """Phase-variance of the gadget decomposition's rounding BIAS, per step.

    The reference's offset-trick decomposition (src/tgsw.jl:99-117, ours is
    bit-exact to it) truncates rather than rounds: the per-coefficient
    reconstruction error is -(x mod ulp), i.e. uniform on (-ulp, 0] with a
    systematic mean of -ulp/2 (ulp = B^-l). A constant error polynomial
    convolved (negacyclically) with the binary key gives phase coefficients
    bias * D_t, where D_t are the key's signed partial sums — magnitude
    O(N), NOT O(sqrt(N)). E_t[D_t^2] ~ N/4 + N^2/12 per mask polynomial.
    This term is what rules out small l*b parameter sets on the biased
    decomposition (l*b = 16 measures 2.4e-3 phase error PER STEP at k=2,
    N=512 vs 1.1e-4 for l*b = 21): see tools/derive_fast_params.py.
    The 2.5x calibration covers the measured excess over the independent-
    coefficient model (tests/test_noise_model.py pins model vs measurement).
    """
    bias = 2.0 ** -(decomp_length * log2_base + 1)
    d2 = poly_degree / 4.0 + poly_degree**2 / 12.0
    return 2.5 * mask_size * d2 * bias * bias


def extern_product_var(mask_size: int, decomp_length: int, log2_base: int,
                       poly_degree: int, sigma_bk: float,
                       balanced: bool = False) -> float:
    """Phase-variance added by one TGSW external product (one CMUX step).

    Three terms: digit-times-key-noise ((k+1)*l*N * E[dig^2] * sigma^2 with
    digits ~uniform on [-B/2, B/2)), the zero-mean part of the gadget
    rounding against the (binary) key (eps = B^-l / 2), and the rounding
    BIAS term (see `decompose_bias_var` — the dominant rounding effect).
    Reference op: src/tgsw.jl:125-129.
    """
    k1 = mask_size + 1
    e_dig2 = (1 << (2 * log2_base)) / 12.0
    eps = 2.0 ** -(decomp_length * log2_base + 1)
    bias = 0.0 if balanced else decompose_bias_var(
        mask_size, decomp_length, log2_base, poly_degree)
    return (k1 * decomp_length * poly_degree * e_dig2 * sigma_bk**2
            + (1 + mask_size * poly_degree / 2.0) * eps * eps
            + bias)


def blind_rotate_var(n_steps: int, mask_size: int, decomp_length: int,
                     log2_base: int, poly_degree: int,
                     sigma_bk: float, balanced: bool = False) -> float:
    """n accumulated CMUX steps (src/bootstrap.jl:32-39); steps with
    bara == 0 add exactly zero, but their expected fraction is 1/2N —
    negligible, so the bound keeps the full n."""
    return n_steps * extern_product_var(
        mask_size, decomp_length, log2_base, poly_degree, sigma_bk, balanced)


def keyswitch_var(n_in: int, decomp_length: int, log2_base: int,
                  sigma_ks: float) -> float:
    """Keyswitch-added variance: one fresh table sample subtracted per
    nonzero digit (expected fraction (base-1)/base), plus the
    round-to-l*b-bits error carried through the binary in-key.
    Reference op: src/keyswitch.jl:45-80.
    """
    base = 1 << log2_base
    nonzero = (base - 1) / base
    round_err = 2.0 ** -(decomp_length * log2_base + 1)
    return (n_in * decomp_length * nonzero * sigma_ks**2
            + n_in * 0.5 * round_err * round_err / 3.0)


def mk_expand_var(parties: int, decomp_length: int, log2_base: int,
                  poly_degree: int, sigma: float) -> float:
    """Noise variance of an expanded MK-TGSW column (x_ij, i != party):
    d0's fresh noise + <g^-1(pk diff), f0-noise>.
    Reference op: src/mk_internals.jl:304-345; docs/mk_noise_budget.md.
    """
    e_dig2 = (1 << (2 * log2_base)) / 12.0
    return sigma**2 * (1 + decomp_length * poly_degree * e_dig2)


def mk_extern_product_var(parties: int, decomp_length: int, log2_base: int,
                          poly_degree: int, sigma: float,
                          balanced: bool = False) -> float:
    """One MK CMUX step: (parties-1) mask columns carry expanded noise, the
    party's own column and the body carry fresh noise; plus the gadget
    rounding terms (zero-mean part and, for the reference-exact truncating
    gadget, the -ulp/2 bias convolved through the ring keys — the same
    mechanism as the single-key `decompose_bias_var`, scaled by the
    `parties` ring keys).
    Reference op: src/mk_internals.jl:348-391; validated in
    docs/mk_noise_budget.md (predicted 0.054 vs Monte-Carlo 0.0513 on the
    2-party preset over the full rotation) and by the parametrized
    spec/mk_montecarlo.py for the retuned gadgets."""
    e_dig2 = (1 << (2 * log2_base)) / 12.0
    v_exp = mk_expand_var(parties, decomp_length, log2_base, poly_degree,
                          sigma)
    eps = 2.0 ** -(decomp_length * log2_base + 1)
    bias = 0.0 if balanced else parties * decompose_bias_var(
        1, decomp_length, log2_base, poly_degree)
    # EXPANSION rounding re-amplified by the extern digits: the expanded
    # x/y cells carry the g^-1(b_i - b_party) reconstruction error eps
    # convolved with the fresh binary r (per-coefficient variance
    # ~ N/2 * eps^2), and the extern product multiplies those cells by
    # digit-scale operands — this term is why the REFERENCE increases l*b
    # with party count (28/30/32 bits at 2/4/8 parties) and why short MK
    # gadgets fail catastrophically (validated: spec/mk_montecarlo.py at
    # l=3 b=6 predicts saturation and measures a uniform output phase).
    exp_round = (decomp_length * poly_degree * e_dig2
                 * (parties - 1) * (poly_degree / 2.0) * eps * eps)
    return (decomp_length * poly_degree * e_dig2
            * ((parties - 1) * v_exp + 2 * sigma**2)
            + (1 + parties * poly_degree / 2.0) * eps * eps
            + exp_round + bias)


def mk_blind_rotate_var(parties: int, lwe_size: int, decomp_length: int,
                        log2_base: int, poly_degree: int,
                        sigma: float, balanced: bool = False) -> float:
    return parties * lwe_size * mk_extern_product_var(
        parties, decomp_length, log2_base, poly_degree, sigma, balanced)
