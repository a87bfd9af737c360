"""Derivation and margin analysis for `tfhe_parameters_128_fast`.

Round-2 analysis (STATUS.md, ops/karatsuba.py) proved the 128-bit preset's
depth-2 block-Karatsuba MAC count (19.8G byte-MACs/gate) caps a v5e at
~9,950 gates/s — below the 1e4 north star at 100% efficiency. The MAC count
per gate is

    byteMACs = n_lwe * macs(plan(N/T, depth, b)) * (P*T) * (K*4*T)

with P = (k+1)*l operand polys and K = k+1 outputs, so the algorithmic
levers are the SCHEME parameters (k, N, l, b), not the schedule. This script
enumerates the candidate geometries that keep the lattice instance identical
to the reference's 128-bit preset (reference: src/api.jl:55-69) and prints
the byte-MAC count, ceiling, and per-gate failure probabilities from the
validated noise model (tfhe_tpu/noise.py, tests/test_noise_model.py).

Security invariants held fixed (so the 128-bit claim carries over unchanged):
  * LWE instance: n=630, q=2^32, binary secret, sigma = 2^-15  (unchanged)
  * TLWE instance: total dimension k*N = 1024, q=2^32, binary secret,
    sigma = 2^-25 (the reference has k=1, N=1024; k=2, N=512 is the SAME
    unstructured-LWE instance — dimension 1024, same modulus/noise/secret
    distribution — and module-LWE rank 2 over X^256+1... over X^512+1 is
    not known to be weaker than ring-LWE over X^1024+1 at equal dimension;
    lattice-estimator methodology evaluates both through the identical
    LWE instance).
  * Keyswitch: n_in = k*N = 1024, l=8, base 4, sigma = 2^-15   (unchanged)

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/derive_fast_params.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu.noise import blind_rotate_var, keyswitch_var
from tfhe_tpu.ops.karatsuba import karatsuba_plan

V5E_BYTE_MACS = 197e12  # int8 MACs/s, v5e MXU
T = 128
N_LWE = 630
SIGMA_LWE = 2.0**-15
SIGMA_BS = 2.0**-25
SIGMA_KS = 2.0**-15
KS_L, KS_B = 8, 2


def mod_switch_var(n: int, poly_degree: int) -> float:
    """Phase-error variance of switching (a, b) to Z_2N: n binary-secret
    coefficients each with uniform rounding error on [-1/4N, 1/4N) plus the
    body's own rounding (reference op: src/bootstrap.jl:74-75)."""
    per = (1.0 / (2 * poly_degree)) ** 2 / 12.0
    return (n * 0.5 + 1) * per


def gate_sigma(k: int, big_n: int, l: int, b: int, amp: int,
               balanced: bool = False) -> float:
    """Stddev of the phase error at the blind-rotation decision point for a
    gate whose affine combo multiplies each input ciphertext by `amp`
    (|amp| = 1 for NAND/AND/OR..., 2 for XOR/XNOR), two bootstrapped inputs."""
    v_out = (
        blind_rotate_var(N_LWE, k, l, b, big_n, SIGMA_BS, balanced)
        + keyswitch_var(k * big_n, KS_L, KS_B, SIGMA_KS)
    )
    v_in = 2 * (amp**2) * v_out
    return math.sqrt(v_in + mod_switch_var(N_LWE, big_n))


def failure(margin: float, sigma: float) -> float:
    return math.erfc(margin / (sigma * math.sqrt(2.0)))


def analyse(tag: str, k: int, big_n: int, l: int, b: int, depth: int,
            balanced: bool = False, t: int = T):
    m = big_n // t
    depth = min(depth, m.bit_length() - 1)
    plan = karatsuba_plan(m, depth, b)
    p, kk = (k + 1) * l, k + 1
    byte_macs = N_LWE * plan.macs_superblocks * (p * t) * (kk * 4 * t)
    ceiling = V5E_BYTE_MACS / byte_macs
    key_gb = N_LWE * plan.total_rows * p * t * kk * 4 * t / 2**30
    s1 = gate_sigma(k, big_n, l, b, 1, balanced)
    s2 = gate_sigma(k, big_n, l, b, 2, balanced)
    f1 = failure(1.0 / 8, s1)   # NAND/AND/OR/...: phases +-1/8, margin 1/8
    f2 = failure(1.0 / 4, s2)   # XOR/XNOR: phases +-1/4, margin 1/4
    print(f"{tag:28s} byteMACs/gate={byte_macs/1e9:6.1f}G "
          f"ceiling={ceiling:7.0f}/s key={key_gb:5.2f}GB "
          f"sigma1={s1:.5f} ({0.125/s1:4.1f} sd) fail1={f1:.1e} "
          f"sigma2={s2:.5f} ({0.25/s2:4.1f} sd) fail2={f2:.1e}")
    return ceiling, f1, f2


def radix_analyse(tag: str, k: int, big_n: int, l: int, b: int,
                  balanced: bool, manylut: bool, ks_l: int, ks_b: int,
                  rel_cost: float):
    """Radix (S=8) digit-position margin: PBS input = digit+digit+carry
    (three bootstrap-fresh samples) against the 1/(4S) = 1/32 decision
    margin, with the PBSmanyLUT q=2 coarser modulus switch when manylut.
    8 decisions per 8-bit word (4 positions x sum/carry LUTs).
    rel_cost: rotation cost relative to the 128-preset manylut adder
    (l/3 gadget scaling x 2 if manylut is off)."""
    q = 2 if manylut else 1
    v_out = (blind_rotate_var(N_LWE, k, l, b, big_n, SIGMA_BS, balanced)
             + keyswitch_var(k * big_n, ks_l, ks_b, SIGMA_KS))
    per = (q / (2.0 * big_n)) ** 2 / 12.0
    v_ms = (N_LWE * 0.5 + 1) * per
    sigma = math.sqrt(3 * v_out + v_ms)
    margin = (1.0 / 32) / sigma
    fail_word = 8 * math.erfc(margin / math.sqrt(2.0))
    print(f"{tag:44s} sigma={sigma:.2e} margin={margin:4.2f} sd "
          f"fail/word={fail_word:.1e} words/s~{1520 / rel_cost:5.0f}")
    return sigma, fail_word


if __name__ == "__main__":
    print("reference-identical lattice instances (k*N=1024, sigma 2^-25):")
    analyse("128 (reference: k1 N1024 l3b7)", 1, 1024, 3, 7, 2)
    analyse("k2 N512 l3 b7 (biased ok)", 2, 512, 3, 7, 2)
    # The l*b = 16 geometries are CHEAPER on the MXU but are ruled out by
    # the decomposition-bias term (noise.py:decompose_bias_var) on the
    # reference-exact (biased) decomposition: 1.4 sigma = broken. The
    # zero-mean BALANCED decomposition (gadget_balanced=True, the shipped
    # 128_fast) re-enables them.
    analyse("biased k2 N512 l2 b8: BROKEN", 2, 512, 2, 8, 2)
    analyse("128_fast (balanced l2 b8)", 2, 512, 2, 8, 2, balanced=True)
    analyse("balanced k4 N256 l2 b8", 4, 256, 2, 8, 1, balanced=True)
    # round-5 frontier point: k=8, N=128 with T = N = 128 — the block
    # structure degenerates to M=1 (ONE full negacyclic Toeplitz product
    # per step, lane-aligned, no sub-lane T=64 blocks), so the existing
    # kernels apply once the M >= 2 assumption is lifted
    analyse("balanced k8 N128 l2 b8 (M=1)", 8, 128, 2, 8, 0, balanced=True)
    analyse("balanced k8 N128 l3 b6 (M=1)", 8, 128, 3, 6, 0, balanced=True)

    print()
    print("radix (S=8) digit margins — the Pareto behind "
          "tfhe_parameters_128_radix{,_reliable}:")
    radix_analyse("128 preset as shipped r3 (trunc, ks l8b2, many)",
                  1, 1024, 3, 7, False, True, 8, 2, 1.0)
    radix_analyse("128_radix (bal l3b7, ks l4b4, many)",
                  1, 1024, 3, 7, True, True, 4, 4, 1.0)
    radix_analyse("128_radix_reliable + many (bal l4b6, ks l4b4)",
                  1, 1024, 4, 6, True, True, 4, 4, 4 / 3)
    radix_analyse("128_radix_reliable, NO many (<=1e-9 class)",
                  1, 1024, 4, 6, True, False, 4, 4, 8 / 3)
    # The joint target ">=1520 words/s AND <=1e-9/word" is INFEASIBLE on
    # the 32-bit torus: the manylut modulus switch alone floors the
    # failure, and dropping manylut halves throughput.
    per2 = (2.0 / (2.0 * 1024)) ** 2 / 12.0
    ms = math.sqrt((N_LWE * 0.5 + 1) * per2)
    fl = 8 * math.erfc((1.0 / 32) / ms / math.sqrt(2.0))
    print(f"{'manylut ms floor (zero bootstrap noise)':44s} "
          f"sigma={ms:.2e} -> fail/word >= {fl:.1e}")
