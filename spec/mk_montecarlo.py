"""Monte-Carlo of reference-semantics MK-TFHE noise at production parameters.

Runs the full 2-party MK NAND pipeline entirely through the NumPy executable
spec (spec/oracle.py + spec/oracle_mk.py) with float64 noise sampling —
independent of the JAX/TPU stack and of its float32 noise pipeline. This is
the reference's own distribution (same arithmetic semantics, bit-exact-tested;
same sampling distributions as Julia's randn*sigma + trunc), so the measured
output-phase sigma and failure rate are what the reference's unseeded CI test
(/root/reference/test/runtests.jl:60-100) experiences.

Convolutions use the reference's own method — float64 FFT negacyclic
multiplication (src/polynomials.jl:106-132), exact for the small operands in
this pipeline (digits <= 2^6, binary keys; precision note
src/polynomials.jl:135-141) — verified at startup against the schoolbook
oracle conv, then monkey-patched in for speed.

Usage:  python spec/mk_montecarlo.py [n_gates]     (CPU-only, no JAX)
Emits one JSON line per gate to stdout and a summary at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spec.oracle as oracle
import spec.oracle_mk as oracle_mk
from spec.oracle import w32

# --- 2-party production preset (reference: src/mk_api.jl:4-10);
# candidate gadgets via MC_BSL / MC_BSB / MC_BALANCED env (round-3
# retuning: see mktfhe_parameters_2party_* in tfhe_tpu/mk/api.py) ---
N_LWE = 500
ALPHA_LWE = 0.012467
N_POLY = 1024
BS_L = int(os.environ.get("MC_BSL", "4"))
BS_B = int(os.environ.get("MC_BSB", "7"))
BS_ALPHA = 3.29e-10
BALANCED = os.environ.get("MC_BALANCED", "0") == "1"
KS_L, KS_B, KS_ALPHA = 8, 2, 2.44e-5
PARTIES = int(os.environ.get("MC_PARTIES", "2"))
MU = np.int64(np.int32(1 << 29))  # encode_message(1, 8)
TWO32 = float(2**32)


def fft_negacyclic_mul(x, y):
    """Exact negacyclic product mod 2^32 via the reference's tangent FFT
    (float64), valid for |x| small (src/polynomials.jl:135-141)."""
    n = len(x)
    w = np.exp(-1j * np.pi * np.arange(n) / n)
    fx = np.fft.fft(np.asarray(x, np.float64) * w)
    fy = np.fft.fft(np.asarray(y, np.float64) * w)
    prod = np.fft.ifft(fx * fy) * np.conj(w)
    # round to nearest integer, reduce mod 2^32 into int32
    r = np.rint(prod.real)
    return (np.asarray(r % TWO32, np.uint32)).astype(np.int32)


def _install_fast_conv():
    """Verify FFT conv == schoolbook oracle conv on digit-bounded operands,
    then patch it into both oracle modules."""
    rng = np.random.default_rng(0)
    for _ in range(4):
        x = rng.integers(-64, 65, N_POLY).astype(np.int32)
        y = rng.integers(-2**31, 2**31, N_POLY, dtype=np.int64).astype(np.int32)
        assert (fft_negacyclic_mul(x, y) == oracle.negacyclic_mul(x, y)).all()
        xb = rng.integers(0, 2, N_POLY).astype(np.int32)  # binary operand
        assert (fft_negacyclic_mul(xb, y) == oracle.negacyclic_mul(xb, y)).all()
    oracle.negacyclic_mul = fft_negacyclic_mul
    oracle_mk.negacyclic_mul = fft_negacyclic_mul


def dtot32_f64(x):
    return np.trunc(np.asarray(x, np.float64) * TWO32).astype(np.int64).astype(
        np.int32
    )


def gauss_t32(rng, sigma, shape):
    return dtot32_f64(rng.standard_normal(shape) * sigma)


def uniform_t32(rng, shape):
    return rng.integers(-2**31, 2**31, shape, dtype=np.int64).astype(np.int32)


def keygen(rng):
    shared_a = uniform_t32(rng, (BS_L, N_POLY))
    parties = []
    for _ in range(PARTIES):
        lwe_key = rng.integers(0, 2, N_LWE).astype(np.int32)
        tlwe_key = rng.integers(0, 2, N_POLY).astype(np.int32)
        pk = oracle_mk.public_key_core(
            tlwe_key, shared_a, gauss_t32(rng, BS_ALPHA, (BS_L, N_POLY)))
        parties.append(dict(lwe=lwe_key, tlwe=tlwe_key, pk=pk))
    pk_bs = np.stack([p["pk"] for p in parties])

    exps = []
    for pi, p in enumerate(parties):
        row = []
        for j in range(N_LWE):
            ue = oracle_mk.mk_tgsw_encrypt_core(
                int(p["lwe"][j]),
                rng.integers(0, 2, N_POLY).astype(np.int32),
                uniform_t32(rng, (BS_L, N_POLY)),
                uniform_t32(rng, (BS_L, N_POLY)),
                dict(
                    c0=gauss_t32(rng, BS_ALPHA, (BS_L, N_POLY)),
                    d0=gauss_t32(rng, BS_ALPHA, (BS_L, N_POLY)),
                    d1=gauss_t32(rng, BS_ALPHA, (BS_L, N_POLY)),
                    f0=gauss_t32(rng, BS_ALPHA, (BS_L, N_POLY)),
                ),
                p["tlwe"], shared_a, p["pk"], BS_L, BS_B,
            )
            row.append(oracle_mk.mk_tgsw_expand(ue, pi, pk_bs, BS_L, BS_B))
        exps.append(row)

    # party-local keyswitch tables (reference recentred-noise recipe,
    # src/keyswitch.jl:28-38), mirrored in float64
    ks_tables = []
    base = 1 << KS_B
    for p in parties:
        in_key = p["tlwe"]  # extracted (k=1: the ring key coefficients)
        noise = rng.standard_normal((N_POLY, KS_L, base - 1)) * KS_ALPHA
        noise = dtot32_f64((noise - noise.mean()).transpose(2, 1, 0))
        a = uniform_t32(rng, (base - 1, KS_L, N_POLY, N_LWE))
        h = np.arange(1, base, dtype=np.int64)[:, None, None]
        j = np.arange(1, KS_L + 1, dtype=np.int64)[None, :, None]
        msg = w32(in_key.astype(np.int64)[None, None, :] * h
                  * (np.int64(1) << (32 - j * KS_B)))
        b = w32(msg.astype(np.int64) + noise.astype(np.int64)
                + (a.astype(np.int64) * p["lwe"].astype(np.int64)).sum(-1))
        ks_tables.append((a, b))
    return shared_a, parties, exps, ks_tables


def mk_encrypt(rng, parties, bit):
    mu = MU if bit else -MU
    a = uniform_t32(rng, (PARTIES, N_LWE))
    b = w32(mu + gauss_t32(rng, ALPHA_LWE, ()).astype(np.int64)
            + sum((a[i].astype(np.int64) * parties[i]["lwe"].astype(np.int64)).sum()
                  for i in range(PARTIES)))
    return a, np.int32(b)


def mk_phase(parties, a, b):
    dots = sum((a[i].astype(np.int64) * parties[i]["lwe"].astype(np.int64)).sum()
               for i in range(PARTIES))
    return w32(np.int64(b) - dots)


def one_gate(rng, parties, exps, ks_tables):
    xa, xb = mk_encrypt(rng, parties, False)
    ya, yb = mk_encrypt(rng, parties, False)   # NAND(F, F) = True
    lin_a = w32(-(xa.astype(np.int64) + ya.astype(np.int64)))
    lin_b = np.int32(w32(np.int64(MU) - xb - yb))
    # oracle layout: masks [n, parties]
    u_a, u_b = oracle_mk.mk_bootstrap_wo_keyswitch(
        exps, np.int32(MU), lin_a.T, lin_b, N_POLY, BS_L, BS_B, BALANCED)
    pre_phase = int(w32(np.int64(u_b) - sum(
        (u_a[i].astype(np.int64) * parties[i]["tlwe"].astype(np.int64)).sum()
        for i in range(PARTIES))))
    o_a, o_b = oracle_mk.mk_keyswitch(ks_tables, u_a, u_b, KS_L, KS_B)
    phase = int(mk_phase(parties, o_a, o_b))
    err = ((phase - int(MU) + 2**31) % 2**32) - 2**31
    pre_err = ((pre_phase - int(MU) + 2**31) % 2**32) - 2**31
    return err / TWO32, pre_err / TWO32, phase > 0


def main():
    n_gates = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(os.environ.get("MC_SEED", "1"))
    _install_fast_conv()
    rng = np.random.default_rng(seed)
    t0 = time.time()
    shared_a, parties, exps, ks_tables = keygen(rng)
    print(json.dumps({"event": "keygen_done", "secs": time.time() - t0}),
          flush=True)
    errs, pre_errs, fails = [], [], 0
    for gi in range(n_gates):
        t0 = time.time()
        err, pre_err, ok = one_gate(rng, parties, exps, ks_tables)
        errs.append(err)
        pre_errs.append(pre_err)
        fails += int(not ok)
        print(json.dumps({"gate": gi, "err": err, "pre_ks_err": pre_err,
                          "ok": bool(ok), "secs": time.time() - t0}),
              flush=True)
    errs = np.asarray(errs)
    pre = np.asarray(pre_errs)
    print(json.dumps({
        "event": "summary", "n_gates": n_gates,
        "gadget": {"l": BS_L, "b": BS_B, "balanced": BALANCED,
                   "parties": PARTIES},
        "out_sigma": float(errs.std()), "pre_ks_sigma": float(pre.std()),
        "failures": fails, "fail_rate": fails / n_gates,
    }), flush=True)


if __name__ == "__main__":
    main()
