"""Measure the MK-TFHE noise budget empirically at production parameters.

Round-1 left an unexplained ~2% decrypt-failure rate on production 2-party
MK NAND ("output phase sigma ~0.05 vs 0.125 margin"). This harness settles
whether that is intrinsic to the reference's parameter set
(/root/reference/src/mk_api.jl:4-10) or an implementation bug, by measuring:

  1. uni-encryption component noise (should be the preset's 3.29e-10),
  2. blind-rotate phase-error growth vs CMUX step count (zeroed bara steps
     are exact no-ops — SURVEY.md section 2 item 3 — so masking bara after
     step K measures the noise after exactly K live steps),
  3. final post-keyswitch output sigma + decrypt-failure rate,
  4. the same pipeline with float64-sampled *injected* key noise, isolating
     the framework's float32 noise sampling as a possible culprit.

Run on the real TPU chip (fast path):  python tools/mk_noise_measure.py
Knobs: MK_NOISE_BATCH (default 512), MK_NOISE_PARTIES (2), MK_NOISE_F64 (0/1).

Companion: spec/mk_montecarlo.py (pure-NumPy oracle Monte-Carlo, CPU) and
docs/mk_noise_budget.md (the analytic budget both are compared against).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tfhe_tpu as tt
import tfhe_tpu.mk as mk
from tfhe_tpu.mk.api import CloudKeyPart, SharedKey, make_mk_cloud_key
from tfhe_tpu.mk.internals import (
    mk_bootstrap_wo_keyswitch,
    mk_keyswitch,
    mk_lwe_phase,
    mk_tgsw_encrypt_core,
    public_key_core,
)
from tfhe_tpu.utils.sync import prime_sync

prime_sync()  # tunneled-TPU: honest AND fast dispatch mode (utils/sync.py)
from tfhe_tpu.keyswitch import keyswitch_key_gen
from tfhe_tpu.numeric import encode_message, rand_uniform_bool, rand_uniform_torus32
from tfhe_tpu.tlwe import tlwe_key_gen

TWO32 = float(2**32)


def dtot32_f64(x64):
    """float64 -> torus32, same trunc semantics as numeric.dtot32 but without
    the float32 narrowing (the reference samples noise in Julia Float64)."""
    return np.trunc(np.asarray(x64, np.float64) * TWO32).astype(np.int64).astype(
        np.int32
    )


def make_part_instrumented(rng, sk, shared, *, f64_noise=False, np_rng=None):
    """make_cloud_key_part, but returns the party's internal TLWE key too and
    optionally samples every bs-noise draw in float64 (injected through the
    *_core entry points used by the oracle-equivalence tests)."""
    params = sk.params
    l, n = params.bs_decomp_length, params.tlwe_polynomial_degree
    rng_tlwe, rng_pk, rng_bk, rng_ks = jax.random.split(rng, 4)
    tlwe_key = tlwe_key_gen(rng_tlwe, n, 1)
    alpha = params.bs_noise_stddev
    if not f64_noise:
        pk = mk.internals.public_key_gen(rng_pk, tlwe_key, alpha, shared.a)
        uni = mk.internals.mk_tgsw_encrypt(
            rng_bk, sk.key, alpha, tlwe_key, shared.a, pk,
            l, params.bs_log2_base, batch_shape=(params.lwe_size,),
        )
    else:
        def g64(shape):
            return jnp.asarray(dtot32_f64(np_rng.standard_normal(shape) * alpha))

        pk = public_key_core(tlwe_key, shared.a, g64((l, n)))
        keys = jax.random.split(rng_bk, 3)
        nlwe = params.lwe_size
        r = rand_uniform_bool(keys[0], (nlwe, n))
        c1 = rand_uniform_torus32(keys[1], (nlwe, l, n))
        f1 = rand_uniform_torus32(keys[2], (nlwe, l, n))
        uni = mk_tgsw_encrypt_core(
            sk.key, r, c1, f1,
            g64((nlwe, l, n)), g64((nlwe, l, n)), g64((nlwe, l, n)),
            g64((nlwe, l, n)),
            tlwe_key, shared.a, pk, l, params.bs_log2_base,
        )
    ks = keyswitch_key_gen(
        rng_ks, params.ks_noise_stddev, tlwe_key.reshape(-1), sk.key,
        params.ks_decomp_length, params.ks_log2_base,
    )
    return CloudKeyPart(params, pk, uni, ks), tlwe_key


def phase_err_stats(phase, want_bits, mu):
    """Signed phase error relative to the expected +-mu encoding."""
    expected = np.where(np.asarray(want_bits, bool), mu, -mu).astype(np.int64)
    err = ((np.asarray(phase).astype(np.int64) - expected + 2**31) & 0xFFFFFFFF) - 2**31
    fails = int(((phase > 0) != np.asarray(want_bits, bool)).sum())
    return float(err.std()) / TWO32, fails, err / TWO32


def main():
    parties = int(os.environ.get("MK_NOISE_PARTIES", "2"))
    batch = int(os.environ.get("MK_NOISE_BATCH", "512"))
    f64 = os.environ.get("MK_NOISE_F64", "0") == "1"
    seed = int(os.environ.get("MK_NOISE_SEED", "0"))
    if os.environ.get("MK_NOISE_TOY", "0") == "1":
        params = mk.mktfhe_parameters_toy(parties)  # CPU smoke-test mode
    else:
        params = {2: mk.mktfhe_parameters_2party,
                  4: mk.mktfhe_parameters_4party,
                  8: mk.mktfhe_parameters_8party}[parties]()
    N = params.tlwe_polynomial_degree
    mu = np.int64(encode_message(1, 8))
    np_rng = np.random.default_rng(1234 + seed)

    t0 = time.time()
    shared = mk.make_shared_key(jax.random.PRNGKey(100 + seed), params)
    sks, parts, tlwe_keys = [], [], []
    for p in range(parties):
        sk = tt.make_secret_key(jax.random.PRNGKey(200 + seed * 17 + p), params)
        part, tkey = make_part_instrumented(
            jax.random.PRNGKey(300 + seed * 17 + p), sk, shared,
            f64_noise=f64, np_rng=np_rng,
        )
        sks.append(sk)
        parts.append(part)
        tlwe_keys.append(np.asarray(tkey[0]))
    print(f"party keygen: {time.time() - t0:.1f}s (f64_noise={f64})", flush=True)

    # (1) uni-encryption noise check: e = c0 - s*c1 - m*g (torus units)
    from spec.oracle import gadget_values, negacyclic_mul

    ue0 = jax.tree.map(np.asarray, parts[0].key_uni_enc.cd)  # [n, 6, l, N]
    g = gadget_values(params.bs_decomp_length, params.bs_log2_base)
    errs = []
    skey = tlwe_keys[0]
    sk_bits = np.asarray(sks[0].key)
    for j in range(8):  # 8 key bits x l rows is plenty for a sigma estimate
        for ll in range(params.bs_decomp_length):
            mg = np.zeros(N, np.int64)
            mg[0] = np.int64(sk_bits[j]) * np.int64(g[ll])
            e = (ue0[j, 0, ll].astype(np.int64)
                 - negacyclic_mul(skey, ue0[j, 1, ll]).astype(np.int64) - mg)
            errs.append(((e + 2**31) & 0xFFFFFFFF) - 2**31)
    ue_sigma = float(np.concatenate(errs).std()) / TWO32
    print(f"uni-enc c0 noise sigma = {ue_sigma:.3e} "
          f"(preset bs_noise_stddev = {params.bs_noise_stddev:.3e})", flush=True)

    t0 = time.time()
    mck = make_mk_cloud_key(parts)
    print(f"expansion: {time.time() - t0:.1f}s "
          f"(baked T={mck.bootstrap_key.block})", flush=True)

    # (2) fresh encrypt + blind-rotate error growth vs live step count
    want = np.ones(batch, bool)  # NAND(x,y) with x=y=False -> True
    x = mk.mk_encrypt(jax.random.PRNGKey(7 + seed), sks, np.zeros(batch, bool))
    y = mk.mk_encrypt(jax.random.PRNGKey(8 + seed), sks, np.zeros(batch, bool))
    lin = mk.internals.mk_lwe_noiseless_trivial(
        jnp.int32(mu), params.lwe_size, parties, (batch,)) - x - y

    ext_keys = np.stack([k.reshape(-1) for k in tlwe_keys])  # [parties, N]
    steps_total = parties * params.lwe_size
    bs = mck.bootstrap_key

    from tfhe_tpu.numeric import decode_message as dec_msg
    bara_full = np.asarray(dec_msg(lin.a, 2 * N))  # [B, parties, n]
    barb = np.asarray(dec_msg(lin.b, 2 * N))

    results = {}
    for live in (steps_total // 8, steps_total // 4, steps_total // 2,
                 steps_total):
        mask = np.zeros((parties, params.lwe_size), np.int32)
        mask.reshape(-1)[:live] = 1  # party-major step order (rotation order)
        bara = bara_full * mask[None]
        # expected coefficient-0 of the const-mu testvector rotated by
        # -(barb - sum live bara*s): all-mu poly rotated by t has coeff0 = ±mu
        tot = (np.asarray(barb)[:, None]
               - (bara * sk_bits_all(sks)).sum(axis=(1, 2), keepdims=True)[..., 0]
               ) % (2 * N)
        exp_sign = np.where((tot[:, 0] % (2 * N)) < N, 1, -1)
        # bs passed as a jit ARGUMENT (a closure would capture the multi-GB
        # baked key as an XLA constant and stall lowering)
        u = jax.jit(mk_bootstrap_wo_keyswitch_masked, static_argnums=())(
            bs, jnp.int32(mu), jnp.asarray(bara), lin.b)
        phase = np.asarray(mk_lwe_phase(u, jnp.asarray(ext_keys)))
        sig, fails, _ = phase_err_stats(phase, exp_sign > 0, mu)
        results[f"rot_sigma_{live}steps"] = sig
        print(f"after {live:4d} live CMUX steps: phase sigma = {sig:.4f} "
              f"({fails}/{batch} sign flips)", flush=True)

    # (3) full NAND incl. keyswitch
    t0 = time.time()
    out = jax.jit(mk.mk_gate_nand)(mck, x, y)
    out = jax.block_until_ready(out)
    dt = time.time() - t0
    keys_all = jnp.stack([sk.key for sk in sks])
    phase = np.asarray(mk_lwe_phase(out, keys_all))
    sig, fails, err = phase_err_stats(phase, want, mu)
    results.update(
        parties=parties, batch=batch, f64_noise=f64, uni_enc_sigma=ue_sigma,
        out_sigma=sig, out_failures=fails,
        out_fail_rate=fails / batch, gate_time_s=dt,
    )
    print(f"full NAND output: sigma = {sig:.4f}, "
          f"failures = {fails}/{batch} ({100*fails/batch:.2f}%)", flush=True)
    pred = 2 * (1 - _phi(0.125 / sig))
    print(f"  (Gaussian tail at this sigma predicts {100*pred:.2f}%)", flush=True)
    print(json.dumps(results))


def sk_bits_all(sks):
    return np.stack([np.asarray(sk.key) for sk in sks])[None]  # [1,parties,n]


def mk_bootstrap_wo_keyswitch_masked(bs, mu, bara, b):
    """mk_bootstrap_wo_keyswitch but with externally supplied (masked) bara."""
    from tfhe_tpu.numeric import decode_message as dec_msg
    from tfhe_tpu.mk.internals import mk_blind_rotate_and_extract

    N = bs.polynomial_degree
    barb = dec_msg(b, N * 2)
    testvect = jnp.broadcast_to(jnp.asarray(mu, jnp.int32), b.shape + (N,))
    return mk_blind_rotate_and_extract(testvect, bs, barb, bara)


def _phi(z):
    from math import erf, sqrt

    return 0.5 * (1 + erf(z / sqrt(2)))


if __name__ == "__main__":
    main()
