"""Production multi-key NAND throughput on the real chip.

Usage: python tools/mk_bench.py [parties] [batch] [iters]
Env: MK_BENCH_SEGMENTS (default 1).
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
from tfhe_tpu.utils.sync import device_barrier, prime_sync


def main():
    prime_sync()  # tunneled-TPU: honest AND fast dispatch mode (utils/sync.py)
    parties = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    segments = int(os.environ.get("MK_BENCH_SEGMENTS", "1"))
    # MK_BENCH_LOWNOISE=1 benches the stricter 2-party preset
    # (mktfhe_parameters_2party_lownoise: failure <1e-18 vs ~1.5%/gate)
    lownoise = os.environ.get("MK_BENCH_LOWNOISE") == "1"
    params = {2: (mk.mktfhe_parameters_2party_lownoise if lownoise
                  else mk.mktfhe_parameters_2party),
              4: mk.mktfhe_parameters_4party,
              8: mk.mktfhe_parameters_8party}[parties]()
    print(f"mk bench: parties={parties} batch={batch} "
          f"backend={jax.default_backend()}", flush=True)

    t0 = time.time()
    shared = mk.make_shared_key(jax.random.PRNGKey(100), params)
    sks, parts = [], []
    for p in range(parties):
        sk = tt.make_secret_key(jax.random.PRNGKey(200 + p), params)
        sks.append(sk)
        parts.append(mk.make_cloud_key_part(
            jax.random.PRNGKey(300 + p), sk, shared))
    print(f"party keygen: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    mck = mk.make_mk_cloud_key(parts)
    jax.block_until_ready(mck.bootstrap_key.limbs)
    key_mb = sum(x.nbytes for x in jax.tree_util.tree_leaves(
        mck.bootstrap_key.limbs)) / 2**20
    print(f"expansion: {time.time()-t0:.1f}s "
          f"(block={mck.bootstrap_key.block}, "
          f"sparse={mck.bootstrap_key.sparse}, key={key_mb:.0f} MB)",
          flush=True)

    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.integers(0, 2, batch).astype(bool))
    ys = jnp.asarray(rng.integers(0, 2, batch).astype(bool))
    x = mk.mk_encrypt(jax.random.PRNGKey(7), sks, xs)
    y = mk.mk_encrypt(jax.random.PRNGKey(8), sks, ys)

    if segments <= 1:
        _nand = jax.jit(mk.mk_gate_nand)

        def nand(a, b):
            return _nand(mck, a, b)
    else:
        mu = tt.numeric.encode_message(1, 8)

        def nand(a, b):
            lin = mk.internals.mk_lwe_noiseless_trivial(
                mu, params.lwe_size, parties, a.b.shape) - a - b
            return mk.internals.mk_bootstrap(
                mck.bootstrap_key, mck.keyswitch_keys, mu, lin, segments)

    t0 = time.time()
    out = nand(x, y)
    device_barrier(out)
    print(f"first call (compile+run): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        out = nand(out, y)  # chain to defeat caching
        device_barrier(out)
    dt = (time.time() - t0) / iters
    rate = batch / dt
    want = ~(np.asarray(xs) & np.asarray(ys))
    for _ in range(iters):
        want = ~(want & np.asarray(ys))
    got = np.asarray(mk.mk_decrypt(sks, out))
    correct = int((got == want).sum())
    print(f"{iters} iters x {batch} gates in {dt*iters:.3f}s -> "
          f"{rate:.0f} gates/s; correctness {correct}/{batch}", flush=True)
    print(json.dumps({
        "metric": f"mk{parties}_nand_throughput", "value": round(rate, 1),
        "unit": "gates/s", "correct": correct, "batch": batch,
    }))

    # MK_BENCH_STAGES=1: per-stage budget (rotation+extract vs keyswitch),
    # for the STATUS stage table. Costs one extra compile of the rotation.
    if os.environ.get("MK_BENCH_STAGES") == "1":
        mu = tt.numeric.encode_message(1, 8)
        lin = mk.internals.mk_lwe_noiseless_trivial(
            mu, params.lwe_size, parties, x.b.shape) - x - y
        wo = jax.jit(lambda bk_, s: mk.internals.mk_bootstrap_wo_keyswitch(
            bk_, mu, s))
        u = wo(mck.bootstrap_key, lin)
        device_barrier(u)
        t0 = time.time()
        u = wo(mck.bootstrap_key, lin)
        device_barrier(u)
        t_rot = time.time() - t0
        ksw = jax.jit(mk.internals.mk_keyswitch)
        v = ksw(mck.keyswitch_keys, u)
        device_barrier(v)
        t0 = time.time()
        v = ksw(mck.keyswitch_keys, u)
        device_barrier(v)
        t_ks = time.time() - t0
        print(json.dumps({
            "metric": f"mk{parties}_stage_budget", "batch": batch,
            "rotation_extract_ms": round(t_rot * 1e3, 1),
            "keyswitch_ms": round(t_ks * 1e3, 1),
            "gate_ms": round(dt * 1e3, 1),
        }))


if __name__ == "__main__":
    main()
