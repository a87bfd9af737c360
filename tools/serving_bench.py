"""Serving-tier sweep: baked vs compact keys across batch sizes.

Produces the keys-per-chip vs latency/throughput table in docs/serving.md
(round-3 verdict item 3). For each preset and key form, measures the
chained per-gate NAND latency at batches 1..4096 on the current backend
(run on the real chip; CPU works for plumbing with TFHE_TPU_SERVE_SMALL=1).

Usage:
  python tools/serving_bench.py                # 128fast + 80 presets
  TFHE_TPU_SERVE_PRESETS=128fast python ...    # subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import tfhe_tpu as tt
    from tfhe_tpu import gates, tuning
    from tfhe_tpu.utils.sync import device_barrier, prime_sync

    prime_sync()
    small = bool(int(os.environ.get("TFHE_TPU_SERVE_SMALL", "0")))
    if jax.default_backend() != "tpu" and not small:
        log("not on TPU; forcing TFHE_TPU_SERVE_SMALL=1")
        small = True
    names = os.environ.get("TFHE_TPU_SERVE_PRESETS", "128fast,80").split(",")
    presets = {"128fast": tt.tfhe_parameters_128_fast,
               "128fast8": tt.tfhe_parameters_128_fast8,
               "80": tt.tfhe_parameters_80,
               "128": tt.tfhe_parameters_128,
               "toy": tt.tfhe_parameters_toy}
    batches = (1, 2) if small else (1, 8, 64, 512, 4096)
    chain = 2 if small else 8

    for name in names:
        params = presets["toy" if small else name]()
        # fast8 is compact-by-design: the M=1 baked form is ~13 GB
        # (params.py docstring) and cannot coexist with bake temporaries
        # on a 16 GB chip
        forms = ((("compact", 0),) if name == "128fast8"
                 else (("baked", -1), ("compact", 0)))
        for form, budget in forms:
            with tuning.override(bs_bake_budget=budget):
                # fresh closure: jax's jit cache is keyed by function
                # identity + avals, NOT by TuningConfig — reusing the same
                # jitted make_key_pair would silently return the other form
                sk, ck = jax.jit(
                    lambda r, p=params: tt.make_key_pair(r, p))(
                        jax.random.PRNGKey(123))
            jax.block_until_ready(ck.bootstrap_key.baked)
            key_mb = ck.bootstrap_key.baked.size / 2**20
            ks_mb = ck.keyswitch_key.table_limbs.size / 2**20
            log(f"{name}/{form}: bk {key_mb:.1f} MB + ks {ks_mb:.1f} MB")

            @jax.jit
            def chain_fn(ck_, x, y):
                def body(c, _):
                    return gates.gate_nand(ck_, c, y), None
                return jax.lax.scan(body, x, None, length=chain)[0]

            for b_sz in batches:
                bx = tt.encrypt(jax.random.PRNGKey(1), sk,
                                jnp.arange(b_sz) % 2 == 0)
                by = tt.encrypt(jax.random.PRNGKey(2), sk,
                                jnp.arange(b_sz) % 3 == 0)
                out = chain_fn(ck, bx, by)
                device_barrier(out)
                t0 = time.time()
                out = chain_fn(ck, out, by)
                device_barrier(out)
                dt = (time.time() - t0) / chain
                print(json.dumps({
                    "preset": name, "form": form, "batch": b_sz,
                    "key_mb": round(key_mb + ks_mb, 1),
                    "ms_per_layer": round(dt * 1e3, 2),
                    "gates_per_sec": round(b_sz / dt, 1),
                }), flush=True)
            del sk, ck


if __name__ == "__main__":
    main()
