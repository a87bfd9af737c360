"""On-chip batch-tile / DMA-slot sweep for the blind-rotate megakernels.

Round-2's floor analysis (tools/pipe_bench.py) identified MXU weight-load
amortization as the remaining dots gap and MORE ROWS PER TILE as the only
lever; this sweep measures the pipelined subtile size (TuningConfig.btp),
the shared-E-ring slot count (pslots), and the serial megakernel tile (btk)
at the current default preset. Each config gets a fresh jit wrapper (the
tile knobs are read at trace time, not jit keys).

Usage: python tools/tile_sweep.py  (repo root, on TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

import tfhe_tpu as tt
from tfhe_tpu import gates, tuning
from tfhe_tpu.utils.sync import device_barrier, prime_sync

prime_sync()
which = os.environ.get("TFHE_TPU_BENCH_PARAMS", "128fast")
params = {"128fast": tt.tfhe_parameters_128_fast,
          "128": tt.tfhe_parameters_128}[which]()
sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(
    jax.random.PRNGKey(123), params)
jax.block_until_ready(ck.bootstrap_key.baked)
print(f"keygen done ({which})", flush=True)

B = int(os.environ.get("TFHE_TPU_BENCH_BATCH", "4096"))
xs = jnp.arange(B) % 2 == 0
ys = jnp.arange(B) % 3 == 0
ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, ys)
want = ~(np.asarray(xs) & np.asarray(ys))

CONFIGS = [
    dict(pipe="1", btp=256, pslots=6),   # current default
    dict(pipe="1", btp=512, pslots=6),
    dict(pipe="1", btp=1024, pslots=6),
    dict(pipe="1", btp=256, pslots=9),
    dict(pipe="1", btp=512, pslots=9),
    dict(pipe="0", btk=256),
    dict(pipe="0", btk=512),
    dict(pipe="0", btk=1024),
]

for cfg in CONFIGS:
    with tuning.override(**cfg):
        nand = jax.jit(gates.gate_nand)  # fresh wrapper: fresh trace
        try:
            out = nand(ck, ct_x, ct_y)
            device_barrier(out.b)
            t0 = time.time()
            out = nand(ck, out, ct_y)
            device_barrier(out.b)
            dt = time.time() - t0
            ok = int((np.asarray(tt.decrypt(sk, out))
                      == ~(want & np.asarray(ys))).sum())
            print(f"{cfg}: {B/dt:7.0f} gates/s  ({dt*1e3:.0f} ms, "
                  f"{ok}/{B} correct)", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives OOM configs
            print(f"{cfg}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
