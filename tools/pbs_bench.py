"""PBS LUT throughput at the PBS-retuned preset (tools/pbs_bench.py).

Measured round 3: 9,977 LUT4/s with 4096/4096 correct on
tfhe_parameters_128_pbs vs 6,989 on the reference geometry (bench_suite).
Run from the repo root on TPU: python tools/pbs_bench.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import tfhe_tpu as tt
from tfhe_tpu import pbs as pbs_mod
from tfhe_tpu.utils.sync import device_barrier, prime_sync
prime_sync()
for name, params in [("128_pbs", tt.tfhe_parameters_128_pbs())]:  # add ("128", tt.tfhe_parameters_128) to compare
    sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(jax.random.PRNGKey(7), params)
    jax.block_until_ready(ck.bootstrap_key.baked)
    B, S = 4096, 4
    msgs = jnp.arange(B) % S
    lut = jnp.asarray([2, 0, 3, 1], jnp.int32)
    px = pbs_mod.encrypt_pbs(jax.random.PRNGKey(12), sk, msgs, S)
    pb = jax.jit(pbs_mod.programmable_bootstrap, static_argnums=4)
    out = pb(ck.bootstrap_key, ck.keyswitch_key, lut, px, S)
    device_barrier(out.b)
    t0 = time.time()
    out = pb(ck.bootstrap_key, ck.keyswitch_key, lut, out, S)
    device_barrier(out.b)
    dt = time.time() - t0
    lut_np = np.asarray(lut)
    got = np.asarray(pbs_mod.decrypt_pbs(sk, out, S))
    want = lut_np[lut_np[np.asarray(msgs)]]
    print(f"{name}: {B/dt:.0f} LUT4/s, correct {int((got==want).sum())}/{B}", flush=True)
