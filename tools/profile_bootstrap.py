"""Profile one batched gate bootstrap: jax.profiler trace + roofline report.

Usage: python tools/profile_bootstrap.py [batch] [trace_dir]
Writes a TensorBoard/XProf trace and prints the analytic roofline versus the
measured wall time. On CPU it still runs (tiny params, no meaningful
ceilings). Env: PROFILE_PARAMS=128|80 (default 128).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tfhe_tpu as tt
from tfhe_tpu import gates
from tfhe_tpu.utils.profiling import bootstrap_roofline, trace
from tfhe_tpu.utils.sync import device_barrier, prime_sync


def main():
    prime_sync()
    on_tpu = jax.default_backend() == "tpu"
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (4096 if on_tpu else 8)
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tfhe_tpu_trace"
    which = os.environ.get("PROFILE_PARAMS", "128")
    params = {"128": tt.tfhe_parameters_128, "80": tt.tfhe_parameters_80,
              "toy": tt.tfhe_parameters_toy}[which]()
    if not on_tpu:
        params = tt.tfhe_parameters_toy()

    sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(123), params)
    jax.block_until_ready(ck.bootstrap_key.baked)

    x = tt.encrypt(jax.random.PRNGKey(1), sk, jnp.arange(batch) % 2 == 0)
    y = tt.encrypt(jax.random.PRNGKey(2), sk, jnp.arange(batch) % 3 == 0)
    nand = jax.jit(gates.gate_nand)
    out = nand(ck, x, y)
    device_barrier(out)

    t0 = time.time()
    with trace(trace_dir):
        out = nand(ck, out, y)
        device_barrier(out)
    dt = time.time() - t0
    print(f"trace written to {trace_dir}", flush=True)

    rl = bootstrap_roofline(
        params, batch, depth=ck.bootstrap_key.depth or 2,
        block=ck.bootstrap_key.block)
    util = rl.utilization(dt)
    print(f"measured: {dt*1e3:.1f} ms for {batch} gates "
          f"({batch/dt:.0f} gates/s)")
    print(f"byte-MACs: {rl.byte_macs/1e9:.1f} G  "
          f"(MXU floor {rl.mxu_floor_s*1e3:.1f} ms, "
          f"util {util['mxu']*100:.0f}%)")
    print(f"HBM bytes: {rl.hbm_bytes/1e9:.1f} GB  "
          f"(BW floor {rl.hbm_floor_s*1e3:.1f} ms, "
          f"util {util['hbm']*100:.0f}%)")
    print(f"VPU elems: {rl.vpu_elems/1e9:.1f} G")


if __name__ == "__main__":
    main()
