"""Scaling-efficiency harness: gates/s vs device count (BASELINE >= 80%).

Measures batched-NAND throughput on meshes of 1, 2, 4, ... N devices (weak
scaling: fixed per-device batch) and prints efficiency relative to the
1-device rate. On a real pod slice this is the >= 80%-linear check from
BASELINE.md; blind rotation is embarrassingly data-parallel, so the only
losses are the all_gather/psum in the TP keyswitch.

NOTE on environments: with XLA's virtual CPU devices
(--xla_force_host_platform_device_count) all "devices" share the host's
cores, so absolute efficiency numbers are meaningless there — the harness
still validates the code path end to end and is the tool to run on real
hardware. Multi-host: start one process per host with TFHE_COORD /
TFHE_NPROC / TFHE_PID set (tfhe_tpu.parallel.multihost.initialize is called
automatically when TFHE_NPROC is present).

Usage: python tools/scaling_bench.py [per_device_batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "TFHE_NPROC" in os.environ:
        import jax

        from tfhe_tpu.parallel import multihost

        multihost.initialize()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_tpu as tt
    from tfhe_tpu import parallel
    from tfhe_tpu.utils.sync import prime_sync

    prime_sync()  # tunneled-TPU: honest AND fast dispatch mode (utils/sync.py)
    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    params = tt.tfhe_parameters_toy() if jax.default_backend() == "cpu" \
        else tt.tfhe_parameters_128()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), params)

    n_dev = jax.device_count()
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    results = []
    for d in sizes:
        mesh = parallel.make_mesh(d, 1)
        ck_s = parallel.shard_cloud_key(ck, mesh)
        nand = parallel.make_gate_nand_sharded(mesh, params)
        B = per_dev * d
        bits = jnp.arange(B) % 2 == 0
        x = parallel.shard_batch(
            tt.encrypt(jax.random.PRNGKey(1), sk, bits), mesh)
        y = parallel.shard_batch(
            tt.encrypt(jax.random.PRNGKey(2), sk, ~bits), mesh)
        run = jax.jit(nand)
        out = jax.block_until_ready(run(ck_s, x, y))  # compile
        t0 = time.time()
        out = jax.block_until_ready(run(ck_s, x, y))
        dt = time.time() - t0
        rate = B / dt
        results.append((d, rate))
        base = results[0][1]
        eff = rate / (base * d)
        print(f"devices={d:2d} batch={B:5d}: {rate:9.1f} gates/s "
              f"(efficiency {100*eff:5.1f}%)", flush=True)
        ok = np.asarray(tt.decrypt(sk, jax.device_get(out)))
        want = ~(np.asarray(bits) & ~np.asarray(bits))
        assert (ok == want).all()

    base = results[0][1]
    print(json.dumps({
        "metric": "scaling_efficiency",
        "per_device_batch": per_dev,
        "rates": {str(d): r for d, r in results},
        "efficiency_at_max": results[-1][1] / (base * results[-1][0]),
    }))


if __name__ == "__main__":
    main()
