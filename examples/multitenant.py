"""Multi-tenant serving: many tenants' keys resident on one chip.

The baked bootstrap key is the throughput form — T=128x the prepared
bytes (6.2 GB at `tfhe_parameters_128_fast`), i.e. ONE tenant per 16 GB
chip. The COMPACT form (TuningConfig.bs_bake_budget) keeps each tenant's
key as prepared limbs (~65 MB at 128_fast — ~90 tenants/chip alongside a
working set) and expands each blind-rotation step's Toeplitz rows on the
fly; at batch 1 the baked path is key-streaming-bound anyway, so the
latency cost is small (measured table: docs/serving.md).

The reference has no serving tier at all; the analogous trade is its
pre-transformed key (src/bootstrap.jl:12) vs re-transforming per use.

Usage: python examples/multitenant.py [--production]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import tfhe_tpu as tt
    from tfhe_tpu import gates, tuning

    production = "--production" in sys.argv
    params = (tt.tfhe_parameters_128_fast() if production
              else tt.tfhe_parameters_toy())
    tenants = 4 if production else 3

    # --- each tenant generates a key pair; the server keeps the compact
    # evaluation key resident (bs_bake_budget=0 forces the prepared form)
    keys = []
    with tuning.override(bs_bake_budget=0):
        for i in range(tenants):
            sk, ck = tt.make_key_pair(jax.random.PRNGKey(1000 + i), params)
            keys.append((sk, ck))
    bk = keys[0][1].bootstrap_key
    assert bk.compact
    key_bytes = bk.baked.size  # int8
    ks_bytes = keys[0][1].keyswitch_key.table_limbs.size
    per_tenant = key_bytes + ks_bytes
    hbm = 16 * 2**30
    print(f"compact evaluation key: {key_bytes / 2**20:.1f} MB bootstrap "
          f"+ {ks_bytes / 2**20:.1f} MB keyswitch per tenant")
    print(f"-> ~{int(hbm * 0.75 / per_tenant)} tenants per 16 GB chip "
          f"(75% budget; the BAKED form fits ~1)")

    # --- serve one gate per tenant (each under its own key) ---
    nand = jax.jit(gates.gate_nand)
    for i, (sk, ck) in enumerate(keys):
        bits_x = jnp.asarray([True, False])
        bits_y = jnp.asarray([True, True])
        cx = tt.encrypt(jax.random.PRNGKey(2 * i), sk, bits_x)
        cy = tt.encrypt(jax.random.PRNGKey(2 * i + 1), sk, bits_y)
        t0 = time.time()
        out = nand(ck, cx, cy)
        jax.block_until_ready(out.b)
        dec = np.asarray(tt.decrypt(sk, out))
        want = ~(np.asarray(bits_x) & np.asarray(bits_y))
        status = "ok" if (dec == want).all() else "WRONG"
        print(f"tenant {i}: NAND {dec.tolist()} [{status}] "
              f"({(time.time() - t0) * 1e3:.0f} ms incl. compile)")
        assert (dec == want).all()

    print("multi-tenant serving round-trip: OK")


if __name__ == "__main__":
    main()
