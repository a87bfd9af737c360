"""Per-step microbenchmarks for the CMUX kernels on the real chip.

Times one blind-rotation step (the whole gate cost is n_lwe * step) under
different kernels/knobs, with a data-dependent scan so steps can't be CSE'd:

  python tools/kernel_microbench.py [reps]

Env: MB_BATCH (4096), MB_DEPTHS ("2,3"), MB_BTKS ("128,256").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tfhe_tpu.bootstrap as bs
from tfhe_tpu.ops.pallas_cmux import (
    cmux_step_pallas,
    cmux_step_pallas_karatsuba,
)
from tfhe_tpu.ops.conv import split_small_limbs
from tfhe_tpu.tgsw import decomp_offset
from tfhe_tpu.utils.sync import prime_sync

prime_sync()  # tunneled-TPU: honest AND fast dispatch mode (utils/sync.py)


def time_scan(step_fn, acc0, bara, reps):
    @jax.jit
    def run(acc, bara):
        def body(a, i):
            return step_fn(a, bara + i), None

        out, _ = jax.lax.scan(body, acc, jnp.arange(reps, dtype=jnp.int32))
        return out

    out = jax.block_until_ready(run(acc0, bara))  # compile
    t0 = time.time()
    out = jax.block_until_ready(run(acc0, bara))
    return (time.time() - t0) / reps


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(os.environ.get("MB_BATCH", "4096"))
    depths = [int(x) for x in os.environ.get("MB_DEPTHS", "2,3").split(",")]
    btks = [int(x) for x in os.environ.get("MB_BTKS", "128,256").split(",")]
    n, l, b, t, k1 = 1024, 3, 7, 128, 2
    print(f"backend={jax.default_backend()} batch={batch} reps={reps}",
          flush=True)

    rng = np.random.default_rng(0)
    gsw = jnp.asarray(
        rng.integers(-(2**31), 2**31, (1, l, k1, k1, n), dtype=np.int64)
        .astype(np.int32))
    acc0 = jnp.asarray(
        rng.integers(-(2**31), 2**31, (batch, k1, n), dtype=np.int64)
        .astype(np.int32))
    bara = jnp.asarray(rng.integers(0, 2 * n, batch).astype(np.int32))
    offset = decomp_offset(l, b)

    # dense round-1 two-kernel step
    bk0 = bs.bootstrap_key_from_raw(gsw, l, b, block=t, depth=0)
    e0 = bk0.baked[0]
    _, d_shifts = split_small_limbs(np.zeros((1,), np.int32), b - 1)

    def dense_step(a, bara_i):
        return cmux_step_pallas(
            a, e0, bara_i, n=n, k1=k1, l=l, b=b, t=t,
            s_limbs=len(d_shifts), d_shifts=tuple(d_shifts), offset=offset)

    dt = time_scan(dense_step, acc0, bara, reps)
    print(f"dense (round-1, 64 sb-MACs):      {dt*1e3:7.3f} ms/step "
          f"-> {1/(630*dt):6.0f} gates/s-equiv", flush=True)

    for depth in depths:
        bkk = bs.bootstrap_key_from_raw(gsw, l, b, block=t, depth=depth)
        ek = bkk.baked[0]
        for btk in btks:
            def kara_step(a, bara_i, _ek=ek, _plan=bkk.plan, _btk=btk):
                return cmux_step_pallas_karatsuba(
                    a, _ek, bara_i, n=n, k1=k1, l=l, b=b, t=t,
                    plan=_plan, offset=offset, btk=_btk)

            dt = time_scan(kara_step, acc0, bara, reps)
            sb = bkk.plan.macs_superblocks
            print(f"karatsuba d={depth} ({sb:2d} sb) btk={btk}: "
                  f"{dt*1e3:7.3f} ms/step -> {1/(630*dt):6.0f} gates/s-equiv",
                  flush=True)


if __name__ == "__main__" and os.environ.get("MB_ABLATE") != "1":
    main()


def ablation(reps=64):
    """Component time split via timing-only kernel variants (NOT bit-exact)."""
    batch = int(os.environ.get("MB_BATCH", "4096"))
    n, l, b, t, k1 = 1024, 3, 7, 128, 2
    rng = np.random.default_rng(0)
    gsw = jnp.asarray(
        rng.integers(-(2**31), 2**31, (1, l, k1, k1, n), dtype=np.int64)
        .astype(np.int32))
    acc0 = jnp.asarray(
        rng.integers(-(2**31), 2**31, (batch, k1, n), dtype=np.int64)
        .astype(np.int32))
    bara = jnp.asarray(rng.integers(0, 2 * n, batch).astype(np.int32))
    offset = decomp_offset(l, b)
    depth = int(os.environ.get("MB_DEPTH", "2"))
    btk = int(os.environ.get("MB_BTK", "128"))
    bkk = bs.bootstrap_key_from_raw(gsw, l, b, block=t, depth=depth)
    ek = bkk.baked[0]
    for ab in ((), ("rot", "dots"), ("rot", "dots", "io")):
        def kara_step(a, bara_i, _ab=tuple(ab)):
            return cmux_step_pallas_karatsuba(
                a, ek, bara_i, n=n, k1=k1, l=l, b=b, t=t,
                plan=bkk.plan, offset=offset, btk=btk, ablate=_ab)
        dt = time_scan(kara_step, acc0, bara, reps)
        print(f"d={depth} btk={btk} ablate={ab or 'none'}: {dt*1e3:7.3f} ms/step",
              flush=True)


if os.environ.get("MB_ABLATE") == "1" and __name__ == "__main__":
    ablation()
