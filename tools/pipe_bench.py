"""Microbench: serial vs pipelined blind-rotation megakernel on the chip.

Synthetic key/acc data at the 128-bit production shape (n=1024, k1=2, l=3,
b=7, t=128, depth 2, 630 steps). Timing follows CLAUDE.md's tunnel rules:
prime_sync() first, device_barrier around timed regions. The e_all operand is
a real [630, R*P*T, K*4*T] HBM array (NOT a scan-constant — those add phantom
per-step overhead, see memory notes).

Env: PIPE_BATCH (4096), PIPE_ITERS (3), PIPE_MODE (both|serial|pipe),
TFHE_TPU_PIPE_ABLATE=rot to skip the other-subtile rotate thunks in the
pipelined kernel (wrong results, timing only).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu.ops.karatsuba import karatsuba_plan
from tfhe_tpu.ops.pallas_cmux import (
    blind_rotate_pallas_karatsuba,
    blind_rotate_pallas_pipelined,
)
from tfhe_tpu.tgsw import decomp_offset
from tfhe_tpu.utils.sync import device_barrier, prime_sync


def main():
    prime_sync()
    # PIPE_GEOM: 128 (reference geometry, default) | fast (the shipped
    # k=4 N=256 l=2 b=8 preset geometry)
    geom = os.environ.get("PIPE_GEOM", "128")
    if geom == "fast":
        n, k1, l, b, t, steps = 256, 5, 2, 8, 128, 630
    else:
        n, k1, l, b, t, steps = 1024, 2, 3, 7, 128, 630
    depth = int(os.environ.get("PIPE_DEPTH", "2"))
    batch = int(os.environ.get("PIPE_BATCH", "4096"))
    iters = int(os.environ.get("PIPE_ITERS", "3"))
    mode = os.environ.get("PIPE_MODE", "both")
    plan = karatsuba_plan(n // t, depth, b)
    p = k1 * l
    rows = plan.total_rows * p * t
    cols = k1 * 4 * t

    key = jax.random.PRNGKey(0)
    # zeros: randint's int32 intermediate would transiently need 4x the 8.9GB
    # key; MXU/DMA timing is data-independent so zeros time identically
    e_all = jnp.zeros((steps, rows, cols), jnp.int8)
    acc = jax.random.randint(key, (batch, k1, n), -(2**31), 2**31 - 1,
                             jnp.int32)
    bara = jax.random.randint(key, (steps, batch), 0, 2 * n, jnp.int32)
    jax.block_until_ready((e_all, acc, bara))
    kw = dict(n=n, k1=k1, l=l, b=b, t=t, plan=plan,
              offset=decomp_offset(l, b))

    def run(fn, label):
        out = fn(acc, e_all, bara, **kw)
        device_barrier(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(out, e_all, bara, **kw)
        device_barrier(out)
        dt = (time.time() - t0) / iters
        print(f"{label}: {dt*1e3:.1f} ms/rotation = {dt/steps*1e6:.1f} us/step"
              f" -> {batch/ (dt + 0.0):.0f} rot/s", flush=True)
        return dt

    if mode in ("both", "serial"):
        run(blind_rotate_pallas_karatsuba, "serial megakernel")
    if mode in ("both", "pipe"):
        run(blind_rotate_pallas_pipelined, "pipelined")


if __name__ == "__main__":
    main()
