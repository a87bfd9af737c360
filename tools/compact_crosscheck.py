"""On-chip bitwise validation of the COMPACT megakernel (in-kernel Toeplitz
expansion, ops/pallas_cmux.py:blind_rotate_pallas_compact).

The kernel's correctness on hardware depends on Mosaic's strided-roll
per-row rotate semantics and the cross-block wrap assumption — interpret
mode cannot see a miscompile there. This runs the compiled kernel against
the XLA prepared-limb reference path (TFHE_TPU_DEBUG machinery,
tfhe_tpu/debug.py) on the real chip and bit-compares every output word,
then decrypt-checks a full batch.

Usage: python tools/compact_crosscheck.py  (repo root, on TPU)
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
preset = os.environ.get("TFHE_TPU_CC_PRESET", "128fast")
params = {"128fast": tt.tfhe_parameters_128_fast,
          # the one compact-ONLY preset: exercises the M=1 depth-0
          # single-leaf kernel path (strided-roll expansion with no
          # Karatsuba recombine), which interpret mode cannot validate
          "128fast8": tt.tfhe_parameters_128_fast8,
          "80": tt.tfhe_parameters_80,
          "128": tt.tfhe_parameters_128}[preset]()

with tuning.override(bs_bake_budget=0):
    sk, ck = jax.jit(lambda r: tt.make_key_pair(r, params))(
        jax.random.PRNGKey(123))
jax.block_until_ready(ck.bootstrap_key.baked)
assert ck.bootstrap_key.compact, "keygen did not produce a compact key"
print(f"compact keygen done ({preset}); bk "
      f"{ck.bootstrap_key.baked.size / 2**20:.1f} MB", flush=True)

B = int(os.environ.get("TFHE_TPU_CC_BATCH", "512"))
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.integers(0, 2, B).astype(bool))
ys = jnp.asarray(rng.integers(0, 2, B).astype(bool))
ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, ys)

# Engine-vs-XLA crosscheck, HOST-side compare (the axon tunnel backend has
# no host-callback support, so TFHE_TPU_DEBUG's on-device jax.debug.callback
# cannot run here — same comparison, same operands, compared in numpy).
with tuning.override(cmux="pallas"):
    out = jax.jit(gates.gate_nand)(ck, ct_x, ct_y)
    device_barrier(out.b)
    a_fast, b_fast = np.asarray(out.a), np.asarray(out.b)
with tuning.override(cmux="xla"):
    out_ref = jax.jit(gates.gate_nand)(ck, ct_x, ct_y)
    device_barrier(out_ref.b)
    a_ref, b_ref = np.asarray(out_ref.a), np.asarray(out_ref.b)
bad = int((a_fast != a_ref).sum()) + int((b_fast != b_ref).sum())
if bad:
    rows = np.where((a_fast != a_ref).any(axis=-1) | (b_fast != b_ref))[0]
    print(f"CROSSCHECK FAILED: {bad} int32 words differ; rows {rows[:30]}",
          flush=True)
    sys.exit(1)
print(f"crosscheck passed: compact megakernel == XLA path, "
      f"batch {B}, every int32 word equal", flush=True)

got = np.asarray(tt.decrypt(sk, out))
want = ~(np.asarray(xs) & np.asarray(ys))
print(f"decrypt: {int((got == want).sum())}/{B} correct", flush=True)

# quick timing of the compact kernel itself (full sweep: serving_bench.py)
for b_sz in (1, 4096):
    bx = tt.encrypt(jax.random.PRNGKey(3), sk, jnp.arange(b_sz) % 2 == 0)
    by = tt.encrypt(jax.random.PRNGKey(4), sk, jnp.arange(b_sz) % 3 == 0)
    nand = jax.jit(gates.gate_nand)
    o = nand(ck, bx, by)
    device_barrier(o.b)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        o = nand(ck, o, by)
    device_barrier(o.b)
    dt = (time.time() - t0) / reps
    print(f"batch {b_sz}: {dt * 1e3:.1f} ms/gate-layer = "
          f"{b_sz / dt:.0f} gates/s", flush=True)
