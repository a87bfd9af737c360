"""On-chip bitwise crosscheck of the blind-rotate engines (pipelined vs
serial megakernel vs XLA) at a given preset — isolates compiled-kernel or
DMA-race bugs that interpret-mode differential tests cannot see.

Usage: python tools/engine_crosscheck.py  (run from the repo root, on TPU)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import tfhe_tpu as tt
from tfhe_tpu import gates
from tfhe_tpu.utils.sync import device_barrier, prime_sync
from tfhe_tpu import tuning

prime_sync()
params = tt.tfhe_parameters_128_fast()
sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(jax.random.PRNGKey(123), params)
jax.block_until_ready(ck.bootstrap_key.baked)
print("keygen done", flush=True)

B = 4096
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.integers(0, 2, B).astype(bool))
ys = jnp.asarray(rng.integers(0, 2, B).astype(bool))
ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, ys)

def run(**kw):
    with tuning.override(**kw):
        out = jax.jit(gates.gate_nand)(ck, ct_x, ct_y)
        device_barrier(out.b)
        return np.asarray(out.a), np.asarray(out.b)

a_pipe, b_pipe = run(pipe="1")
print("pipe done", flush=True)
a_ser, b_ser = run(pipe="0")
print("serial done", flush=True)
same = np.array_equal(a_pipe, a_ser) and np.array_equal(b_pipe, b_ser)
print("pipelined == serial:", same, flush=True)
if not same:
    bad = np.where((a_pipe != a_ser).any(axis=-1) | (b_pipe != b_ser))[0]
    print("mismatching rows:", bad[:50], "count", len(bad), flush=True)

# XLA path on chip at a smaller batch for time
Bs = 512
cx = tt.LweSample(ct_x.a[:Bs], ct_x.b[:Bs], ct_x.cv[:Bs])
cy = tt.LweSample(ct_y.a[:Bs], ct_y.b[:Bs], ct_y.cv[:Bs])
with tuning.override(pipe="0"):
    out_ser = jax.jit(gates.gate_nand)(ck, cx, cy)
    device_barrier(out_ser.b)
a_s, b_s = np.asarray(out_ser.a), np.asarray(out_ser.b)
with tuning.override(cmux="xla"):
    out_xla = jax.jit(gates.gate_nand)(ck, cx, cy)
    device_barrier(out_xla.b)
print("serial == xla (512 rows):",
      np.array_equal(a_s, np.asarray(out_xla.a)) and
      np.array_equal(b_s, np.asarray(out_xla.b)), flush=True)
if not (np.array_equal(a_s, np.asarray(out_xla.a))):
    bad = np.where((a_s != np.asarray(out_xla.a)).any(axis=-1))[0]
    print("serial-vs-xla mismatch rows:", bad[:50], "count", len(bad), flush=True)

# decrypt correctness of each engine
want = ~(np.asarray(xs) & np.asarray(ys))
for tag, (aa, bb) in [("pipe", (a_pipe, b_pipe)), ("serial", (a_ser, b_ser))]:
    got = np.asarray(tt.decrypt(sk, tt.LweSample(jnp.asarray(aa), jnp.asarray(bb), ct_x.cv)))
    nbad = int((got != want).sum())
    print(f"{tag}: {B-nbad}/{B} correct; bad rows {np.where(got!=want)[0][:30]}", flush=True)
