"""Probe the tunneled-TPU dispatch-degradation quirk.

Any device-to-host read (int(scalar), np.asarray of a device array)
permanently switches this runtime into synchronous dispatch: every later
jitted call pays a ~25 ms tunnel round-trip (vs ~0.07 ms). Run with an
argument from {none, int_of_scalar, d2h_array} to reproduce; benchmarks must
therefore defer ALL correctness checks until after their timing loops.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def timeit(f, *a, reps=30):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(f(*a))
    return (time.time() - t0) / reps

x8 = jnp.asarray(np.random.default_rng(0).integers(-128, 128, (25, 5, 2048)).astype(np.int8))

@jax.jit
def shift(x):
    return (x.astype(jnp.int32) << 8) + x.astype(jnp.int32)

def probe(tag):
    print(f"{tag}: {timeit(shift, x8)*1e3:.3f} ms", flush=True)

probe("baseline")
mode = sys.argv[1] if len(sys.argv) > 1 else "int_of_scalar"
if mode == "int_of_scalar":
    int(jnp.int32(7))
elif mode == "d2h_array":
    np.asarray(shift(x8))
probe(f"after {mode}")
