"""Is block_until_ready honest on this runtime? Time a ~1s matmul three ways."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

x = jnp.asarray(np.random.default_rng(0).standard_normal((8192, 8192)).astype(np.float32))
@jax.jit
def f(x):
    for _ in range(40):  # ~40 x 1.1 TFLOP = heavy
        x = jnp.tanh(x @ x) 
    return x
y = f(x); jax.block_until_ready(y)  # compile+run
print("compiled", flush=True)

for i in range(3):
    t0 = time.time()
    y = f(y)
    t1 = time.time()
    jax.block_until_ready(y)
    t2 = time.time()
    z = np.asarray(y[0, :2])
    t3 = time.time()
    print(f"iter {i}: dispatch {t1-t0:.3f}s block {t2-t1:.3f}s d2h {t3-t2:.3f}s", flush=True)
