import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

x = jnp.asarray(np.random.default_rng(0).standard_normal((8192, 8192)).astype(np.float32))
def f(x):
    for _ in range(40):
        x = jnp.tanh(x @ x)
    return x
t0 = time.time()
compiled = jax.jit(f).lower(x).compile()
print(f"AOT compile: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
y = x
for i in range(3):
    y = compiled(y)
jax.block_until_ready(y)
t1 = time.time()
z = np.asarray(y[0, :1])
t2 = time.time()
print(f"3 chained: block-at {t1-t0:.3f}s  honest(after d2h) {t2-t0:.3f}s -> {(t2-t0)/3:.3f}s/call", flush=True)
# now in sync mode: per-call
for i in range(2):
    t0 = time.time()
    y = compiled(y)
    jax.block_until_ready(y)
    print(f"sync call: {time.time()-t0:.3f}s", flush=True)
