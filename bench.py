"""Benchmark: batched bootstrapped-NAND throughput (128-bit params, 1 chip).

Prints ONE JSON line:
  {"metric": "nand_bootstraps_per_sec_128bit", "value": N, "unit": "gates/s",
   "vs_baseline": N / 1e4}

vs_baseline is measured against the BASELINE.json north star of 1e4 bit-exact
gate bootstraps/sec/chip (the reference library publishes no numbers of its
own and disclaims performance, BASELINE.md). Uses REAL keys (jitted keygen)
and checks decrypt-level correctness of the final batch on stderr.

Env knobs: TFHE_TPU_BENCH_BATCH (default 4096 on TPU, 8 on CPU),
TFHE_TPU_BENCH_ITERS (default 4), TFHE_TPU_BENCH_PARAMS
(128fast|128|80|toy; default 128fast — the TPU-retuned preset with the
SAME lattice instances/security as the reference's 128-bit preset,
docs/params_fast.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _probe_backend(timeout_s: int) -> bool:
    """True if the backend can serve a device->host read within timeout_s.

    Runs in a SUBPROCESS: when the axon tunnel is down, backend init hangs
    indefinitely in-process and cannot be interrupted — a fast, clearly
    labeled failure beats a silent multi-hour hang of the driver.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy; numpy.asarray(jax.numpy.zeros(1)); "
             "print('BACKEND_OK')"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        return "BACKEND_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax
    import jax.numpy as jnp

    import tfhe_tpu as tt
    from tfhe_tpu import gates
    from tfhe_tpu.utils.sync import device_barrier, prime_sync

    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) and \
            not _probe_backend(int(os.environ.get("TFHE_TPU_BENCH_PROBE_S",
                                                  "180"))):
        log("FATAL: device backend unreachable (tunnel down?) — "
            "refusing to hang; set TFHE_TPU_BENCH_PROBE_S to adjust")
        sys.exit(3)

    prime_sync()  # tunneled-TPU: honest AND fast dispatch mode (utils/sync.py)
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    batch = int(os.environ.get("TFHE_TPU_BENCH_BATCH", "4096" if on_tpu else "8"))
    iters = int(os.environ.get("TFHE_TPU_BENCH_ITERS", "4"))
    which = os.environ.get("TFHE_TPU_BENCH_PARAMS", "128fast")
    params = {
        "128": tt.tfhe_parameters_128,
        "128fast": tt.tfhe_parameters_128_fast,
        "128fast8": tt.tfhe_parameters_128_fast8,
        "80": tt.tfhe_parameters_80,
        "toy": tt.tfhe_parameters_toy,
    }[which]()
    log(f"bench: backend={backend} batch={batch} iters={iters} params={which}")

    t0 = time.time()
    if which == "128fast8":
        # The k=8/N=128 geometry is compact-by-design: at M=1 the baked form
        # is a ~13 GB pure memory hog with no block-recombine advantage (the
        # compact megakernel regenerates each step operand with 18 strided
        # rolls in VMEM — params.py docstring). Fresh closure: the jit cache
        # keys on fn identity + avals, not TuningConfig (tuning.py CAVEAT).
        from tfhe_tpu import tuning as _tuning

        with _tuning.override(bs_bake_budget=0):
            sk, ck = jax.jit(lambda r: tt.make_key_pair(r, params))(
                jax.random.PRNGKey(123)
            )
    else:
        sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(
            jax.random.PRNGKey(123), params
        )
    jax.block_until_ready(ck.bootstrap_key.baked)
    log(f"keygen: {time.time() - t0:.1f}s")

    bits_x = jnp.arange(batch) % 2 == 0
    bits_y = jnp.arange(batch) % 3 == 0
    ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, bits_x)
    ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, bits_y)

    # The timed region is ONE jitted call that scans `iters` dependent NAND
    # layers (each layer = batch real bootstraps; the carry chains them, so
    # nothing can be elided). A host-side call loop instead pays the
    # tunnel's ~25-35 ms dispatch per call — profiler-measured device time
    # for one batch is 593 ms vs ~625 ms wall per chained host call.
    @jax.jit
    def nand_chain(ck_, x, y):
        def layer(c, _):
            return gates.gate_nand(ck_, c, y), None
        return jax.lax.scan(layer, gates.gate_nand(ck_, x, y), None,
                            length=iters)[0]

    t0 = time.time()
    out = nand_chain(ck, ct_x, ct_y)
    device_barrier(out)
    log(f"first call (compile + run): {time.time() - t0:.1f}s")

    t0 = time.time()
    out = nand_chain(ck, ct_x, ct_y)
    device_barrier(out)
    dt = time.time() - t0
    throughput = batch * (iters + 1) / dt
    log(f"{iters + 1} layers x {batch} gates in {dt:.3f}s -> "
        f"{throughput:.0f} gates/s")

    # Correctness spot check (decrypt level): NAND(NAND(x,y), y) chain
    import numpy as np

    px = np.asarray(bits_x)
    py = np.asarray(bits_y)
    want = ~(px & py)  # the chain starts from NAND(x, y)
    for _ in range(iters):
        want = ~(want & py)
    got = np.asarray(tt.decrypt(sk, out))
    n_bad = int((got != want).sum())
    log(f"correctness: {batch - n_bad}/{batch} decrypt correctly")
    if n_bad:
        log("WARNING: decryption errors present")

    # Pin the security claim next to the throughput claim: core-SVP bits
    # for the preset actually benchmarked (tools/security_estimate.py;
    # 128fast/128pbs rate IDENTICAL to the reference 128-bit preset —
    # docs/security.md, tests/test_security_estimate.py).
    sec_bits = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        import security_estimate as se
        sec_bits = round(se.estimate_preset(params)["bits"], 1)
    except Exception as e:  # never let the estimator sink the bench line
        log(f"security estimate unavailable: {e}")

    # vs_baseline is the ratio against the BASELINE.json north star (1e4
    # bit-exact gates/s/chip at the 128-bit security level). Only presets
    # pinned at that level get a ratio — "128" itself plus the re-splits
    # "128fast"/"128fast8", all rated bit-for-bit identical by
    # tools/security_estimate.py (tests/test_security_estimate.py) —
    # anything else (80/toy) emits null rather than an apples-to-oranges
    # number.
    at_128_level = which in ("128", "128fast", "128fast8")
    print(json.dumps({
        "metric": "nand_bootstraps_per_sec_128bit",
        "value": round(throughput, 1),
        "unit": "gates/s",
        "vs_baseline": round(throughput / 1e4, 4) if at_128_level else None,
        "params": which,
        "security_core_svp_bits": sec_bits,
        "correct": batch - n_bad,
        "of": batch,
    }))


if __name__ == "__main__":
    main()
