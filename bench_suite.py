"""Extended benchmark suite: the BASELINE.md measured configurations.

Prints one JSON line per config (the driver's headline metric stays in
bench.py). Configs (BASELINE.md "Measured configs"):
  80bit:          single NAND latency (plain/chained/compact key) + gate set
  128core:        batched NAND + PBS LUT4 + adder8 + radix adder, 128 preset
  fast:           batched NAND on the TPU-retuned 128_fast preset
  fast8:          batched NAND on the k=8/N=128 reliability tier
  radix_preset:   radix adder on the radix-tuned preset
  radix_reliable: the <=1e-9/word config (manylut off)
  mk2 / mk2_ref:  2-party MK NAND (zero-error lownoise headline + the
                  reference-fidelity preset, labeled)
  mk4 / mk8:      4- and 8-party MK NAND

PROCESS ISOLATION: run without env to execute EVERY section in its own
subprocess — one fresh TPU client per section, so a 16 GB chip never has
to hold two presets' baked keys (or a long process's allocator
fragmentation) at once; a section failure is emitted as an artifact line
instead of sinking the rest. Round-5 motivation: the monolithic suite
OOM'd at the 6th baked keygen even though every section fits alone.
TFHE_SUITE_SECTIONS=a,b,... runs the named sections in-process (that is
also what each subprocess does).

Env: TFHE_SUITE_SMALL=1 shrinks batches for CPU smoke runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_SMALL_MODE = False


def emit(metric, value, unit, extra=None):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if extra:
        rec.update(extra)
    if _SMALL_MODE:
        # smoke runs use toy parameters: keep the preset/tier labels the
        # sections attach from masquerading as production measurements
        rec["small_toy_params"] = True
    print(json.dumps(rec), flush=True)


def _small():
    global _SMALL_MODE
    import jax

    small = bool(int(os.environ.get("TFHE_SUITE_SMALL", "0")))
    if jax.default_backend() != "tpu" and not small:
        log("not on TPU; forcing TFHE_SUITE_SMALL=1")
        small = True
    _SMALL_MODE = small
    return small


def device_barrier(tree):
    """Honest completion barrier for every timed region (utils/sync.py):
    bare block_until_ready is a no-op when the tunneled runtime is (or
    falls back to) deferred dispatch — the round-5 mk8 run produced a
    nonsense 3.1M gates/s line that way after a mid-compile tunnel
    reconnect reset the dispatch mode."""
    from tfhe_tpu.utils.sync import device_barrier as db

    db(tree)


def sec_80bit():
    """Single NAND latency (plain / device-chained / compact key) + the
    10-gate set, 80-bit (tutorial) params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_tpu as tt
    from tfhe_tpu import gates

    small = _small()
    p80 = tt.tfhe_parameters_toy() if small else tt.tfhe_parameters_80()
    sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(123), p80
    )
    jax.block_until_ready(ck.bootstrap_key.baked)

    one_x = tt.encrypt(jax.random.PRNGKey(1), sk, jnp.asarray([True]))
    one_y = tt.encrypt(jax.random.PRNGKey(2), sk, jnp.asarray([False]))
    nand1 = jax.jit(gates.gate_nand)
    out = nand1(ck, one_x, one_y)
    device_barrier(out)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = nand1(ck, out, one_y)
    device_barrier(out)
    emit("single_nand_latency_80bit", (time.time() - t0) / reps * 1e3, "ms")

    # Device-resident chained latency: N dependent NANDs inside ONE jitted
    # program (lax.scan carrying the ciphertext), so the tunnel's ~25 ms
    # per-dispatch floor is amortized away. This is the honest per-gate
    # latency of the compute itself for pipelined serving, where the
    # wall-clock single-call number above is dominated by dispatch.
    chain_n = 2 if small else 16

    @jax.jit
    def chain(ck_, x, y):
        def body(c, _):
            return gates.gate_nand(ck_, c, y), None
        return jax.lax.scan(body, x, None, length=chain_n)[0]

    out = chain(ck, one_x, one_y)
    device_barrier(out)
    t0 = time.time()
    out = chain(ck, out, one_y)
    device_barrier(out)
    emit("chained_nand_device_latency_80bit",
         (time.time() - t0) / chain_n * 1e3, "ms", {"chain": chain_n})

    # single NAND latency with the COMPACT (multi-tenant) key: prepared
    # limbs expanded in-kernel per step (docs/serving.md): ~T x smaller key;
    # batch-1 latency is key-streaming/expansion-bound either way.
    from tfhe_tpu import tuning as _tuning

    with _tuning.override(bs_bake_budget=0):
        # fresh closure: the jit cache is keyed by fn identity + avals, not
        # TuningConfig — reusing the jitted keygen above would return the
        # baked form again
        skc, ckc = jax.jit(lambda r: tt.make_key_pair(r, p80))(
            jax.random.PRNGKey(123)
        )
    jax.block_until_ready(ckc.bootstrap_key.baked)
    assert ckc.bootstrap_key.compact
    outc = nand1(ckc, one_x, one_y)
    device_barrier(outc)
    t0 = time.time()
    for _ in range(reps):
        outc = nand1(ckc, outc, one_y)
    device_barrier(outc)
    emit("single_nand_latency_compact_key", (time.time() - t0) / reps * 1e3,
         "ms", {"key_mb": round(ckc.bootstrap_key.baked.size / 2**20, 1)})
    del skc, ckc, outc

    xs = jnp.asarray([False, False, True, True])
    ys = jnp.asarray([False, True, False, True])
    cx = tt.encrypt(jax.random.PRNGKey(3), sk, xs)
    cy = tt.encrypt(jax.random.PRNGKey(4), sk, ys)
    table = {
        gates.gate_nand: lambda x, y: ~(x & y), gates.gate_and: lambda x, y: x & y,
        gates.gate_or: lambda x, y: x | y, gates.gate_xor: lambda x, y: x ^ y,
        gates.gate_xnor: lambda x, y: ~(x ^ y), gates.gate_nor: lambda x, y: ~(x | y),
        gates.gate_andny: lambda x, y: ~x & y, gates.gate_andyn: lambda x, y: x & ~y,
        gates.gate_orny: lambda x, y: ~x | y, gates.gate_oryn: lambda x, y: x | ~y,
    }
    ok = 0
    for fn, ref in table.items():
        got = np.asarray(tt.decrypt(sk, fn(ck, cx, cy)))
        ok += int((got == np.asarray(ref(xs, ys))).all())
    emit("gate_set_correct", ok, f"/{len(table)} gates")


def sec_128core():
    """Batched NAND throughput, PBS LUT4, ripple-carry adder, and the
    radix adder — all on the reference-geometry 128-bit preset (one shared
    8.9 GB baked key)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_tpu as tt
    from tfhe_tpu import circuits, gates

    small = _small()
    p128 = tt.tfhe_parameters_toy() if small else tt.tfhe_parameters_128()
    sk2, ck2 = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(7), p128
    )
    jax.block_until_ready(ck2.bootstrap_key.baked)
    B = 64 if small else 4096
    bx = tt.encrypt(jax.random.PRNGKey(8), sk2, jnp.arange(B) % 2 == 0)
    by = tt.encrypt(jax.random.PRNGKey(9), sk2, jnp.arange(B) % 3 == 0)
    nand = jax.jit(gates.gate_nand)
    out = nand(ck2, bx, by); device_barrier(out)
    iters = 2 if small else 4
    t0 = time.time()
    for _ in range(iters):
        out = nand(ck2, out, by)
    device_barrier(out)
    emit("batched_nand_throughput_128bit", B * iters / (time.time() - t0),
         "gates/s", {"batch": B})
    del bx, by, out

    # programmable bootstrapping (4-entry LUT) throughput
    from tfhe_tpu import pbs as pbs_mod

    S = 4
    msgs = jnp.arange(B) % S
    lut = jnp.asarray([2, 0, 3, 1], jnp.int32)
    px = pbs_mod.encrypt_pbs(jax.random.PRNGKey(12), sk2, msgs, S)
    pb = jax.jit(pbs_mod.programmable_bootstrap, static_argnums=4)
    out_p = pb(ck2.bootstrap_key, ck2.keyswitch_key, lut, px, S)
    device_barrier(out_p)
    t0 = time.time()
    out_p = pb(ck2.bootstrap_key, ck2.keyswitch_key, lut, out_p, S)
    device_barrier(out_p)
    dt = time.time() - t0
    lut_np = np.asarray(lut)
    got = np.asarray(pbs_mod.decrypt_pbs(sk2, out_p, S))
    want = lut_np[lut_np[np.asarray(msgs)]]  # chained: f(f(m))
    emit("pbs_lut4_throughput_128bit", B / dt, "luts/s",
         {"batch": B, "correct": int((got == want).sum()), "of": B})
    del px, out_p

    # 8-bit ripple-carry adder (error-COUNTED per word)
    W = 8 if small else 512
    av = jnp.arange(W, dtype=jnp.uint32) % 251
    bv = (jnp.arange(W, dtype=jnp.uint32) * 7) % 253
    ca = circuits.encrypt_word(jax.random.PRNGKey(10), sk2, av, 8)
    cb = circuits.encrypt_word(jax.random.PRNGKey(11), sk2, bv, 8)
    add = jax.jit(circuits.ripple_carry_add)
    out = add(ck2, ca, cb); device_barrier(out)
    t0 = time.time()
    out = add(ck2, out, cb)
    device_barrier(out)
    dt = time.time() - t0
    got = np.asarray(circuits.decrypt_word(sk2, out))
    want = np.asarray((av + 2 * bv) % 256)
    emit("adder8_words_per_sec", W / dt, "adds/s",
         {"correct": int((got == want).sum()), "of": W})
    del ca, cb, out

    # 8-bit radix adder (base-4 digits on PBS: 1 rotation/bit), production
    # batch with COUNTED word errors (the reference 128 preset carries a
    # model failure ~3.8e-3/word here — docs/leveled_mode.md 2b)
    from tfhe_tpu import radix

    Wr = 8 if small else 4096
    rav = jnp.arange(Wr, dtype=jnp.uint32) % 251
    rbv = (jnp.arange(Wr, dtype=jnp.uint32) * 7) % 253
    ra_ = radix.encrypt_radix(jax.random.PRNGKey(13), sk2, rav, 8)
    rb_ = radix.encrypt_radix(jax.random.PRNGKey(14), sk2, rbv, 8)
    radd = jax.jit(radix.radix_add)
    out_r = radd(ck2, ra_, rb_); device_barrier(out_r)
    t0 = time.time()
    out_r = radd(ck2, out_r, rb_)
    device_barrier(out_r)
    dt = time.time() - t0
    got = np.asarray(radix.decrypt_radix(sk2, out_r))
    want = np.asarray((rav + 2 * rbv) % 256)
    emit("radix_adder8_words_per_sec", Wr / dt, "adds/s",
         {"correct": int((got == want).sum()), "of": Wr, "params": "128"})


def _batched_nand(params_fn, metric, keygen_budget=None, extra=None):
    """Shared body for the batched-NAND throughput sections: keygen
    (optionally under a bake-budget override), one warmup NAND, `iters`
    timed chained layers, decrypt-checked."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_tpu as tt
    from tfhe_tpu import gates, tuning

    small = _small()
    params = tt.tfhe_parameters_toy() if small else params_fn()
    if keygen_budget is None:
        sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(
            jax.random.PRNGKey(17), params
        )
    else:
        with tuning.override(bs_bake_budget=keygen_budget):
            # fresh closure (tuning.py CAVEAT: jit cache keys on fn
            # identity + avals, not TuningConfig)
            sk, ck = jax.jit(lambda r: tt.make_key_pair(r, params))(
                jax.random.PRNGKey(17))
    jax.block_until_ready(ck.bootstrap_key.baked)
    B = 64 if small else 4096
    iters = 2 if small else 4
    xb = np.arange(B) % 2 == 0
    yb = np.arange(B) % 3 == 0
    fx = tt.encrypt(jax.random.PRNGKey(18), sk, jnp.asarray(xb))
    fy = tt.encrypt(jax.random.PRNGKey(19), sk, jnp.asarray(yb))
    nandf = jax.jit(gates.gate_nand)
    outf = nandf(ck, fx, fy); device_barrier(outf)
    t0 = time.time()
    for _ in range(iters):
        outf = nandf(ck, outf, fy)
    device_barrier(outf)
    dt = time.time() - t0
    want = ~(xb & yb)  # the warmup call; then `iters` timed layers
    for _ in range(iters):
        want = ~(want & yb)
    got = np.asarray(tt.decrypt(sk, outf))
    rec = {"batch": B, "correct": int((got == want).sum()), "of": B}
    if extra:
        rec.update(extra)
    emit(metric, B * iters / dt, "gates/s", rec)


def sec_fast():
    """Batched NAND at the TPU-retuned 128-bit preset (the bench.py
    headline config; same lattice instances/security — docs/params_fast.md)."""
    import tfhe_tpu as tt

    _batched_nand(tt.tfhe_parameters_128_fast, "batched_nand_throughput_128fast")


def sec_fast8():
    """The k=8/N=128 frontier re-split (reliability TIER: ~7e-9/gate model
    failure vs 2e-38 at 128_fast — docs/params_fast.md). Compact-by-design:
    at M=1 the baked form is a ~13 GB memory hog, so keygen runs under
    bs_bake_budget=0."""
    import tfhe_tpu as tt

    _batched_nand(
        tt.tfhe_parameters_128_fast8, "batched_nand_throughput_128fast8",
        keygen_budget=0,
        extra={"tier": "~7e-9/gate model failure (docs/params_fast.md)"})


def sec_radix_preset():
    """Radix adder on the radix-tuned preset (balanced l3b7 gadget +
    ks l4 base16: model failure 7.9e-5/word at unchanged rotation cost)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_tpu as tt
    from tfhe_tpu import radix

    small = _small()
    pradix = tt.tfhe_parameters_toy() if small else \
        tt.tfhe_parameters_128_radix()
    skr, ckr = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(41), pradix
    )
    jax.block_until_ready(ckr.bootstrap_key.baked)
    Wr = 8 if small else 4096
    rav = jnp.arange(Wr, dtype=jnp.uint32) % 251
    rbv = (jnp.arange(Wr, dtype=jnp.uint32) * 7) % 253
    ra2 = radix.encrypt_radix(jax.random.PRNGKey(42), skr, rav, 8)
    rb2 = radix.encrypt_radix(jax.random.PRNGKey(43), skr, rbv, 8)
    radd = jax.jit(radix.radix_add)
    out_r = radd(ckr, ra2, rb2); device_barrier(out_r)
    t0 = time.time()
    out_r = radd(ckr, out_r, rb2)
    device_barrier(out_r)
    dt = time.time() - t0
    got = np.asarray(radix.decrypt_radix(skr, out_r))
    want = np.asarray((rav + 2 * rbv) % 256)
    emit("radix_adder8_words_per_sec_radix_preset", Wr / dt, "adds/s",
         {"correct": int((got == want).sum()), "of": Wr,
          "params": "128radix"})


def sec_radix_reliable():
    """The <=1e-9/word RELIABLE config: 128_radix_reliable preset with
    PBSmanyLUT OFF (model failure 1.6e-10/word, docs/leveled_mode.md 2b) —
    the one shipped preset whose numbers were model-only before round 5."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_tpu as tt
    from tfhe_tpu import radix, tuning

    small = _small()
    prel = tt.tfhe_parameters_toy() if small else \
        tt.tfhe_parameters_128_radix_reliable()
    Wr = 8 if small else 4096
    rav = jnp.arange(Wr, dtype=jnp.uint32) % 251
    rbv = (jnp.arange(Wr, dtype=jnp.uint32) * 7) % 253
    # COMPACT key: the l=4 gadget bakes to ~11.9 GB, which OOMs a 16 GB
    # chip once bake temporaries are counted (measured round 5, fresh
    # process) — this preset is compact-serving-only on v5e, like fast8
    with tuning.override(radix_manylut=False, bs_bake_budget=0):
        # fresh closures: the jit cache keys on fn identity + avals, not
        # TuningConfig (tuning.py CAVEAT)
        skl, ckl = jax.jit(lambda r: tt.make_key_pair(r, prel))(
            jax.random.PRNGKey(45))
        jax.block_until_ready(ckl.bootstrap_key.baked)
        ra3 = radix.encrypt_radix(jax.random.PRNGKey(46), skl, rav, 8)
        rb3 = radix.encrypt_radix(jax.random.PRNGKey(47), skl, rbv, 8)
        radd_rel = jax.jit(lambda c, a, b: radix.radix_add(c, a, b))
        out_r = radd_rel(ckl, ra3, rb3); device_barrier(out_r)
        t0 = time.time()
        out_r = radd_rel(ckl, out_r, rb3)
        device_barrier(out_r)
        dt = time.time() - t0
        got = np.asarray(radix.decrypt_radix(skl, out_r))
    want = np.asarray((rav + 2 * rbv) % 256)
    emit("radix_adder8_words_per_sec_reliable", Wr / dt, "adds/s",
         {"correct": int((got == want).sum()), "of": Wr,
          "params": "128radix_reliable", "manylut": False,
          "key_form": "compact", "model_failure_per_word": 1.6e-10})


def _mk_run(parties, pmk, metric, seed, batch, extra=None):
    """Shared MK ceremony + timing protocol: shared-key setup, per-party
    keygen/cloud-key parts, expansion, one warmup NAND, one timed chained
    NAND layer ending in a device_barrier, decrypt-COUNTED errors. One
    copy so timing-protocol fixes (like the r5 device_barrier lesson)
    cannot drift between party counts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_tpu as tt
    import tfhe_tpu.mk as mk

    small = _small()
    r = jax.random.PRNGKey(seed)
    r_sh, *party_rngs = jax.random.split(r, parties + 1)
    shared = mk.make_shared_key(r_sh, pmk)
    sks, parts = [], []
    for rr in party_rngs:
        r_sk, r_part = jax.random.split(rr)
        s = tt.make_secret_key(r_sk, pmk)
        sks.append(s)
        parts.append(mk.make_cloud_key_part(r_part, s, shared))
    t0 = time.time()
    mck = mk.make_mk_cloud_key(parts)
    jax.block_until_ready(mck.bootstrap_key.limbs)
    log(f"mk expansion ({metric}): {time.time() - t0:.1f}s "
        f"(sparse={mck.bootstrap_key.sparse})")
    del parts  # the 8-party expanded key + parts do not co-fit 16 GB
    Bm = 4 if small else batch
    m1 = jnp.arange(Bm) % 2 == 0
    e1 = mk.mk_encrypt(jax.random.PRNGKey(seed + 1), sks, m1)
    e2 = mk.mk_encrypt(jax.random.PRNGKey(seed + 2), sks, ~m1)
    mknand = jax.jit(mk.mk_gate_nand)
    out = mknand(mck, e1, e2); device_barrier(out)
    t0 = time.time()
    out = mknand(mck, out, e2)
    device_barrier(out)
    dt = time.time() - t0
    dec = np.asarray(mk.mk_decrypt(sks, out))
    want = ~(np.asarray(~(m1 & ~m1)) & np.asarray(~m1))
    rec = {"batch": Bm, "errors": int((dec != want).sum())}
    if extra:
        rec.update(extra)
    emit(metric, Bm / dt, "gates/s", rec)


def sec_mk2():
    """2-party MK NAND. The HEADLINE row runs the zero-error lownoise
    preset (the documented default: the reference's own 2-party preset
    carries an intrinsic ~1.5%/gate failure, docs/mk_noise_budget.md)."""
    import tfhe_tpu.mk as mk

    _mk_run(2, mk.mktfhe_parameters_toy(2) if _small()
            else mk.mktfhe_parameters_2party_lownoise(),
            "mk2_nand_throughput", seed=21, batch=4096,
            extra={"preset": "2party_lownoise"})


def sec_mk2_ref():
    """2-party MK NAND on the reference-fidelity preset, labeled with its
    intrinsic failure rate."""
    import tfhe_tpu.mk as mk

    _mk_run(2, mk.mktfhe_parameters_toy(2) if _small()
            else mk.mktfhe_parameters_2party(),
            "mk2_nand_throughput_reference_preset", seed=26, batch=4096,
            extra={"preset": "2party (reference fidelity; intrinsic "
                             "~1.5%/gate failure, docs/mk_noise_budget.md)"})


def sec_mk4():
    """4-party MK NAND (party keys shardable across hosts)."""
    import tfhe_tpu.mk as mk

    _mk_run(4, mk.mktfhe_parameters_toy(4) if _small()
            else mk.mktfhe_parameters_4party(),
            "mk4_nand_throughput", seed=31, batch=4096)


def sec_mk8():
    """8-party MK NAND (reference preset src/mk_api.jl:24-34). The
    sparse-stored expanded key (~6.6 GB, nonzero blocks only) is the only
    form that fits a 16 GB chip."""
    import tfhe_tpu.mk as mk

    _mk_run(8, mk.mktfhe_parameters_toy(8) if _small()
            else mk.mktfhe_parameters_8party(),
            "mk8_nand_throughput", seed=51, batch=1024)


SECTIONS = {
    "80bit": sec_80bit,
    "128core": sec_128core,
    "fast": sec_fast,
    "fast8": sec_fast8,
    "radix_preset": sec_radix_preset,
    "radix_reliable": sec_radix_reliable,
    "mk2": sec_mk2,
    "mk2_ref": sec_mk2_ref,
    "mk4": sec_mk4,
    "mk8": sec_mk8,
}


def main():
    names = os.environ.get("TFHE_SUITE_SECTIONS")
    if names:
        # in-process mode (what each subprocess runs)
        from tfhe_tpu.utils.sync import prime_sync

        prime_sync()  # tunneled-TPU: honest AND fast dispatch (utils/sync.py)
        for name in names.split(","):
            SECTIONS[name.strip()]()
        return
    # orchestrator mode: one subprocess per section = one fresh TPU client,
    # full HBM for every section, failures isolated to artifact lines.
    # Per-section timeout: a tunnel outage can hang a fresh interpreter at
    # startup (CLAUDE.md; the axon register() runs from sitecustomize before
    # any user code), and mk8's remote compile alone runs ~40 min — without
    # a bound the whole suite would wedge with no artifact line.
    timeout_s = int(os.environ.get("TFHE_SUITE_SECTION_TIMEOUT_S", "5400"))
    failed = []
    for name in SECTIONS:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "TFHE_SUITE_SECTIONS": name},
                stdout=subprocess.PIPE, text=True, timeout=timeout_s,
            )
            out, code = r.stdout, r.returncode
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            code = f"timeout>{timeout_s}s"
        sys.stdout.write(out)
        sys.stdout.flush()
        log(f"[suite] section {name}: exit={code} "
            f"({time.time() - t0:.0f}s)")
        if code != 0:
            failed.append(name)
            emit(f"section_{name}", -1, "failed", {"exit_code": str(code)})
    if failed:
        # partial artifacts were emitted above, but the suite as a whole
        # must not look green to `bench_suite.py && publish` automation
        log(f"[suite] FAILED sections: {', '.join(failed)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
