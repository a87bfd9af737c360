"""Extended benchmark suite: the BASELINE.md measured configurations.

Prints one JSON line per config (the driver's headline metric stays in
bench.py). Configs (BASELINE.md "Measured configs"):
  1. single NAND latency, 80-bit (tutorial) params
  2. full gate set, decrypt-verified (keyswitch path exercised per gate)
  3. 4096-gate batched NAND bootstrap throughput, 128-bit params
  4. 8-bit ripple-carry adder throughput (words/sec)
  4b. 8-bit radix adder throughput (base-4 digits on PBS, 1 rotation/bit)
  5. 2-party multi-key NAND throughput

Env: TFHE_SUITE_SMALL=1 shrinks batches for CPU smoke runs.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric, value, unit, extra=None):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_tpu as tt
    import tfhe_tpu.mk as mk
    from tfhe_tpu import circuits, gates
    from tfhe_tpu.utils.sync import prime_sync

    prime_sync()  # tunneled-TPU: honest AND fast dispatch mode (utils/sync.py)
    small = bool(int(os.environ.get("TFHE_SUITE_SMALL", "0")))
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not small:
        log("not on TPU; forcing TFHE_SUITE_SMALL=1")
        small = True

    # --- 1+2: 80-bit keygen, single NAND latency, full gate set ---
    p80 = tt.tfhe_parameters_toy() if small else tt.tfhe_parameters_80()
    sk, ck = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(123), p80
    )
    jax.block_until_ready(ck.bootstrap_key.baked)

    one_x = tt.encrypt(jax.random.PRNGKey(1), sk, jnp.asarray([True]))
    one_y = tt.encrypt(jax.random.PRNGKey(2), sk, jnp.asarray([False]))
    nand1 = jax.jit(gates.gate_nand)
    out = nand1(ck, one_x, one_y)
    jax.block_until_ready(out)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = nand1(ck, out, one_y)
    jax.block_until_ready(out)
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
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain(ck, out, one_y)
    jax.block_until_ready(out)
    emit("chained_nand_device_latency_80bit",
         (time.time() - t0) / chain_n * 1e3, "ms", {"chain": chain_n})

    # --- 1c: single NAND latency with the COMPACT (multi-tenant) key ---
    # prepared limbs expanded per step (docs/serving.md): ~T x smaller key;
    # batch-1 latency is key-streaming/expansion-bound either way.
    from tfhe_tpu import tuning as _tuning

    with _tuning.override(bs_bake_budget=0):
        # fresh closure: the jit cache is keyed by fn identity + avals, not
        # TuningConfig — reusing the section-1 jitted keygen would return
        # the baked form again
        skc, ckc = jax.jit(lambda r: tt.make_key_pair(r, p80))(
            jax.random.PRNGKey(123)
        )
    jax.block_until_ready(ckc.bootstrap_key.baked)
    assert ckc.bootstrap_key.compact
    outc = nand1(ckc, one_x, one_y)
    jax.block_until_ready(outc)
    t0 = time.time()
    for _ in range(reps):
        outc = nand1(ckc, outc, one_y)
    jax.block_until_ready(outc)
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

    # --- 3: batched NAND throughput, 128-bit ---
    # free the 80-bit key material first (4.2 GB baked key; holding both
    # presets' keys plus bake temporaries exhausts a 16 GB chip)
    del ck, sk, cx, cy, one_x, one_y, out
    p128 = tt.tfhe_parameters_toy() if small else tt.tfhe_parameters_128()
    sk2, ck2 = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(7), p128
    )
    jax.block_until_ready(ck2.bootstrap_key.baked)
    B = 64 if small else 4096
    bx = tt.encrypt(jax.random.PRNGKey(8), sk2, jnp.arange(B) % 2 == 0)
    by = tt.encrypt(jax.random.PRNGKey(9), sk2, jnp.arange(B) % 3 == 0)
    nand = jax.jit(gates.gate_nand)
    out = nand(ck2, bx, by); jax.block_until_ready(out)
    iters = 2 if small else 4
    t0 = time.time()
    for _ in range(iters):
        out = nand(ck2, out, by)
    jax.block_until_ready(out)
    emit("batched_nand_throughput_128bit", B * iters / (time.time() - t0),
         "gates/s", {"batch": B})

    # --- 3a: batched NAND at the TPU-retuned 128-bit preset (the bench.py
    # headline config; same lattice instances/security — docs/params_fast.md)
    del bx, by
    pfast = tt.tfhe_parameters_toy() if small else tt.tfhe_parameters_128_fast()
    skf, ckf = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(17), pfast
    )
    jax.block_until_ready(ckf.bootstrap_key.baked)
    fx = tt.encrypt(jax.random.PRNGKey(18), skf, jnp.arange(B) % 2 == 0)
    fy = tt.encrypt(jax.random.PRNGKey(19), skf, jnp.arange(B) % 3 == 0)
    nandf = jax.jit(gates.gate_nand)
    outf = nandf(ckf, fx, fy); jax.block_until_ready(outf)
    t0 = time.time()
    for _ in range(iters):
        outf = nandf(ckf, outf, fy)
    jax.block_until_ready(outf)
    emit("batched_nand_throughput_128fast", B * iters / (time.time() - t0),
         "gates/s", {"batch": B})
    del skf, ckf, fx, fy, outf

    # --- 3b: programmable bootstrapping (4-entry LUT) throughput ---
    from tfhe_tpu import pbs as pbs_mod

    S = 4
    msgs = jnp.arange(B) % S
    lut = jnp.asarray([2, 0, 3, 1], jnp.int32)
    px = pbs_mod.encrypt_pbs(jax.random.PRNGKey(12), sk2, msgs, S)
    pb = jax.jit(pbs_mod.programmable_bootstrap, static_argnums=4)
    out_p = pb(ck2.bootstrap_key, ck2.keyswitch_key, lut, px, S)
    jax.block_until_ready(out_p)
    t0 = time.time()
    out_p = pb(ck2.bootstrap_key, ck2.keyswitch_key, lut, out_p, S)
    jax.block_until_ready(out_p)
    dt = time.time() - t0
    lut_np = np.asarray(lut)
    got = np.asarray(pbs_mod.decrypt_pbs(sk2, out_p, S))
    want = lut_np[lut_np[np.asarray(msgs)]]  # chained: f(f(m))
    emit("pbs_lut4_throughput_128bit", B / dt, "luts/s",
         {"batch": B, "correct": int((got == want).sum()), "of": B})
    del px, out_p

    # --- 4: 8-bit ripple-carry adder (error-COUNTED per word) ---
    W = 8 if small else 512
    av = jnp.arange(W, dtype=jnp.uint32) % 251
    bv = (jnp.arange(W, dtype=jnp.uint32) * 7) % 253
    ca = circuits.encrypt_word(jax.random.PRNGKey(10), sk2, av, 8)
    cb = circuits.encrypt_word(jax.random.PRNGKey(11), sk2, bv, 8)
    add = jax.jit(circuits.ripple_carry_add)
    out = add(ck2, ca, cb); jax.block_until_ready(out)
    t0 = time.time()
    out = add(ck2, out, cb)
    jax.block_until_ready(out)
    dt = time.time() - t0
    got = np.asarray(circuits.decrypt_word(sk2, out))
    want = np.asarray((av + 2 * bv) % 256)
    emit("adder8_words_per_sec", W / dt, "adds/s",
         {"correct": int((got == want).sum()), "of": W})

    # --- 4b: 8-bit radix adder (base-4 digits on PBS: 1 rotation/bit),
    # production batch with COUNTED word errors (the reference 128 preset
    # carries a model failure ~3.8e-3/word here — docs/leveled_mode.md 2b)
    from tfhe_tpu import radix

    Wr = 8 if small else 4096
    rav = jnp.arange(Wr, dtype=jnp.uint32) % 251
    rbv = (jnp.arange(Wr, dtype=jnp.uint32) * 7) % 253
    ra_ = radix.encrypt_radix(jax.random.PRNGKey(13), sk2, rav, 8)
    rb_ = radix.encrypt_radix(jax.random.PRNGKey(14), sk2, rbv, 8)
    radd = jax.jit(radix.radix_add)
    out_r = radd(ck2, ra_, rb_); jax.block_until_ready(out_r)
    t0 = time.time()
    out_r = radd(ck2, out_r, rb_)
    jax.block_until_ready(out_r)
    dt = time.time() - t0
    got = np.asarray(radix.decrypt_radix(sk2, out_r))
    want = np.asarray((rav + 2 * rbv) % 256)
    emit("radix_adder8_words_per_sec", Wr / dt, "adds/s",
         {"correct": int((got == want).sum()), "of": Wr, "params": "128"})
    del ra_, rb_, out_r, ck2, sk2

    # --- 4c: radix adder on the radix-tuned preset (balanced l3b7 gadget +
    # ks l4 base16: model failure 7.9e-5/word at unchanged rotation cost)
    pradix = tt.tfhe_parameters_toy() if small else \
        tt.tfhe_parameters_128_radix()
    skr, ckr = jax.jit(tt.make_key_pair, static_argnums=1)(
        jax.random.PRNGKey(41), pradix
    )
    jax.block_until_ready(ckr.bootstrap_key.baked)
    ra2 = radix.encrypt_radix(jax.random.PRNGKey(42), skr, rav, 8)
    rb2 = radix.encrypt_radix(jax.random.PRNGKey(43), skr, rbv, 8)
    out_r = radd(ckr, ra2, rb2); jax.block_until_ready(out_r)
    t0 = time.time()
    out_r = radd(ckr, out_r, rb2)
    jax.block_until_ready(out_r)
    dt = time.time() - t0
    got = np.asarray(radix.decrypt_radix(skr, out_r))
    emit("radix_adder8_words_per_sec_radix_preset", Wr / dt, "adds/s",
         {"correct": int((got == want).sum()), "of": Wr,
          "params": "128radix"})
    del ra2, rb2, out_r, skr, ckr

    # --- 4d: the <=1e-9/word RELIABLE config: 128_radix_reliable preset with
    # PBSmanyLUT OFF (model failure 1.6e-10/word, docs/leveled_mode.md 2b) —
    # the one shipped preset whose numbers were model-only before round 5
    from tfhe_tpu import tuning as _tuning2

    prel = tt.tfhe_parameters_toy() if small else \
        tt.tfhe_parameters_128_radix_reliable()
    with _tuning2.override(radix_manylut=False):
        # fresh closures: the jit cache keys on fn identity + avals, not
        # TuningConfig — reusing the earlier jitted radix_add would replay
        # the manylut trace (tuning.py CAVEAT)
        skl, ckl = jax.jit(lambda r: tt.make_key_pair(r, prel))(
            jax.random.PRNGKey(45))
        jax.block_until_ready(ckl.bootstrap_key.baked)
        ra3 = radix.encrypt_radix(jax.random.PRNGKey(46), skl, rav, 8)
        rb3 = radix.encrypt_radix(jax.random.PRNGKey(47), skl, rbv, 8)
        radd_rel = jax.jit(lambda c, a, b: radix.radix_add(c, a, b))
        out_r = radd_rel(ckl, ra3, rb3); jax.block_until_ready(out_r)
        t0 = time.time()
        out_r = radd_rel(ckl, out_r, rb3)
        jax.block_until_ready(out_r)
        dt = time.time() - t0
        got = np.asarray(radix.decrypt_radix(skl, out_r))
    emit("radix_adder8_words_per_sec_reliable", Wr / dt, "adds/s",
         {"correct": int((got == want).sum()), "of": Wr,
          "params": "128radix_reliable", "manylut": False,
          "model_failure_per_word": 1.6e-10})
    del ra3, rb3, out_r, skl, ckl

    # --- 5: 2-party MK NAND ---
    # The HEADLINE row runs the zero-error lownoise preset (the documented
    # default: the reference's own 2-party preset carries an intrinsic
    # ~1.5%/gate failure, docs/mk_noise_budget.md); the reference-fidelity
    # preset is measured separately and labeled.
    del ca, cb, out  # (bx/by freed before 3a; ck2/sk2 freed after 4b)

    def mk2_run(pmk, metric, extra=None):
        r = jax.random.PRNGKey(21)
        r_sh, r_e, ra, rb = jax.random.split(r, 4)
        shared = mk.make_shared_key(r_sh, pmk)
        sks, parts = [], []
        for rr in (ra, rb):
            r_sk, r_part = jax.random.split(rr)
            s = tt.make_secret_key(r_sk, pmk)
            sks.append(s)
            parts.append(mk.make_cloud_key_part(r_part, s, shared))
        t0 = time.time()
        mck = mk.make_mk_cloud_key(parts)
        jax.block_until_ready(mck.bootstrap_key.limbs)
        log(f"mk expansion ({metric}): {time.time() - t0:.1f}s")
        Bm = 4 if small else 4096
        m1 = jnp.arange(Bm) % 2 == 0
        e1 = mk.mk_encrypt(jax.random.PRNGKey(22), sks, m1)
        e2 = mk.mk_encrypt(jax.random.PRNGKey(23), sks, ~m1)
        mknand = jax.jit(mk.mk_gate_nand)
        out = mknand(mck, e1, e2); jax.block_until_ready(out)
        t0 = time.time()
        out = mknand(mck, out, e2)
        jax.block_until_ready(out)
        dt = time.time() - t0
        dec = np.asarray(mk.mk_decrypt(sks, out))
        want = ~(np.asarray(~(m1 & ~m1)) & np.asarray(~m1))
        rec = {"batch": Bm, "errors": int((dec != want).sum())}
        if extra:
            rec.update(extra)
        emit(metric, Bm / dt, "gates/s", rec)

    mk2_run(mk.mktfhe_parameters_toy(2) if small
            else mk.mktfhe_parameters_2party_lownoise(),
            "mk2_nand_throughput", {"preset": "2party_lownoise"})
    mk2_run(mk.mktfhe_parameters_toy(2) if small
            else mk.mktfhe_parameters_2party(),
            "mk2_nand_throughput_reference_preset",
            {"preset": "2party (reference fidelity; intrinsic ~1.5%/gate "
                       "failure, docs/mk_noise_budget.md)"})

    # --- 5b: 4-party MK NAND (party keys shardable across hosts) ---
    # (mk2 key material is function-local to mk2_run and already freed)
    pmk4 = mk.mktfhe_parameters_toy(4) if small else mk.mktfhe_parameters_4party()
    r = jax.random.PRNGKey(31)
    r_sh, *party_rngs = jax.random.split(r, 5)
    shared4 = mk.make_shared_key(r_sh, pmk4)
    sks4, parts4 = [], []
    for rr in party_rngs:
        r_sk, r_part = jax.random.split(rr)
        s = tt.make_secret_key(r_sk, pmk4)
        sks4.append(s)
        parts4.append(mk.make_cloud_key_part(r_part, s, shared4))
    t0 = time.time()
    mck4 = mk.make_mk_cloud_key(parts4)
    jax.block_until_ready(mck4.bootstrap_key.limbs)
    log(f"mk4 expansion: {time.time() - t0:.1f}s")
    B4 = 4 if small else 4096
    m4 = jnp.arange(B4) % 2 == 0
    f1 = mk.mk_encrypt(jax.random.PRNGKey(32), sks4, m4)
    f2 = mk.mk_encrypt(jax.random.PRNGKey(33), sks4, ~m4)
    mknand4 = jax.jit(mk.mk_gate_nand)
    out4 = mknand4(mck4, f1, f2); jax.block_until_ready(out4)
    t0 = time.time()
    out4 = mknand4(mck4, out4, f2)
    jax.block_until_ready(out4)
    dt = time.time() - t0
    dec4 = np.asarray(mk.mk_decrypt(sks4, out4))
    want4 = ~(np.asarray(~(m4 & ~m4)) & np.asarray(~m4))
    emit("mk4_nand_throughput", B4 / dt, "gates/s",
         {"batch": B4, "errors": int((dec4 != want4).sum())})

    # --- 5c: 8-party MK NAND (reference preset src/mk_api.jl:24-34) ---
    # The sparse-stored expanded key (~6.6 GB, nonzero blocks only) is the
    # only form that fits a 16 GB chip; wrapped so an OOM is recorded as a
    # documented artifact line rather than sinking the whole suite.
    del mck4, parts4, sks4, f1, f2, out4
    try:
        pmk8 = (mk.mktfhe_parameters_toy(8) if small
                else mk.mktfhe_parameters_8party())
        r = jax.random.PRNGKey(51)
        r_sh, *party_rngs8 = jax.random.split(r, 9)
        shared8 = mk.make_shared_key(r_sh, pmk8)
        sks8, parts8 = [], []
        for rr in party_rngs8:
            r_sk, r_part = jax.random.split(rr)
            s = tt.make_secret_key(r_sk, pmk8)
            sks8.append(s)
            parts8.append(mk.make_cloud_key_part(r_part, s, shared8))
        t0 = time.time()
        mck8 = mk.make_mk_cloud_key(parts8)
        jax.block_until_ready(mck8.bootstrap_key.limbs)
        log(f"mk8 expansion: {time.time() - t0:.1f}s "
            f"(sparse={mck8.bootstrap_key.sparse})")
        del parts8
        B8 = 4 if small else 1024
        m8 = jnp.arange(B8) % 2 == 0
        g1 = mk.mk_encrypt(jax.random.PRNGKey(52), sks8, m8)
        g2 = mk.mk_encrypt(jax.random.PRNGKey(53), sks8, ~m8)
        mknand8 = jax.jit(mk.mk_gate_nand)
        out8 = mknand8(mck8, g1, g2); jax.block_until_ready(out8)
        t0 = time.time()
        out8 = mknand8(mck8, out8, g2)
        jax.block_until_ready(out8)
        dt = time.time() - t0
        dec8 = np.asarray(mk.mk_decrypt(sks8, out8))
        want8 = ~(np.asarray(~(m8 & ~m8)) & np.asarray(~m8))
        emit("mk8_nand_throughput", B8 / dt, "gates/s",
             {"batch": B8, "errors": int((dec8 != want8).sum())})
    except Exception as e:  # document the failure mode in the artifact
        emit("mk8_nand_throughput", -1, "gates/s",
             {"error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
