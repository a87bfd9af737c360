"""Netlist scheduler (C++ + Python fallback) and batched circuit execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import netlist


def build_adder(circ: netlist.Circuit, a_wires, b_wires):
    """Ripple-carry adder netlist; returns sum wires."""
    bits = len(a_wires)
    carry = None
    out = []
    for i in range(bits):
        axb = circ.xor(a_wires[i], b_wires[i])
        if carry is None:
            out.append(axb)
            carry = circ.and_(a_wires[i], b_wires[i])
        else:
            out.append(circ.xor(axb, carry))
            if i + 1 < bits:
                carry = circ.mux(axb, carry, a_wires[i])
    return out


def test_schedulers_agree():
    circ = netlist.Circuit()
    a = circ.inputs(8)
    b = circ.inputs(8)
    build_adder(circ, a, b)
    native = circ.compile(use_native=True) if netlist._native_lib() else None
    py = circ.compile(use_native=False)
    assert py.n_batches > 0
    if native is not None:
        np.testing.assert_array_equal(native.gate_order, py.gate_order)
        np.testing.assert_array_equal(native.batch_start, py.batch_start)
        np.testing.assert_array_equal(native.batch_type, py.batch_type)
        np.testing.assert_array_equal(native.batch_level, py.batch_level)


def test_native_scheduler_builds():
    assert netlist._native_lib() is not None, "C++ scheduler failed to build"


def test_cycle_detection():
    circ = netlist.Circuit()
    w1 = circ.input()
    # forge a cycle: gate reads its own output
    out = circ._gate("and", (w1, w1))
    circ.fanin[-1] = (out, w1, -1)
    with pytest.raises(ValueError, match="cycle"):
        circ.compile(use_native=False)
    if netlist._native_lib():
        with pytest.raises(ValueError, match="cycle"):
            circ.compile(use_native=True)


def test_batching_merges_same_level_gates():
    """8 independent XORs at level 0 must form ONE batch."""
    circ = netlist.Circuit()
    for _ in range(8):
        x, y = circ.input(), circ.input()
        circ.xor(x, y)
    sched = circ.compile()
    assert sched.n_batches == 1
    assert sched.batch_start[1] - sched.batch_start[0] == 8


def test_encrypted_adder_via_netlist():
    """Batched netlist execution computes the same sums as plaintext."""
    params = tt.tfhe_parameters_toy()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), params)

    circ = netlist.Circuit()
    a_w = circ.inputs(8)
    b_w = circ.inputs(8)
    sum_w = build_adder(circ, a_w, b_w)
    sched = circ.compile()

    a_vals = np.asarray([13, 250], np.uint32)
    b_vals = np.asarray([29, 77], np.uint32)
    from tfhe_tpu import circuits

    ct_a = circuits.encrypt_word(jax.random.PRNGKey(1), sk, a_vals, 8)
    ct_b = circuits.encrypt_word(jax.random.PRNGKey(2), sk, b_vals, 8)
    from tfhe_tpu.lwe import LweSample

    inputs = {}
    for i in range(8):
        inputs[a_w[i]] = LweSample(ct_a.a[:, i], ct_a.b[:, i], ct_a.cv[:, i])
        inputs[b_w[i]] = LweSample(ct_b.a[:, i], ct_b.b[:, i], ct_b.cv[:, i])

    state = sched.run(ck, inputs, batch_shape=(2,))
    out_bits = np.stack(
        [np.asarray(tt.decrypt(sk, sched.wire(state, w))) for w in sum_w],
        axis=-1,
    )
    got = circuits.bits_to_int(jnp.asarray(out_bits))
    np.testing.assert_array_equal(np.asarray(got), (a_vals + b_vals) % 256)


def _random_layered_circuit(rng, width, depth, fan=2):
    """Random layered DAG: `width` new gates per level reading the previous
    level(s); returns (circuit, inputs, last_level_wires)."""
    circ = netlist.Circuit()
    prev = circ.inputs(width)
    ins = list(prev)
    names = ["nand", "xor", "and_", "or_"]
    for _ in range(depth):
        cur = []
        for _ in range(width):
            x, y = rng.choice(prev, 2)
            cur.append(getattr(circ, names[rng.integers(len(names))])(
                int(x), int(y)))
        prev = cur
    return circ, ins, prev


def _check_slots_valid(circ, sched, keep):
    """No two simultaneously-live wires may share a slot (replay check)."""
    fanin = np.asarray(circ.fanin, np.int32)
    outw = np.asarray(circ.out_wire, np.int32)
    slot_owner = {}
    # primary inputs live from the start
    written = set(int(w) for w in outw)
    for w in range(circ.n_wires):
        if w not in written:
            s = int(sched.wire_slot[w])
            if s >= 0:
                assert s not in slot_owner, (w, s)
                slot_owner[s] = w
    live_value = {w: ("in", w) for w in slot_owner.values()}
    for bi in range(sched.n_batches):
        lo, hi = int(sched.batch_start[bi]), int(sched.batch_start[bi + 1])
        for g in sched.gate_order[lo:hi]:
            for w in fanin[g]:
                if w >= 0:  # the input wire's slot must still hold IT
                    assert live_value.get(int(w)) is not None, int(w)
        for g in sched.gate_order[lo:hi]:
            w = int(outw[g])
            s = int(sched.wire_slot[w])
            # overwriting a slot kills whatever lived there
            for ww, _ in [(k, v) for k, v in live_value.items()
                          if int(sched.wire_slot[k]) == s]:
                del live_value[ww]
            live_value[w] = ("g", int(g))
    for w in keep:
        assert live_value.get(int(w)) is not None, int(w)


def test_slot_allocators_agree_and_are_valid():
    rng = np.random.default_rng(3)
    circ, ins, outs = _random_layered_circuit(rng, width=16, depth=12)
    keep = outs[:4]
    if netlist._native_lib():
        nat = circ.compile(use_native=True, outputs=keep)
        py = circ.compile(use_native=False, outputs=keep)
        np.testing.assert_array_equal(nat.wire_slot, py.wire_slot)
        assert nat.n_slots == py.n_slots
        sched = nat
    else:
        sched = circ.compile(use_native=False, outputs=keep)
    assert sched.n_slots < circ.n_wires / 3  # dead wires actually reused
    _check_slots_valid(circ, sched, keep)


def test_scale_100k_gates_schedules_fast():
    """>= 1e5 gates: native schedule + slot assignment under a second, and
    the streamed state is bounded by the live width, not the wire count."""
    import time

    if not netlist._native_lib():
        pytest.skip("native scheduler unavailable")
    rng = np.random.default_rng(0)
    width, depth = 200, 500  # 100,000 gates
    t0 = time.time()
    circ, ins, outs = _random_layered_circuit(rng, width, depth)
    build_secs = time.time() - t0
    t0 = time.time()
    sched = circ.compile(use_native=True, outputs=outs)
    dt = time.time() - t0
    assert len(circ.gate_type) == width * depth
    assert dt < 1.0, f"native schedule took {dt:.2f}s (build {build_secs:.1f}s)"
    # peak memory: live width ~ 2 levels + inputs, nowhere near 100k wires
    assert sched.n_slots <= 3 * width + len(ins)
    _ = sched.wire(  # wire lookup works through the slot map
        tt.lwe.LweSample(
            jnp.zeros((sched.n_slots, 4), jnp.int32),
            jnp.zeros(sched.n_slots, jnp.int32),
            jnp.zeros(sched.n_slots, jnp.float32),
        ),
        outs[0],
    )


def test_streamed_run_matches_dense_and_consts():
    """Slot-streamed execution == dense execution, with const gates mixed in."""
    params = tt.tfhe_parameters_toy()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(5), params)

    circ = netlist.Circuit()
    a, b = circ.inputs(2)
    one = circ.const_(True)
    zero = circ.const_(False)
    s1 = circ.xor(a, b)
    s2 = circ.and_(s1, one)     # = s1
    s3 = circ.or_(s2, zero)     # = s1
    s4 = circ.nand(s3, a)
    out_w = circ.mux(s4, s1, b)

    bits_a = jnp.asarray([False, True, False, True], bool)
    bits_b = jnp.asarray([False, False, True, True], bool)
    ct_a = tt.encrypt(jax.random.PRNGKey(1), sk, bits_a)
    ct_b = tt.encrypt(jax.random.PRNGKey(2), sk, bits_b)
    inputs = {a: ct_a, b: ct_b}

    dense = circ.compile()
    want_state = dense.run(ck, inputs, batch_shape=(4,))
    want = np.asarray(tt.decrypt(sk, dense.wire(want_state, out_w)))

    streamed = circ.compile(outputs=[out_w])
    assert streamed.n_slots < circ.n_wires
    got_state = streamed.run(ck, inputs, batch_shape=(4,))
    got = np.asarray(tt.decrypt(sk, streamed.wire(got_state, out_w)))
    np.testing.assert_array_equal(got, want)

    # plaintext reference
    na, nb = np.asarray(bits_a), np.asarray(bits_b)
    s1p = na ^ nb
    s4p = ~(s1p & na)
    np.testing.assert_array_equal(want, np.where(s4p, s1p, nb))


def test_kogge_stone_adder_matches_plaintext_and_is_shallow():
    """Parallel-prefix adder: correct sums, log-depth schedule."""
    params = tt.tfhe_parameters_toy()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), params)

    bits = 8
    circ_ks = netlist.Circuit()
    a_w = circ_ks.inputs(bits)
    b_w = circ_ks.inputs(bits)
    sum_w = netlist.build_kogge_stone_adder(circ_ks, a_w, b_w)
    sched = circ_ks.compile(outputs=sum_w)

    circ_r = netlist.Circuit()
    ar = circ_r.inputs(bits)
    br = circ_r.inputs(bits)
    netlist.build_ripple_adder(circ_r, ar, br)
    sched_r = circ_r.compile()

    # the point of the prefix form: far fewer scheduled batches
    assert max(sched.batch_level) + 1 <= 2 + 2 * bits.bit_length()
    assert max(sched.batch_level) < max(sched_r.batch_level)

    a_vals = np.asarray([13, 250, 0, 255], np.uint32)
    b_vals = np.asarray([29, 77, 255, 255], np.uint32)
    from tfhe_tpu import circuits
    from tfhe_tpu.lwe import LweSample

    ct_a = circuits.encrypt_word(jax.random.PRNGKey(1), sk, a_vals, bits)
    ct_b = circuits.encrypt_word(jax.random.PRNGKey(2), sk, b_vals, bits)
    inputs = {}
    for i in range(bits):
        inputs[a_w[i]] = LweSample(ct_a.a[:, i], ct_a.b[:, i], ct_a.cv[:, i])
        inputs[b_w[i]] = LweSample(ct_b.a[:, i], ct_b.b[:, i], ct_b.cv[:, i])
    state = sched.run(ck, inputs, batch_shape=(4,))
    out_bits = np.stack(
        [np.asarray(tt.decrypt(sk, sched.wire(state, w))) for w in sum_w],
        axis=-1)
    got = circuits.bits_to_int(jnp.asarray(out_bits))
    np.testing.assert_array_equal(np.asarray(got), (a_vals + b_vals) % 256)
