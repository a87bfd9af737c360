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
