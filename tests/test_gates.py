"""End-to-end gate correctness: encrypt -> bootstrapped gate -> decrypt.

Mirrors the reference's exhaustive truth-table strategy
(reference: test/runtests.jl:8-40): for every gate and every input
combination, decrypt(gate(encrypt(bits))) must equal the boolean reference
function. Fast versions run on toy parameters (the arithmetic is exact at
every size; noise margins checked in test_noise below); production presets
are exercised in test_production_params.py (slow).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import gates


GATES_2IN = [
    (gates.gate_nand, lambda x, y: not (x and y)),
    (gates.gate_or, lambda x, y: x or y),
    (gates.gate_and, lambda x, y: x and y),
    (gates.gate_xor, lambda x, y: x != y),
    (gates.gate_xnor, lambda x, y: x == y),
    (gates.gate_nor, lambda x, y: not (x or y)),
    (gates.gate_andny, lambda x, y: (not x) and y),
    (gates.gate_andyn, lambda x, y: x and (not y)),
    (gates.gate_orny, lambda x, y: (not x) or y),
    (gates.gate_oryn, lambda x, y: x or (not y)),
]


@pytest.fixture(scope="module")
def toy_keys():
    params = tt.tfhe_parameters_toy()
    rng = jax.random.PRNGKey(123)
    return tt.make_key_pair(rng, params)


def _encrypt_bits(sk, bits, seed=0):
    return tt.encrypt(jax.random.PRNGKey(seed), sk, jnp.asarray(bits, bool))


def test_encrypt_decrypt_roundtrip(toy_keys):
    sk, _ = toy_keys
    bits = jnp.asarray([True, False, True, True, False], bool)
    ct = _encrypt_bits(sk, bits)
    out = tt.decrypt(sk, ct)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_all_two_input_gates_truth_table(toy_keys):
    """All 10 bootstrapped 2-input gates, all 4 input combos, in ONE batch."""
    sk, ck = toy_keys
    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    ct_x = _encrypt_bits(sk, xs, seed=1)
    ct_y = _encrypt_bits(sk, ys, seed=2)
    for gate_fn, ref_fn in GATES_2IN:
        out = tt.decrypt(sk, gate_fn(ck, ct_x, ct_y))
        want = [ref_fn(bool(x), bool(y)) for x, y in zip(xs, ys)]
        np.testing.assert_array_equal(
            np.asarray(out), want, err_msg=gate_fn.__name__
        )


def test_gate_not(toy_keys):
    sk, ck = toy_keys
    bits = jnp.asarray([True, False], bool)
    ct = _encrypt_bits(sk, bits, seed=3)
    out = tt.decrypt(sk, gates.gate_not(ck, ct))
    np.testing.assert_array_equal(np.asarray(out), [False, True])


def test_gate_constant(toy_keys):
    sk, ck = toy_keys
    for value in (True, False):
        out = tt.decrypt(sk, gates.gate_constant(ck, value))
        assert bool(out) == value


def test_gate_mux_truth_table(toy_keys):
    """MUX(x, y, z) = x ? y : z over all 8 combos in one batch."""
    sk, ck = toy_keys
    combos = [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)]
    xs, ys, zs = (jnp.asarray(v, bool) for v in zip(*combos))
    ct_x = _encrypt_bits(sk, xs, seed=4)
    ct_y = _encrypt_bits(sk, ys, seed=5)
    ct_z = _encrypt_bits(sk, zs, seed=6)
    out = tt.decrypt(sk, gates.gate_mux(ck, ct_x, ct_y, ct_z))
    want = [(y if x else z) for x, y, z in combos]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want, bool))


def test_gates_jit_compatible(toy_keys):
    """Gates compile under jit with the CloudKey as a pytree argument."""
    sk, ck = toy_keys
    jitted = jax.jit(gates.gate_nand)
    xs = jnp.asarray([True, False], bool)
    ct_x = _encrypt_bits(sk, xs, seed=7)
    ct_y = _encrypt_bits(sk, ~xs, seed=8)
    out = tt.decrypt(sk, jitted(ck, ct_x, ct_y))
    np.testing.assert_array_equal(np.asarray(out), [True, True])


def test_noise_margin(toy_keys):
    """Decrypt-phase distance from the decision boundary stays healthy after a
    gate (contract: message +-1/8, noise < 1/16 — src/gates.jl:1-6)."""
    sk, ck = toy_keys
    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    out = gates.gate_nand(ck, _encrypt_bits(sk, xs, 9), _encrypt_bits(sk, ys, 10))
    phase = np.asarray(tt.lwe_phase(out, sk.key)).astype(np.int64)
    mu = 2**29  # encode(1, 8)
    err = np.abs(np.abs(phase) - mu)
    assert (np.abs(phase) > 0).all()
    # noise < 1/16 of the torus = 2^28
    assert (err < 2**28).all(), err / 2**32


def test_noise_margin_telemetry(toy_keys):
    """utils.telemetry reports healthy margins for fresh gate outputs."""
    from tfhe_tpu.utils import telemetry

    sk, ck = toy_keys
    xs = jnp.asarray([False, True], bool)
    out = gates.gate_nand(ck, _encrypt_bits(sk, xs, 11), _encrypt_bits(sk, ~xs, 12))
    report = telemetry.noise_margin(sk, out, expected=[True, True])
    assert report.failures == 0
    assert report.healthy()
