"""Production-preset tests (slow: full-size keygen + bootstrap on CPU).

Mirrors the reference's test strategy at the sizes the reference tests
(test/runtests.jl:26-40: the FULL 12-gate truth table at the default 80-bit
preset; :43-57: NAND at the 128-bit preset), plus MUX at production size —
which the reference exercises in the same exhaustive table. One key pair per
preset (module-scoped: keygen is the expensive part), every input
combination checked.

Run explicitly with `-m slow` or via the TPU benchmark path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import gates

pytestmark = pytest.mark.slow


GATES_2IN = [
    ("nand", gates.gate_nand, lambda x, y: ~(x & y)),
    ("or", gates.gate_or, lambda x, y: x | y),
    ("and", gates.gate_and, lambda x, y: x & y),
    ("xor", gates.gate_xor, lambda x, y: x ^ y),
    ("xnor", gates.gate_xnor, lambda x, y: ~(x ^ y)),
    ("nor", gates.gate_nor, lambda x, y: ~(x | y)),
    ("andny", gates.gate_andny, lambda x, y: ~x & y),
    ("andyn", gates.gate_andyn, lambda x, y: x & ~y),
    ("orny", gates.gate_orny, lambda x, y: ~x | y),
    ("oryn", gates.gate_oryn, lambda x, y: x | ~y),
]


@pytest.fixture(scope="module")
def keys80():
    return tt.make_key_pair(jax.random.PRNGKey(123), tt.tfhe_parameters_80())


@pytest.fixture(scope="module")
def enc80(keys80):
    sk, _ = keys80
    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    return (
        tt.encrypt(jax.random.PRNGKey(1), sk, xs),
        tt.encrypt(jax.random.PRNGKey(2), sk, ys),
        np.asarray(xs),
        np.asarray(ys),
    )


@pytest.mark.parametrize("name,gate,ref", GATES_2IN, ids=[g[0] for g in GATES_2IN])
def test_gate_truth_table_80(keys80, enc80, name, gate, ref):
    """Reference: test/runtests.jl:26-40 (exhaustive table, default preset)."""
    sk, ck = keys80
    ct_x, ct_y, xs, ys = enc80
    out = tt.decrypt(sk, gate(ck, ct_x, ct_y))
    np.testing.assert_array_equal(np.asarray(out), ref(xs, ys), err_msg=name)


def test_not_and_constant_80(keys80, enc80):
    sk, ck = keys80
    ct_x, _, xs, _ = enc80
    out = tt.decrypt(sk, gates.gate_not(ck, ct_x))
    np.testing.assert_array_equal(np.asarray(out), ~xs)
    const = gates.gate_constant(ck, jnp.asarray([True, False], bool),
                                batch_shape=(2,))
    np.testing.assert_array_equal(np.asarray(tt.decrypt(sk, const)),
                                  [True, False])


def test_mux_truth_table_80(keys80):
    """All 8 input combinations of the 3-input MUX at production size
    (reference: test/runtests.jl:8-21 lists mux in the same table)."""
    sk, ck = keys80
    a = jnp.asarray([False] * 4 + [True] * 4, bool)
    b = jnp.asarray(([False] * 2 + [True] * 2) * 2, bool)
    c = jnp.asarray([False, True] * 4, bool)
    ct_a = tt.encrypt(jax.random.PRNGKey(3), sk, a)
    ct_b = tt.encrypt(jax.random.PRNGKey(4), sk, b)
    ct_c = tt.encrypt(jax.random.PRNGKey(5), sk, c)
    out = tt.decrypt(sk, gates.gate_mux(ck, ct_a, ct_b, ct_c))
    want = np.where(np.asarray(a), np.asarray(b), np.asarray(c))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_nand_truth_table_128():
    """Reference: test/runtests.jl:43-57 (128-bit preset, NAND only)."""
    params = tt.tfhe_parameters_128()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), params)
    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
    ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, ys)
    out = tt.decrypt(sk, gates.gate_nand(ck, ct_x, ct_y))
    np.testing.assert_array_equal(np.asarray(out), [True, True, True, False])


def test_radix_add_128():
    """Radix (base-4 digit) adder at the 128-bit preset: the 1/(4S) = 1/32
    margin holds production noise (see tfhe_tpu/radix.py docstring)."""
    from tfhe_tpu import radix

    params = tt.tfhe_parameters_128()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(321), params)
    a = np.asarray([0, 255, 170, 99], np.int32)
    b = np.asarray([0, 1, 85, 201], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(11), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(12), sk, jnp.asarray(b), 8)
    out = radix.radix_add(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, out)), (a + b) % 256)


@pytest.fixture(scope="module")
def keys128fast():
    return tt.make_key_pair(
        jax.random.PRNGKey(123), tt.tfhe_parameters_128_fast())


def test_nand_truth_table_128_fast(keys128fast):
    """The TPU-retuned 128-bit preset (k=2, N=512, l=2, b=8): same decrypt
    contract as the reference preset (tools/derive_fast_params.py)."""
    sk, ck = keys128fast
    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
    ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, ys)
    out = tt.decrypt(sk, gates.gate_nand(ck, ct_x, ct_y))
    np.testing.assert_array_equal(np.asarray(out), [True, True, True, False])


def test_xor_chain_128_fast(keys128fast):
    """XOR (the widest noise amplification, 2x per input) chained through a
    second gate at the fast preset — exercises the full gate contract
    (output of one gate is a valid input to the next)."""
    sk, ck = keys128fast
    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    ct_x = tt.encrypt(jax.random.PRNGKey(3), sk, xs)
    ct_y = tt.encrypt(jax.random.PRNGKey(4), sk, ys)
    mid = gates.gate_xor(ck, ct_x, ct_y)
    out = tt.decrypt(sk, gates.gate_xor(ck, mid, ct_y))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(xs))  # (x ^ y) ^ y == x


def test_radix_add_128_radix_preset():
    """Radix adder on `tfhe_parameters_128_radix` (balanced gadget +
    ks l=4 base 16): decrypt-exact at production size — exercises the
    retuned keyswitch gadget end to end."""
    from tfhe_tpu import radix

    params = tt.tfhe_parameters_128_radix()
    assert params.gadget_balanced and params.ks_decomp_length == 4
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(654), params)
    a = np.asarray([0, 255, 170, 99], np.int32)
    b = np.asarray([0, 1, 85, 201], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(21), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(22), sk, jnp.asarray(b), 8)
    out = radix.radix_add(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, out)), (a + b) % 256)


def test_radix_add_128_radix_reliable_no_manylut():
    """`tfhe_parameters_128_radix_reliable` with the stacked two-rotation
    LUT path (manylut off) — the <=1e-9/word configuration."""
    from tfhe_tpu import radix, tuning

    params = tt.tfhe_parameters_128_radix_reliable()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(655), params)
    a = np.asarray([17, 255], np.int32)
    b = np.asarray([240, 255], np.int32)
    xa = radix.encrypt_radix(jax.random.PRNGKey(23), sk, jnp.asarray(a), 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(24), sk, jnp.asarray(b), 8)
    with tuning.override(radix_manylut=False):
        out = radix.radix_add(ck, xa, xb)
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, out)), (a + b) % 256)
