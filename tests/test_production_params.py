"""Production-preset smoke tests (slow: full-size keygen + bootstrap on CPU).

Mirrors the reference's 128-bit parameter test (test/runtests.jl:43-57) and
the default-preset NAND truth table (test/runtests.jl:26-40), at batch=4.
Run explicitly with `-m slow` or in the TPU benchmark path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import gates

pytestmark = pytest.mark.slow


@pytest.mark.parametrize(
    "preset", [tt.tfhe_parameters_80, tt.tfhe_parameters_128]
)
def test_nand_truth_table(preset):
    params = preset()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), params)
    xs = jnp.asarray([False, False, True, True], bool)
    ys = jnp.asarray([False, True, False, True], bool)
    ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, xs)
    ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, ys)
    out = tt.decrypt(sk, gates.gate_nand(ck, ct_x, ct_y))
    np.testing.assert_array_equal(np.asarray(out), [True, True, True, False])
