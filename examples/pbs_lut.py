"""Programmable bootstrapping — evaluate a lookup table under encryption.

Beyond the reference's boolean gates (its bootstrap is sign-only,
reference: src/bootstrap.jl:69-82), the blind rotation can evaluate an
arbitrary S-entry function in ONE bootstrap by encoding the table into the
test polynomial. Here the client encrypts digits in [0, 4); the server —
holding only the cloud key — applies f and then g from plaintext tables;
the client decrypts g(f(m)). Outputs carry the same encoding, so table
evaluations chain indefinitely (each bootstrap refreshes noise).

Usage: python examples/pbs_lut.py [--production]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import tfhe_tpu as tt
from tfhe_tpu import pbs


def main():
    production = "--production" in sys.argv
    params = tt.tfhe_parameters_80() if production else tt.tfhe_parameters_toy()
    r_keys, r_enc = jax.random.split(jax.random.PRNGKey(123))

    # [client] keys + encrypted digits
    secret_key, cloud_key = tt.make_key_pair(r_keys, params)
    space = 4
    digits = jnp.asarray([0, 1, 2, 3, 3, 1], jnp.int32)
    ct = pbs.encrypt_pbs(r_enc, secret_key, digits, space)

    # [server] two plaintext tables, applied under encryption
    f = jnp.asarray([2, 0, 3, 1], jnp.int32)   # some permutation
    g = jnp.asarray([1, 1, 0, 2], jnp.int32)   # some lossy map
    bk, ks = cloud_key.bootstrap_key, cloud_key.keyswitch_key
    ct_f = pbs.programmable_bootstrap(bk, ks, f, ct, space)
    ct_gf = pbs.programmable_bootstrap(bk, ks, g, ct_f, space)

    # [client] decrypt and check
    got = np.asarray(pbs.decrypt_pbs(secret_key, ct_gf, space))
    want = np.asarray(g)[np.asarray(f)[np.asarray(digits)]]
    print(f"digits     : {np.asarray(digits)}")
    print(f"g(f(m))    : {got}")
    print(f"plaintext  : {want}")
    assert (got == want).all(), "decryption mismatch"
    print("OK: two chained encrypted table evaluations decrypt correctly")


if __name__ == "__main__":
    main()
