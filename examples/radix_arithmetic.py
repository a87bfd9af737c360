"""Radix-mode encrypted arithmetic: min/add/compare of 16-bit words.

The radix counterpart of the reference walkthrough (reference:
examples/tutorial.jl encrypted-minimum): words are base-4 digit vectors in
the programmable-bootstrapping encoding (tfhe_tpu/radix.py), so the same
minimum costs ~2 blind rotations per bit instead of the bit-level
comparator chain's gate bootstraps, and an add costs exactly one rotation
per bit. Run on toy parameters by default (fast anywhere); pass
--production for the 128-bit preset (use a TPU).

Usage: python examples/radix_arithmetic.py [--production]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import tfhe_tpu as tt
from tfhe_tpu import radix


def main():
    production = "--production" in sys.argv
    params = tt.tfhe_parameters_128() if production else tt.tfhe_parameters_toy()
    rng = jax.random.PRNGKey(321)
    r_keys, r_a, r_b = jax.random.split(rng, 3)

    # [client] key generation + encryption (16-bit words -> 8 base-4 digits)
    secret_key, cloud_key = tt.make_key_pair(r_keys, params)
    a_plain, b_plain = 2017, 42
    ct_a = radix.encrypt_radix(r_a, secret_key, jnp.uint32(a_plain), 16)
    ct_b = radix.encrypt_radix(r_b, secret_key, jnp.uint32(b_plain), 16)

    # [server] homomorphic ops — sees only ciphertexts + the cloud key
    ct_min = radix.radix_min(cloud_key, ct_a, ct_b)
    ct_sum = radix.radix_add(cloud_key, ct_a, ct_b)
    ct_geq = radix.radix_geq(cloud_key, ct_a, ct_b)

    # [client] decryption
    got_min = int(radix.decrypt_radix(secret_key, ct_min))
    got_sum = int(radix.decrypt_radix(secret_key, ct_sum))
    got_geq = int(np.asarray(tt.pbs.decrypt_pbs(secret_key, ct_geq,
                                                radix.SPACE)))
    print(f"min({a_plain}, {b_plain}) = {got_min}")
    print(f"{a_plain} + {b_plain} = {got_sum} (mod 2^16)")
    print(f"[{a_plain} >= {b_plain}] = {got_geq}")
    assert got_min == min(a_plain, b_plain)
    assert got_sum == (a_plain + b_plain) % 65536
    assert got_geq == int(a_plain >= b_plain)


if __name__ == "__main__":
    main()
