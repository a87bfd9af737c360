"""Encrypted minimum of two 16-bit integers — tutorial-parity example.

TPU-native port of the reference walkthrough (reference:
examples/tutorial.jl): client makes a key pair and encrypts two 16-bit
words; the server computes min(a, b) homomorphically via an XNOR/MUX
comparator chain; the client decrypts. Run on toy parameters by default
(fast anywhere); pass --production for the 80-bit preset (use a TPU).

Usage: python examples/tutorial.py [--production]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import tfhe_tpu as tt
from tfhe_tpu import circuits


def main():
    production = "--production" in sys.argv
    params = tt.tfhe_parameters_80() if production else tt.tfhe_parameters_toy()
    rng = jax.random.PRNGKey(123)
    r_keys, r_a, r_b = jax.random.split(rng, 3)

    # [client] key generation + encryption
    secret_key, cloud_key = tt.make_key_pair(r_keys, params)
    a_plain, b_plain = 2017, 42
    ct_a = circuits.encrypt_word(r_a, secret_key, jnp.uint32(a_plain), 16)
    ct_b = circuits.encrypt_word(r_b, secret_key, jnp.uint32(b_plain), 16)

    # [server] homomorphic minimum — sees only ciphertexts + the cloud key
    ct_min = circuits.encrypted_minimum(cloud_key, ct_a, ct_b)

    # [client] decryption
    answer = int(circuits.decrypt_word(secret_key, ct_min))
    print(f"min({a_plain}, {b_plain}) = {answer}")
    assert answer == min(a_plain, b_plain)


if __name__ == "__main__":
    main()
