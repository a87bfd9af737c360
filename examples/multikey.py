"""2-party multi-key NAND — MK ceremony example.

TPU-native port of the reference example (reference: examples/multikey.jl):
each party holds its own secret key; the server assembles an evaluation key
from the parties' public contributions and evaluates NAND on jointly
encrypted bits. Trust boundaries are annotated inline.

Usage: python examples/multikey.py [--production]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

import tfhe_tpu as tt
import tfhe_tpu.mk as mk


def main():
    production = "--production" in sys.argv
    parties = 2
    params = (
        mk.mktfhe_parameters_2party() if production
        else mk.mktfhe_parameters_toy(parties)
    )
    rng = jax.random.PRNGKey(0)
    r_shared, r_trials, *r_parties = jax.random.split(rng, 2 + parties)

    # [server] the shared key
    shared_key = mk.make_shared_key(r_shared, params)

    # [each party, independently] secret key + cloud key part
    secret_keys, parts = [], []
    for p in range(parties):
        r_sk, r_part = jax.random.split(r_parties[p])
        sk = tt.make_secret_key(r_sk, params)
        secret_keys.append(sk)
        parts.append(mk.make_cloud_key_part(r_part, sk, shared_key))

    # [server] assembly — only public material crosses this boundary
    cloud_key = mk.make_mk_cloud_key(parts)

    trials = 10
    r_bits, r_e1, r_e2 = jax.random.split(r_trials, 3)
    m1 = jax.random.bernoulli(r_bits, shape=(trials,))
    m2 = ~m1
    enc1 = mk.mk_encrypt(r_e1, secret_keys, m1)
    enc2 = mk.mk_encrypt(r_e2, secret_keys, m2)

    enc_out = mk.mk_gate_nand(cloud_key, enc1, enc2)
    out = np.asarray(mk.mk_decrypt(secret_keys, enc_out))
    want = ~(np.asarray(m1) & np.asarray(m2))
    for t in range(trials):
        print(f"Trial {t}: {bool(m1[t])} NAND {bool(m2[t])} = {bool(out[t])}")
    assert (out == want).all()
    print("all trials correct")

    # Distributed decryption: no secret key ever leaves its party — each
    # publishes one smudged share and anyone combines them. A BOOTSTRAPPED
    # 2-party ciphertext carries ~0.05 phase noise, so smudging-lemma
    # flooding is impossible on the 32-bit torus (the calibrated
    # statistical_security mode would refuse); the explicit stddev floods
    # at the fresh-encryption scale and the docstring's budget notes apply.
    shares = [
        mk.mk_partial_decrypt(jax.random.PRNGKey(900 + p),
                              secret_keys[p], enc_out, p,
                              smudging_stddev=2.0**-15)
        for p in range(parties)
    ]
    dist = np.asarray(mk.mk_combine_shares(enc_out, shares))
    assert (dist == want).all()
    print("distributed decryption matches")


if __name__ == "__main__":
    main()
