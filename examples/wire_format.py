"""Wire formats: seeded keys/ciphertexts and public-key encryption.

The flow a deployment actually runs: a client generates keys, ships the
server a SEEDED evaluation key (a fraction of the expanded size) plus a
seeded public key; untrusted writers encrypt with the public key; the
server computes on gates; the client decrypts. The reference has no wire
format at all (SURVEY.md section 5) — sizes printed here are the artifact
bytes actually shipped.

Usage: python examples/wire_format.py [--production]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import tfhe_tpu as tt
    from tfhe_tpu import compressed, public
    from tfhe_tpu.utils import serialization

    production = "--production" in sys.argv
    params = tt.tfhe_parameters_80() if production else tt.tfhe_parameters_toy()

    # [client] keygen: everything that travels is a seeded artifact
    sk = tt.make_secret_key(jax.random.PRNGKey(0), params)
    seeded_ck = compressed.make_seeded_cloud_key(jax.random.PRNGKey(1), sk)
    seeded_pk = public.make_public_key_seeded(jax.random.PRNGKey(2), sk)
    ck_wire = serialization.dumps(seeded_ck)
    pk_wire = serialization.dumps(seeded_pk)

    # [server] expand once into the baked, jit-ready forms
    ck = compressed.expand_cloud_key(serialization.loads(ck_wire))
    full_ck_bytes = len(serialization.dumps(ck))
    print(f"evaluation key wire: {len(ck_wire):,} B "
          f"(expanded serialized: {full_ck_bytes:,} B, "
          f"{full_ck_bytes / len(ck_wire):.0f}x)")

    # [any writer] encrypt with the public key — no secret key involved
    pk = public.expand_public_key(serialization.loads(pk_wire))
    full_pk = public.make_public_key(jax.random.PRNGKey(2), sk)
    print(f"public key wire: {len(pk_wire):,} B "
          f"(unseeded: {len(serialization.dumps(full_pk)):,} B)")
    xs = jnp.asarray([True, True, False, False])
    ys = jnp.asarray([True, False, True, False])
    ct_x = public.encrypt_public(jax.random.PRNGKey(3), pk, xs)
    ct_y = public.encrypt_public(jax.random.PRNGKey(4), pk, ys)

    # [client] a seeded ciphertext batch: one torus word per bit
    seeded_bits = compressed.encrypt_seeded(jax.random.PRNGKey(5), sk, xs)
    bit_wire = serialization.dumps(seeded_bits)
    full_bits = serialization.dumps(compressed.expand_lwe(seeded_bits))
    print(f"4-bit ciphertext wire: {len(bit_wire):,} B "
          f"(unseeded: {len(full_bits):,} B)")

    # [server] compute; [client] decrypt
    out = tt.gate_and(ck, ct_x, ct_y)
    got = np.asarray(tt.decrypt(sk, out))
    want = np.asarray(xs & ys)
    print(f"AND over public-key inputs: {got.tolist()} "
          f"(expected {want.tolist()})")
    assert (got == want).all()
    print("ok")


if __name__ == "__main__":
    main()
