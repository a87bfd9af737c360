"""Proxy re-encryption: switch ciphertexts between users' keys server-side.

A re-keying key is exactly an LWE keyswitch key from the old secret key to
the new one (reference keyswitch machinery: src/keyswitch.jl:1-80 — the
reference only ever switches from the extracted TLWE key back to the same
user's LWE key; pointing the same table between two USERS' keys gives
delegation: the holder of `old` authorizes the server to re-address their
ciphertexts to `new` without decrypting). Adds one keyswitch of noise per
hop, so re-keyed ciphertexts feed gates exactly like bootstrap outputs do.

The key generation is client-side (needs `old.key` plaintext); the server
only ever sees the table. The seeded wire form (`compressed.
keyswitch_key_gen_seeded`) applies verbatim — `make_rekey_key_seeded`
ships ~100 KB at the shipped presets.
"""

from __future__ import annotations

import jax

from .api import SecretKey
from .compressed import SeededKeyswitchKey, keyswitch_key_gen_seeded
from .keyswitch import KeyswitchKey, keyswitch, keyswitch_key_gen
from .lwe import LweSample


def make_rekey_key(rng, old: SecretKey, new: SecretKey) -> KeyswitchKey:
    """Keyswitch table Enc_new(s_old[i] * h / B^j): authorizes old -> new."""
    assert old.params == new.params, "re-keying needs matching parameters"
    p = old.params
    return keyswitch_key_gen(
        rng, p.ks_noise_stddev, old.key, new.key,
        p.ks_decomp_length, p.ks_log2_base,
    )


def make_rekey_key_seeded(rng, old: SecretKey,
                          new: SecretKey) -> SeededKeyswitchKey:
    """Seeded wire form of the re-keying key (bit-identical expansion)."""
    assert old.params == new.params, "re-keying needs matching parameters"
    p = old.params
    return keyswitch_key_gen_seeded(
        rng, p.ks_noise_stddev, old.key, new.key,
        p.ks_decomp_length, p.ks_log2_base,
    )


def rekey(key: KeyswitchKey, sample: LweSample) -> LweSample:
    """Re-address a ciphertext batch to the new key (no decryption)."""
    return keyswitch(key, sample)
