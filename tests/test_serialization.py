"""Round-trip serialization of keys and ciphertexts (SURVEY.md section 5 gap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
import tfhe_tpu.mk as mk
from tfhe_tpu.utils import serialization as ser


@pytest.fixture(scope="module")
def toy_keys():
    return tt.make_key_pair(jax.random.PRNGKey(123), tt.tfhe_parameters_toy())


def test_secret_key_roundtrip(toy_keys, tmp_path):
    sk, _ = toy_keys
    p = tmp_path / "sk.tfhe"
    ser.save(sk, str(p))
    sk2 = ser.load(str(p))
    assert sk2.params == sk.params
    np.testing.assert_array_equal(np.asarray(sk2.key), np.asarray(sk.key))


def test_cloud_key_and_ciphertext_roundtrip(toy_keys, tmp_path):
    """A reloaded cloud key must evaluate gates on a reloaded ciphertext."""
    sk, ck = toy_keys
    bits = jnp.asarray([True, False], bool)
    ct = tt.encrypt(jax.random.PRNGKey(1), sk, bits)

    ck2 = ser.loads(ser.dumps(ck))
    ct2 = ser.loads(ser.dumps(ct))
    np.testing.assert_array_equal(np.asarray(ct2.a), np.asarray(ct.a))

    out = tt.gates.gate_nand(ck2, ct2, ct2)  # NAND(x,x) == NOT x
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(sk, out)), [False, True]
    )


def test_mk_cloud_key_part_roundtrip(tmp_path):
    """The MK ceremony's party->server wire format round-trips."""
    params = mk.mktfhe_parameters_toy(2)
    r = jax.random.PRNGKey(5)
    r_sh, r_sk, r_part = jax.random.split(r, 3)
    shared = mk.make_shared_key(r_sh, params)
    sk = tt.make_secret_key(r_sk, params)
    part = mk.make_cloud_key_part(r_part, sk, shared)

    part2 = ser.loads(ser.dumps(part))
    assert part2.params == params
    np.testing.assert_array_equal(
        np.asarray(part2.public_key), np.asarray(part.public_key)
    )
    np.testing.assert_array_equal(
        np.asarray(part2.key_uni_enc.cd), np.asarray(part.key_uni_enc.cd)
    )
    # shared key and assembled MK cloud key round-trip too
    shared2 = ser.loads(ser.dumps(shared))
    np.testing.assert_array_equal(np.asarray(shared2.a), np.asarray(shared.a))
    ck = mk.make_mk_cloud_key([part, part2])
    ck2 = ser.loads(ser.dumps(ck))
    np.testing.assert_array_equal(
        np.asarray(ck2.bootstrap_key.limbs), np.asarray(ck.bootstrap_key.limbs)
    )


def test_version_check():
    sk = tt.make_secret_key(jax.random.PRNGKey(0), tt.tfhe_parameters_toy())
    blob = ser.dumps(sk)
    import io, json
    import numpy as np
    with np.load(io.BytesIO(blob)) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode())
    manifest["version"] = 999
    # tampering with the version must be rejected
    buf = io.BytesIO()
    np.savez(buf, __manifest__=np.frombuffer(
        json.dumps(manifest).encode(), np.uint8))
    with pytest.raises(ValueError):
        ser.loads(buf.getvalue())
