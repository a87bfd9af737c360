"""SPMD scale-out tests on the virtual 8-device CPU mesh.

Validates that the sharded batched bootstrap (DP blind rotate + all_gather
regroup + table-row-TP keyswitch with psum) is BIT-IDENTICAL to the
single-device path — int32 wraparound addition makes the psum reordering
exact — and that gates still decrypt correctly under sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import gates
from tfhe_tpu import parallel


@pytest.fixture(scope="module")
def toy_keys():
    params = tt.tfhe_parameters_toy()
    rng = jax.random.PRNGKey(123)
    sk, ck = tt.make_key_pair(rng, params)
    return params, sk, ck


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("data,model", [(4, 2), (8, 1), (2, 4)])
def test_sharded_nand_bit_identical(toy_keys, data, model):
    params, sk, ck = toy_keys
    mesh = parallel.make_mesh(data, model)
    B = 16
    bits_x = jnp.arange(B) % 2 == 0
    bits_y = jnp.arange(B) % 3 == 0
    ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, bits_x)
    ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, bits_y)

    want = gates.gate_nand(ck, ct_x, ct_y)

    ck_sharded = parallel.shard_cloud_key(ck, mesh)
    nand = parallel.make_gate_nand_sharded(mesh, params)
    got = nand(
        ck_sharded,
        parallel.shard_batch(ct_x, mesh),
        parallel.shard_batch(ct_y, mesh),
    )

    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))

    out = tt.decrypt(sk, got)
    np.testing.assert_array_equal(
        np.asarray(out), ~(np.asarray(bits_x) & np.asarray(bits_y))
    )


def test_sharded_nand_jit(toy_keys):
    """The sharded gate compiles under jit with the key as pytree arg."""
    params, sk, ck = toy_keys
    mesh = parallel.make_mesh(4, 2)
    nand = jax.jit(parallel.make_gate_nand_sharded(mesh, params))
    B = 8
    bits = jnp.arange(B) % 2 == 0
    ct_x = tt.encrypt(jax.random.PRNGKey(3), sk, bits)
    ct_y = tt.encrypt(jax.random.PRNGKey(4), sk, ~bits)
    got = nand(parallel.shard_cloud_key(ck, mesh),
               parallel.shard_batch(ct_x, mesh),
               parallel.shard_batch(ct_y, mesh))
    out = tt.decrypt(sk, got)
    np.testing.assert_array_equal(np.asarray(out), np.ones(B, bool))


def test_sharded_nand_compact_key_bit_identical(toy_keys):
    """The serving combination: COMPACT (prepared-limb, docs/serving.md)
    key replicated over the mesh, batch DP blind rotate + TP keyswitch —
    bit-identical to the single-device compact path. This is the
    multi-tenant multi-chip mode: the ~T x smaller compact key is what
    makes per-device key replication cheap (142 MB vs 6 GB at 128_fast)."""
    from tfhe_tpu import tuning

    params, sk, _ = toy_keys
    with tuning.override(bs_bake_budget=0):
        # fresh closure: jit cache keys on fn identity + avals, not
        # TuningConfig (tuning.py CAVEAT)
        _, ck = jax.jit(lambda r: tt.make_key_pair(r, params))(
            jax.random.PRNGKey(123))
    assert ck.bootstrap_key.compact

    B = 16
    bits_x = jnp.arange(B) % 2 == 0
    bits_y = jnp.arange(B) % 3 == 0
    ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, bits_x)
    ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, bits_y)
    want = gates.gate_nand(ck, ct_x, ct_y)

    mesh = parallel.make_mesh(4, 2)
    nand = parallel.make_gate_nand_sharded(mesh, params)
    got = nand(
        parallel.shard_cloud_key(ck, mesh),
        parallel.shard_batch(ct_x, mesh),
        parallel.shard_batch(ct_y, mesh),
    )
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(sk, got)),
        ~(np.asarray(bits_x) & np.asarray(bits_y)),
    )


def test_mk_sharded_keys_bit_identical():
    """MK gate with party keys sharded over `model` == unsharded, bit-exact."""
    import tfhe_tpu.mk as mk

    parties = 2
    params = mk.mktfhe_parameters_toy(parties)
    rng = jax.random.PRNGKey(77)
    r_sh, r_e, ra, rb = jax.random.split(rng, 4)
    shared = mk.make_shared_key(r_sh, params)
    sks, parts_list = [], []
    for r in (ra, rb):
        r_sk, r_part = jax.random.split(r)
        sk = tt.make_secret_key(r_sk, params)
        sks.append(sk)
        parts_list.append(mk.make_cloud_key_part(r_part, sk, shared))
    ck = mk.make_mk_cloud_key(parts_list)

    B = 8
    bits = jnp.arange(B) % 2 == 0
    x = mk.mk_encrypt(jax.random.PRNGKey(1), sks, bits)
    y = mk.mk_encrypt(jax.random.PRNGKey(2), sks, ~bits)
    want = mk.mk_gate_nand(ck, x, y)

    mesh = parallel.make_mesh(2, 4)
    ck_sh = parallel.shard_mk_cloud_key(ck, mesh)
    got = jax.jit(mk.mk_gate_nand)(
        ck_sh, parallel.shard_mk_batch(x, mesh), parallel.shard_mk_batch(y, mesh)
    )
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_array_equal(
        np.asarray(mk.mk_decrypt(sks, got)), np.ones(B, bool)
    )


@pytest.mark.parametrize("data,model", [(2, 4), (4, 2), (1, 8)])
def test_model_sharded_blind_rotate_bit_identical(toy_keys, data, model):
    """Bootstrap key column-sharded over `model`: per-device key bytes are
    1/model, per-step int32 psum reassembles the delta bit-exactly."""
    import tfhe_tpu.bootstrap as bs
    from tfhe_tpu.tlwe import TLweSample

    params, sk, ck = toy_keys
    bk = ck.bootstrap_key
    if bk.depth == 0:
        pytest.skip("model sharding targets the Karatsuba bake")
    mesh = parallel.make_mesh(data, model)

    rng = np.random.default_rng(5)
    B = 16
    n = params.tlwe_polynomial_degree
    acc0 = rng.integers(-(2**31), 2**31, (B, 2, n), dtype=np.int64).astype(
        np.int32
    )
    bara = rng.integers(0, 2 * n, (B, params.lwe_size)).astype(np.int32)

    want = bs.blind_rotate(
        TLweSample(jnp.asarray(acc0), jnp.zeros(B, jnp.float32)), bk, bara
    ).a

    bk_sharded = parallel.shard_bootstrap_key_model(bk, mesh)
    local = bk_sharded.baked.addressable_shards[0].data
    assert local.shape[-1] == bk.baked.shape[-1] // model  # 1/model key bytes

    rotate = parallel.make_blind_rotate_model_sharded(mesh)
    got = rotate(bk_sharded, jnp.asarray(acc0), jnp.asarray(bara))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.fixture(scope="module")
def toy_keys_balanced():
    """Toy keys with the balanced (nearest-rounding) gadget — the mode the
    shipped fast presets use; regression fixture for the mesh path dropping
    bk.balanced (round-3 advisor finding, high)."""
    import dataclasses

    params = dataclasses.replace(
        tt.tfhe_parameters_toy(), gadget_balanced=True)
    rng = jax.random.PRNGKey(321)
    sk, ck = tt.make_key_pair(rng, params)
    return params, sk, ck


@pytest.mark.parametrize("data,model", [(4, 2), (2, 4)])
def test_model_sharded_blind_rotate_balanced_key(toy_keys_balanced, data,
                                                 model):
    """Model-sharded rotation with a BALANCED-gadget key must match the
    single-device blind_rotate bit-for-bit (the mesh step must pass
    bk.balanced into decompose, not silently revert to truncating)."""
    import tfhe_tpu.bootstrap as bs
    from tfhe_tpu.tlwe import TLweSample

    params, sk, ck = toy_keys_balanced
    bk = ck.bootstrap_key
    assert bk.balanced
    if bk.depth == 0:
        pytest.skip("model sharding targets the Karatsuba bake")
    mesh = parallel.make_mesh(data, model)

    rng = np.random.default_rng(9)
    B = 16
    n = params.tlwe_polynomial_degree
    acc0 = rng.integers(-(2**31), 2**31, (B, 2, n), dtype=np.int64).astype(
        np.int32
    )
    bara = rng.integers(0, 2 * n, (B, params.lwe_size)).astype(np.int32)

    want = bs.blind_rotate(
        TLweSample(jnp.asarray(acc0), jnp.zeros(B, jnp.float32)), bk, bara
    ).a

    bk_sharded = parallel.shard_bootstrap_key_model(bk, mesh)
    rotate = parallel.make_blind_rotate_model_sharded(mesh)
    got = rotate(bk_sharded, jnp.asarray(acc0), jnp.asarray(bara))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_nand_balanced_key_bit_identical(toy_keys_balanced):
    """Full sharded NAND with a balanced-gadget key == single-device, bitwise."""
    params, sk, ck = toy_keys_balanced
    mesh = parallel.make_mesh(4, 2)
    B = 16
    bits_x = jnp.arange(B) % 2 == 0
    bits_y = jnp.arange(B) % 3 == 0
    ct_x = tt.encrypt(jax.random.PRNGKey(11), sk, bits_x)
    ct_y = tt.encrypt(jax.random.PRNGKey(12), sk, bits_y)

    want = gates.gate_nand(ck, ct_x, ct_y)

    ck_sharded = parallel.shard_cloud_key(ck, mesh)
    nand = parallel.make_gate_nand_sharded(mesh, params)
    got = nand(ck_sharded,
               parallel.shard_batch(ct_x, mesh),
               parallel.shard_batch(ct_y, mesh))

    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_array_equal(
        np.asarray(tt.decrypt(sk, got)),
        ~(np.asarray(bits_x) & np.asarray(bits_y)))


def test_sharded_pbs_bit_identical(toy_keys):
    """Programmable bootstrap under the mesh == single-device, bitwise."""
    from tfhe_tpu import pbs

    params, sk, ck = toy_keys
    mesh = parallel.make_mesh(4, 2)
    S, B = 4, 16
    msgs = jnp.arange(B) % S
    lut = jnp.asarray([2, 0, 3, 1], jnp.int32)
    x = pbs.encrypt_pbs(jax.random.PRNGKey(5), sk, msgs, S)

    want = pbs.programmable_bootstrap(
        ck.bootstrap_key, ck.keyswitch_key, lut, x, S)

    ck_sharded = parallel.shard_cloud_key(ck, mesh)
    pbs_fn = parallel.make_pbs_sharded(mesh, params, S)
    got = pbs_fn(ck_sharded, lut, parallel.shard_batch(x, mesh))

    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_array_equal(
        np.asarray(pbs.decrypt_pbs(sk, got, S)), np.asarray(lut)[msgs % S])


def test_sharded_radix_add_bit_identical(toy_keys):
    """Radix words shard data-parallel over the word axis: the jitted add
    under GSPMD (NamedSharding inputs) must be bit-identical to the
    single-device result (every PBS is per-sample deterministic)."""
    from tfhe_tpu import radix

    params, sk, ck = toy_keys
    mesh = parallel.make_mesh(8, 1)
    B = 16
    rng = np.random.default_rng(7)
    av = jnp.asarray(rng.integers(0, 256, B).astype(np.int32))
    bv = jnp.asarray(rng.integers(0, 256, B).astype(np.int32))
    xa = radix.encrypt_radix(jax.random.PRNGKey(51), sk, av, 8)
    xb = radix.encrypt_radix(jax.random.PRNGKey(52), sk, bv, 8)

    ref = jax.jit(radix.radix_add)(ck, xa, xb)

    xa_s = parallel.shard_batch(xa, mesh)
    xb_s = parallel.shard_batch(xb, mesh)
    out = jax.jit(radix.radix_add)(ck, xa_s, xb_s)

    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))
    np.testing.assert_array_equal(
        np.asarray(radix.decrypt_radix(sk, out)),
        np.asarray((av + bv) % 256))
