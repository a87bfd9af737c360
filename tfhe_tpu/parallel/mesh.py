"""Device-mesh scale-out for batched gate bootstrapping.

The reference is single-threaded with no distribution of any kind
(SURVEY.md section 2: no comm backend, no parallel loops — e.g. the scalar
blind-rotate loop src/bootstrap.jl:32-39). This module is the NEW,
TPU-native scale-out layer: explicit SPMD over a
`Mesh(('data', 'model'))` via `shard_map`, with XLA collectives over
ICI — the framework's NCCL/MPI equivalent.

Design (SURVEY.md section 7, phase 7):

* **Blind rotation** is embarrassingly parallel over ciphertexts: the batch
  is sharded over ALL devices (both mesh axes flattened) and each device
  scans its local shard — no communication.
* **Keyswitch** is the memory hog (49 MB limb table, SURVEY.md section 6);
  its table rows (the one-hot contraction dimension) are sharded over the
  `model` axis. The extracted samples are regrouped with `all_gather` so
  each model group sees its full local batch, each device contracts against
  its table shard, and partial sums meet in a `psum` over `model` —
  int32 wraparound addition is exact mod 2^32, so the psum reordering is
  bit-identical to the sequential sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..api import CloudKey
from ..bootstrap import bootstrap_wo_keyswitch
from ..keyswitch import KeyswitchKey
from ..lwe import LweSample


def make_mesh(data: int, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh from the first data*model devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def shard_cloud_key(ck: CloudKey, mesh: Mesh) -> CloudKey:
    """Place the key material: bootstrap key replicated (streamed from HBM on
    every device), keyswitch table row-sharded over the `model` axis."""
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("model", None))
    bk = jax.tree.map(lambda a: jax.device_put(a, repl), ck.bootstrap_key)
    ks = ck.keyswitch_key
    ks = KeyswitchKey(
        jax.device_put(ks.table_limbs, rows),
        ks.n_in, ks.n_out, ks.decomp_length, ks.log2_base,
    )
    return CloudKey(ck.params, bk, ks)


def shard_batch(x: LweSample, mesh: Mesh) -> LweSample:
    """Shard a ciphertext batch over all devices (both axes flattened)."""
    s = NamedSharding(mesh, P(("data", "model")))
    return LweSample(
        jax.device_put(x.a, NamedSharding(mesh, P(("data", "model"), None))),
        jax.device_put(x.b, s),
        jax.device_put(x.cv, s),
    )


def _keyswitch_tp(ks: KeyswitchKey, u: LweSample) -> LweSample:
    """Keyswitch with the table row-sharded on `model` (runs inside shard_map).

    u's batch is replicated across `model`; table_limbs is this device's row
    block; the (i,j,h) one-hot columns matching the block are selected by the
    device's position along `model`. Partial products meet in a psum.
    """
    l, b = ks.decomp_length, ks.log2_base
    base = 1 << b
    k_dim = ks.n_in * l * base
    block = ks.table_limbs.shape[0]  # = k_dim / model_size
    cols_p = ks.table_limbs.shape[-1] // 4

    from ..keyswitch import keyswitch_digits

    digits = keyswitch_digits(u.a, l, b)  # [B, n_in, l]
    onehot = (digits[..., None] == jnp.arange(base, dtype=jnp.int32)).astype(
        jnp.int8
    ).reshape((-1, k_dim))
    start = lax.axis_index("model") * block
    onehot_block = lax.dynamic_slice_in_dim(onehot, start, block, axis=1)

    partial = lax.dot_general(
        onehot_block, ks.table_limbs,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, 4*cols_p]
    full = lax.psum(partial, "model").reshape((-1, 4, cols_p))
    acc = jnp.zeros((full.shape[0], cols_p), jnp.int32)
    for limb in range(4):
        acc = acc + (full[:, limb, :] << (8 * limb))

    a_out = -acc[..., : ks.n_out]
    b_out = u.b - acc[..., ks.n_out]
    return LweSample(a_out, b_out, u.cv)


def make_bootstrap_sharded(mesh: Mesh, params):
    """Build the SPMD batched bootstrap: blind-rotate DP over all devices,
    all_gather regroup over `model`, then table-row-TP keyswitch with psum.

    Returns f(ck, mu, x: LweSample[B]) -> LweSample[B]; B must be divisible
    by mesh.size. Jit-compatible (ck rides as a pytree argument).
    """
    def fn(ck: CloudKey, mu, x: LweSample) -> LweSample:
        lwe_batch = P(("data", "model"))
        lwe_specs = LweSample(P(("data", "model"), None), lwe_batch, lwe_batch)
        out_batch = P("data")
        out_specs = LweSample(P("data", None), out_batch, out_batch)
        bk_specs = jax.tree.map(lambda _: P(), ck.bootstrap_key)
        ks_specs = KeyswitchKey(
            P("model", None),
            ck.keyswitch_key.n_in, ck.keyswitch_key.n_out,
            ck.keyswitch_key.decomp_length, ck.keyswitch_key.log2_base,
        )

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(bk_specs, ks_specs, lwe_specs),
            out_specs=out_specs,
            check_vma=False,
        )
        def run(bk, ks, x_local):
            u = bootstrap_wo_keyswitch(bk, mu, x_local)
            # Regroup: replicate the model-axis batch shards within each
            # data row so the TP keyswitch sees the full local batch.
            u = LweSample(
                lax.all_gather(u.a, "model", axis=0, tiled=True),
                lax.all_gather(u.b, "model", axis=0, tiled=True),
                lax.all_gather(u.cv, "model", axis=0, tiled=True),
            )
            return _keyswitch_tp(ks, u)

        return run(ck.bootstrap_key, ck.keyswitch_key, x)

    return fn


def shard_mk_cloud_key(ck, mesh: Mesh):
    """Place MK evaluation-key material on the mesh.

    The expanded MK bootstrap key ([parties*n, 4, P, K, 2N] int8, ~300 MB for
    2 parties and growing with parties^2 — SURVEY.md section 6) is sharded
    over the `model` axis along its step dimension (party-major, so each
    model shard holds a contiguous run of parties' key material — the
    EP-style placement); per-party keyswitch tables are row-sharded like the
    single-key path. XLA regathers each scan step's slice on demand, trading
    a per-step ICI transfer for parties^2 HBM headroom.
    """
    from ..mk.api import MKCloudKey
    from ..mk.internals import MKBootstrapKey

    steps = NamedSharding(mesh, P("model"))
    rows = NamedSharding(mesh, P("model", None))
    bk = ck.bootstrap_key
    bk = MKBootstrapKey(
        jax.device_put(bk.limbs, steps),
        bk.parties, bk.lwe_size, bk.decomp_length, bk.log2_base,
        bk.polynomial_degree, bk.block,
    )
    ks = tuple(
        KeyswitchKey(
            jax.device_put(k.table_limbs, rows),
            k.n_in, k.n_out, k.decomp_length, k.log2_base,
        )
        for k in ck.keyswitch_keys
    )
    return MKCloudKey(ck.params, ck.parties, bk, ks)


def shard_mk_batch(x, mesh: Mesh):
    """Shard an MKLweSample batch over all devices (both axes flattened)."""
    from ..mk.internals import MKLweSample

    s = NamedSharding(mesh, P(("data", "model")))
    return MKLweSample(
        jax.device_put(x.a, NamedSharding(mesh, P(("data", "model"), None, None))),
        jax.device_put(x.b, s),
        jax.device_put(x.cv, s),
    )


def make_gate_nand_sharded(mesh: Mesh, params):
    """Batched sharded NAND: affine combo (local) + sharded bootstrap.

    Reference semantics: src/gates.jl:15-18.
    """
    from ..lwe import lwe_noiseless_trivial
    from ..numeric import encode_message

    bootstrap_fn = make_bootstrap_sharded(mesh, params)
    mu = encode_message(1, 8)

    def fn(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
        result = lwe_noiseless_trivial(mu, x.n, x.batch_shape) - x - y
        return bootstrap_fn(ck, mu, result)

    return fn
