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
        ks.n_in, ks.n_out, ks.decomp_length, ks.log2_base, ks.noise_stddev,
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

    from ..keyswitch import keyswitch_onehot

    onehot = keyswitch_onehot(u.a, l, b).reshape((-1, k_dim))
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
            ck.keyswitch_key.noise_stddev,
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


def shard_bootstrap_key_model(bk, mesh: Mesh):
    """Shard a Karatsuba-baked bootstrap key's output columns over `model`.

    The baked key's last dim is (k, limb, w)-major T-column groups
    (k1*4 groups); sharding it over `model` puts per-device key bytes at
    1/model — the model-axis partitioning of the transform dimension the
    round-1 review flagged as missing (reference analogue: the FFT call at
    src/polynomials.jl:111). Consumed by `make_blind_rotate_model_sharded`.
    """
    assert bk.depth > 0, "model sharding targets the Karatsuba bake"
    assert not bk.compact, "compact (prepared) keys have no baked columns"
    from ..bootstrap import BootstrapKey

    cols = NamedSharding(mesh, P(None, None, "model"))
    return BootstrapKey(
        jax.device_put(bk.baked, cols),
        bk.decomp_length, bk.log2_base, bk.polynomial_degree, bk.mask_size,
        bk.block, bk.depth, bk.noise_stddev, bk.balanced,
    )


def make_blind_rotate_model_sharded(mesh: Mesh):
    """SPMD blind rotation with the bootstrap key column-sharded on `model`.

    Batch rides `data`; each model shard computes the partial CMUX delta of
    its (k, limb) column groups and the shards meet in an int32 `psum` per
    step — exact mod 2^32, so the result is bit-identical to the unsharded
    rotation (asserted by tests/test_sharding.py). The per-step psum
    ([B_local, k+1, N] words over ICI) buys 1/model per-device key HBM.

    Returns f(bk, acc_a, bara) -> acc_a' (int32[B, k+1, N]).
    """
    def fn(bk, acc_a, bara):
        model = mesh.shape["model"]
        k1 = bk.mask_size + 1
        n_groups = k1 * 4
        assert n_groups % model == 0, (n_groups, model)
        g_per = n_groups // model
        l, b, t = bk.decomp_length, bk.log2_base, bk.block
        plan = bk.plan

        bk_spec = jax.tree.map(lambda _: P(None, None, "model"), bk)
        bara_t = jnp.swapaxes(jnp.asarray(bara, jnp.int32), 0, 1)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(bk_spec, P("data", None, None), P(None, "data")),
            out_specs=P("data", None, None),
            check_vma=False,
        )
        def run(bk_local, acc_local, bara_local):
            from ..ops.karatsuba import karatsuba_delta_cols
            from ..polynomial import mul_by_monomial
            from ..tgsw import decompose

            g0 = lax.axis_index("model") * g_per

            def step(acc, xs):
                e_i, bara_i = xs
                rot = mul_by_monomial(acc, bara_i[:, None])
                # bk.balanced must ride through: with gadget_balanced presets
                # (128_fast et al.) the truncating gadget's -ulp/2 bias is
                # fatal at l*b=16 (noise.py:decompose_bias_var), and dropping
                # it here would make the sharded rotation diverge bit-wise
                # from blind_rotate.
                digits = decompose(rot - acc, l, b, bk_local.balanced)
                digits = digits.reshape(acc.shape[0], k1 * l, acc.shape[-1])
                # group ids for this shard: globally g0 + j -> (k, limb);
                # k = g // 4, limb = g % 4. lax.switch over the model-static
                # possibilities keeps the shifts static per branch.
                def partial_for(start):
                    gids = tuple(
                        ((start + j) // 4, (start + j) % 4)
                        for j in range(g_per)
                    )
                    return karatsuba_delta_cols(
                        digits, e_i, t, plan, gids, k1)

                branches = [
                    (lambda s=s: partial_for(s))
                    for s in range(0, n_groups, g_per)
                ]
                delta = lax.switch(g0 // g_per, branches)
                delta = lax.psum(delta, "model")
                return acc + delta, None

            out, _ = lax.scan(step, acc_local, (bk_local.baked, bara_local))
            return out

        return run(bk, acc_a, bara_t)

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
        bk.polynomial_degree, bk.block, bk.noise_stddev,
    )
    ks = tuple(
        KeyswitchKey(
            jax.device_put(k.table_limbs, rows),
            k.n_in, k.n_out, k.decomp_length, k.log2_base, k.noise_stddev,
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


def make_pbs_sharded(mesh: Mesh, params, space: int):
    """SPMD programmable bootstrap: DP LUT blind rotation + TP keyswitch.

    Same sharding scheme as `make_bootstrap_sharded`; the plaintext LUT
    (int[S], one table for the whole batch) is replicated. Returns
    f(ck, table, x: LweSample[B]) -> LweSample[B], B divisible by mesh.size.
    """
    from ..pbs import programmable_bootstrap_wo_keyswitch

    def fn(ck: CloudKey, table, x: LweSample) -> LweSample:
        lwe_batch = P(("data", "model"))
        lwe_specs = LweSample(P(("data", "model"), None), lwe_batch, lwe_batch)
        out_batch = P("data")
        out_specs = LweSample(P("data", None), out_batch, out_batch)
        bk_specs = jax.tree.map(lambda _: P(), ck.bootstrap_key)
        ks_specs = KeyswitchKey(
            P("model", None),
            ck.keyswitch_key.n_in, ck.keyswitch_key.n_out,
            ck.keyswitch_key.decomp_length, ck.keyswitch_key.log2_base,
            ck.keyswitch_key.noise_stddev,
        )

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(bk_specs, ks_specs, P(None), lwe_specs),
            out_specs=out_specs,
            check_vma=False,
        )
        def run(bk, ks, table_local, x_local):
            u = programmable_bootstrap_wo_keyswitch(
                bk, table_local, x_local, space)
            u = LweSample(
                lax.all_gather(u.a, "model", axis=0, tiled=True),
                lax.all_gather(u.b, "model", axis=0, tiled=True),
                lax.all_gather(u.cv, "model", axis=0, tiled=True),
            )
            return _keyswitch_tp(ks, u)

        return run(ck.bootstrap_key, ck.keyswitch_key,
                   jnp.asarray(table, jnp.int32), x)

    return fn


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
