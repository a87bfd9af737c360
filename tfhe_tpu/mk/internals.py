"""Multi-key TFHE internals: MK samples, key material, expansion, MK CMUX.

TPU-native counterpart of the reference's MK layer
(reference: src/mk_internals.jl:1-515, the Chen-Chillotti-Song MK-TFHE
scheme). Batched struct-of-arrays throughout; mask_size k = 1 (hardcoded in
the reference too, issue #2 at src/mk_internals.jl:129-131).

Design notes (SURVEY.md section 7 phase 8):

* An MK-TLWE sample [B, parties+1, N] has the same shape class as a TLWE
  sample with mask size `parties`, so the MK external product reuses the
  single-key prepared-operand contraction (ops/conv.py:poly_mul_prepared):
  the expanded TGSW sample is assembled once at key time into a block-
  structured [P, K, N] operand (P = (parties+1)*l, K = parties+1) whose
  zero blocks encode the sparsity of the paper's expanded matrix.
* The reference's precision-driven "inverse-transform each term before
  summing" constraint (src/mk_internals.jl:359-366) vanishes here: integer
  limb convolutions are exact, so any summation order gives identical bits
  (SURVEY.md section 2 item 8).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import polynomial
from ..numeric import dtot32, rand_uniform_bool, rand_uniform_torus32
from ..ops import conv
from ..tgsw import decompose, gadget_values
from ..tlwe import TLweSample




# --- MK-LWE (reference: src/mk_internals.jl:6-40) ---


class MKLweSample(NamedTuple):
    """Batch of MK-LWE ciphertexts: per-party masks + one joint body.

    a: int32[..., parties, n]; b: int32[...]; cv: float32[...].
    Reference: src/mk_internals.jl:6-18.
    """

    a: jax.Array
    b: jax.Array
    cv: jax.Array

    @property
    def parties(self) -> int:
        return self.a.shape[-2]

    @property
    def n(self) -> int:
        return self.a.shape[-1]

    def __add__(self, other: "MKLweSample") -> "MKLweSample":
        return MKLweSample(self.a + other.a, self.b + other.b, self.cv + other.cv)

    def __sub__(self, other: "MKLweSample") -> "MKLweSample":
        return MKLweSample(self.a - other.a, self.b - other.b, self.cv + other.cv)

    def __neg__(self) -> "MKLweSample":
        return MKLweSample(-self.a, -self.b, self.cv)

    def __mul__(self, c: int) -> "MKLweSample":
        """Integer scalar multiple (exact int32 wraparound), variance c^2."""
        return MKLweSample(self.a * c, self.b * c, self.cv * (c * c))

    __rmul__ = __mul__


def mk_lwe_phase(sample: MKLweSample, lwe_keys) -> jax.Array:
    """b + sum_p (-<a_p, s_p>) summed over parties.

    lwe_keys: int32[parties, n]. Reference: src/mk_internals.jl:29-35.
    """
    dots = jnp.sum(sample.a * lwe_keys, axis=(-1, -2), dtype=jnp.int32)
    return sample.b - dots


def mk_lwe_noiseless_trivial(mu, n: int, parties: int, batch_shape=()) -> MKLweSample:
    """Reference: src/mk_internals.jl:38-40."""
    mu = jnp.broadcast_to(jnp.asarray(mu, jnp.int32), batch_shape)
    return MKLweSample(
        jnp.zeros(batch_shape + (parties, n), jnp.int32),
        mu,
        jnp.zeros(batch_shape, jnp.float32),
    )


# --- MK-TLWE (reference: src/mk_internals.jl:46-95) ---
# Represented as TLweSample with mask rows = parties (body last), so the
# single-key polynomial machinery applies unchanged.


def mk_tlwe_noiseless_trivial(mu, parties: int) -> TLweSample:
    """(0,...,0, mu). mu: int32[..., N]. Reference: src/mk_internals.jl:69-76."""
    mu = jnp.asarray(mu, jnp.int32)
    zeros = jnp.zeros(mu.shape[:-1] + (parties,) + mu.shape[-1:], jnp.int32)
    full = jnp.concatenate([zeros, mu[..., None, :]], axis=-2)
    return TLweSample(full, jnp.zeros(mu.shape[:-1], jnp.float32))


def mk_tlwe_extract_sample(sample: TLweSample) -> MKLweSample:
    """Extract the constant coefficient as an MK-LWE sample (a per party).

    Reference: src/mk_internals.jl:88-95 (k = 1: iterates over parties).
    """
    rev = polynomial.reverse_polynomial(sample.mask)  # [..., parties, N]
    b = sample.body[..., 0]
    return MKLweSample(rev, b, jnp.broadcast_to(sample.cv, b.shape))


# --- Shared / public keys (reference: src/mk_internals.jl:101-139) ---


def shared_key_gen(rng, decomp_length: int, poly_degree: int) -> jax.Array:
    """l uniform torus polynomials, common to all parties: int32[l, N].

    Reference: src/mk_internals.jl:106-111.
    """
    return rand_uniform_torus32(rng, (decomp_length, poly_degree))


def public_key_core(tlwe_key, shared_a, noise_t32) -> jax.Array:
    """b_i = s * a_i + e_i. tlwe_key: int32[1, N] (k=1); shared_a, noise: [l, N].

    Reference: src/mk_internals.jl:120-138.
    """
    prods = conv.poly_mul_batched_torus(shared_a[:, None, :], tlwe_key)
    return prods + jnp.asarray(noise_t32, jnp.int32)


def public_key_gen(rng, tlwe_key, alpha: float, shared_a) -> jax.Array:
    noise = dtot32(
        jax.random.normal(rng, shared_a.shape, jnp.float32) * jnp.float32(alpha)
    )
    return public_key_core(tlwe_key, shared_a, noise)


# --- Uni-encryption (reference: src/mk_internals.jl:146-227) ---


class MKTGswUESample(NamedTuple):
    """RGSW.UniEnc output: six l-vectors of torus polynomials, int32[6, l, N]
    stacked in order (c0, c1, d0, d1, f0, f1). Leading batch dims allowed.
    Reference: src/mk_internals.jl:146-179.
    """

    cd: jax.Array  # [..., 6, l, N]

    @property
    def c0(self):
        return self.cd[..., 0, :, :]

    @property
    def c1(self):
        return self.cd[..., 1, :, :]

    @property
    def d0(self):
        return self.cd[..., 2, :, :]

    @property
    def d1(self):
        return self.cd[..., 3, :, :]

    @property
    def f0(self):
        return self.cd[..., 4, :, :]

    @property
    def f1(self):
        return self.cd[..., 5, :, :]


def mk_tgsw_encrypt_core(message, r, c1, f1, noise_c0, noise_d0, noise_d1,
                         noise_f0, tlwe_key, shared_a, pk_b,
                         decomp_length: int, log2_base: int) -> MKTGswUESample:
    """Deterministic RGSW.UniEnc with injected randomness.

    message: int32 scalar or [...]; r: int32[..., N] binary; c1, f1 uniform
    torus [..., l, N]; noises [..., l, N]; tlwe_key int32[1, N]; shared_a,
    pk_b [l, N]. Reference: src/mk_internals.jl:185-227.
    """
    l = decomp_length
    n = r.shape[-1]
    g = gadget_values(l, log2_base)  # [l]
    message = jnp.asarray(message, jnp.int32)
    batch = r.shape[:-1]

    const_mg = (message[..., None, None] * g[:, None]) * (
        jnp.zeros((n,), jnp.int32).at[0].set(1)
    )  # [..., l, N], m*g on the constant coefficient

    def s_mul(polys):  # conv with the party's ring key, batched over [..., l]
        flat = polys.reshape((-1, 1, n))
        return conv.poly_mul_batched_torus(flat, tlwe_key).reshape(polys.shape)

    # r * t for t in {shared_a, pk_b}: the l torus polys are SHARED across
    # the batch while the binary r varies, so this is exactly the
    # shared-torus MXU contraction (digits = r, one 1-bit limb) — the
    # per-pair Toeplitz of negacyclic_mul would materialize batch*l NxN
    # matrices (8+ GB at production sizes).
    def r_conv(torus_polys):  # torus_polys: [l, N] shared
        flat_r = r.reshape((-1, 1, n))  # [B', P=1, N]
        prods = conv.poly_mul_batched_small(
            flat_r, torus_polys[None], 1
        )  # [B', l, N]
        return prods.reshape(batch + (l, n))

    c0 = noise_c0 + s_mul(c1) + const_mg
    d1 = noise_d1 + r_conv(shared_a) + const_mg
    d0 = noise_d0 + r_conv(pk_b)
    rg = r[..., None, :] * g[:, None]  # r * g[i], every coefficient
    f0 = noise_f0 + s_mul(f1) + rg
    return MKTGswUESample(
        jnp.stack([c0, c1, d0, d1, f0, f1], axis=-3)
    )


def mk_tgsw_encrypt(rng, message, alpha: float, tlwe_key, shared_a, pk_b,
                    decomp_length: int, log2_base: int,
                    batch_shape=()) -> MKTGswUESample:
    """Fresh uni-encryption(s). message broadcastable to batch_shape.

    Reference: src/mk_internals.jl:185-227.
    """
    l = decomp_length
    n = shared_a.shape[-1]
    keys = jax.random.split(rng, 7)
    r = rand_uniform_bool(keys[0], batch_shape + (n,))
    c1 = rand_uniform_torus32(keys[1], batch_shape + (l, n))
    f1 = rand_uniform_torus32(keys[2], batch_shape + (l, n))

    def gauss(k):
        return dtot32(
            jax.random.normal(k, batch_shape + (l, n), jnp.float32)
            * jnp.float32(alpha)
        )

    return mk_tgsw_encrypt_core(
        message, r, c1, f1, gauss(keys[3]), gauss(keys[4]), gauss(keys[5]),
        gauss(keys[6]), tlwe_key, shared_a, pk_b, decomp_length, log2_base,
    )


# --- Expansion (reference: src/mk_internals.jl:230-345) ---


class MKTGswExpSample(NamedTuple):
    """Sparse storage of the expanded (parties+1)^2 block matrix:
    x, y: [..., l, parties, N]; c0, c1: [..., l, N].
    Reference: src/mk_internals.jl:240-271.
    """

    x: jax.Array
    y: jax.Array
    c0: jax.Array
    c1: jax.Array


def mk_tgsw_expand(ue: MKTGswUESample, party: int, pk_bs,
                   decomp_length: int, log2_base: int) -> MKTGswExpSample:
    """RGSW.Expand: extend a party's uni-encryption against all public keys.

    ue: batch [..., 6, l, N]; pk_bs: [parties, l, N].
    Reference: src/mk_internals.jl:304-345.
    """
    parties, l, n = pk_bs.shape
    batch = ue.cd.shape[:-3]

    diff = pk_bs[:, None] - pk_bs[None, :]  # [i, party', l, N]
    dec = decompose(diff[:, party], decomp_length, log2_base)
    # dec: [parties(i), l(j), l(dec), N] — SHARED across the UE batch (it
    # only depends on public keys), while f0/f1 vary per uni-encryption: so
    # the contraction sum_dec conv(dec[i, j, dec], f{0,1}[dec]) is one
    # multi-output shared-small-operand matmul (a single [P*N, K*N] Toeplitz
    # of the digits; materializing per-element operands instead OOMs at
    # production sizes).
    f01 = jnp.stack([ue.f0, ue.f1], axis=-3)  # [..., 2, l_dec, N]
    flat_f = f01.reshape((-1, decomp_length, n))  # [B*2, l_dec, N]
    s_shared = dec.reshape(parties * l, decomp_length, n)  # [K=(i,j), l_dec, N]
    adds = conv.poly_mul_batched_torus_multi(flat_f, s_shared)
    adds = adds.reshape(batch + (2, parties, l, n))  # [..., {x,y}, i, j, N]
    x_add = jnp.moveaxis(adds[..., 0, :, :, :], -3, -2)  # [..., l(j), parties, N]
    y_add = jnp.moveaxis(adds[..., 1, :, :, :], -3, -2)

    x = ue.d0[..., :, None, :] + x_add
    y = y_add
    # party's own column: x = d0, y = d1 (no cross terms)
    x = x.at[..., :, party, :].set(ue.d0)
    y = y.at[..., :, party, :].set(ue.d1)
    return MKTGswExpSample(x, y, ue.c0, ue.c1)


def build_extern_operand(exp: MKTGswExpSample, party: int, parties: int,
                         decomp_length: int) -> jax.Array:
    """Assemble the expanded sample into the block [P, K, N] contraction
    operand (P = (parties+1)*l rows (j, l'), K = parties+1 outputs), then
    limb-prepare it. Returns int8[..., 4, P, K, 2N].

    Block structure (reference contraction src/mk_internals.jl:368-387):
      col i != party:  rows (j=i, l') = y[l', party]
      col party:       rows (j, l')   = y[l', j];  rows (body, l') = c1[l']
      col body (last): rows (j, l')   = x[l', j];  rows (body, l') = c0[l']
    """
    l = decomp_length
    x, y, c0, c1 = exp.x, exp.y, exp.c0, exp.c1
    batch = c0.shape[:-2]
    n = c0.shape[-1]
    kk = parties + 1
    t = jnp.zeros(batch + (kk, l, kk, n), jnp.int32)  # rows (j, l'), cols k

    for i in range(parties):
        if i != party:
            t = t.at[..., i, :, i, :].set(y[..., :, party, :])
        t = t.at[..., i, :, party, :].set(y[..., :, i, :])
        t = t.at[..., i, :, kk - 1, :].set(x[..., :, i, :])
    t = t.at[..., kk - 1, :, party, :].set(c1)
    t = t.at[..., kk - 1, :, kk - 1, :].set(c0)
    t = t.reshape(batch + (kk * l, kk, n))
    return conv.prepare_shared_torus(t)


def build_extern_operand_sparse(exp: MKTGswExpSample, party: int,
                                parties: int, decomp_length: int, nz):
    """Like `build_extern_operand`, but materializes ONLY the nonzero
    blocks, stacked in `nz` = mk_nonzero_blocks order: int8[..., 4, NZ, l,
    2N]. This is what makes the 8-party production key fit HBM (the dense
    prepared form is 21 GB; 25/81 blocks is 6.6 GB)."""
    x, y, c0, c1 = exp.x, exp.y, exp.c0, exp.c1
    kk = parties + 1

    def block(j, k):
        if j < parties:
            if k == kk - 1:
                return x[..., :, j, :]
            if k == party:
                return y[..., :, j, :]
            return y[..., :, party, :]  # k == j != party
        return c1 if k == party else c0  # body row
    t = jnp.stack([block(j, k) for (j, k) in nz], axis=-3)
    return conv.prepare_shared_torus(t)  # [..., 4, NZ, l, 2N]


# --- MK keyswitch (reference: src/mk_internals.jl:397-411) ---


def mk_keyswitch(ks_keys, sample: MKLweSample) -> MKLweSample:
    """Per-party keyswitch of each mask column as ONE batched contraction.

    ks_keys: list of `parties` KeyswitchKey (party-local out keys). All MK
    presets give every party the same keyswitch geometry, so the per-party
    one-hot matmuls batch into a single dot_general with the party axis as
    a batch dimension (the table stack is a cheap device copy next to the
    matmul itself); arithmetic per party is identical to the single-key
    `keyswitch`, so results are bit-identical to the sequential loop.
    Reference: src/mk_internals.jl:397-411.
    """
    from ..keyswitch import keyswitch_onehot
    from ..noise import keyswitch_var

    ks0 = ks_keys[0]
    l, b = ks0.decomp_length, ks0.log2_base
    parties = len(ks_keys)
    # the ceremony gives every party one SchemeParameters, so the
    # geometries always agree (the batching requirement)
    assert all(k.table_limbs.shape == ks0.table_limbs.shape
               and (k.decomp_length, k.log2_base) == (l, b)
               for k in ks_keys), "party keyswitch geometries differ"

    cols_p = ks0.table_limbs.shape[-1] // 4
    batch_shape = sample.b.shape
    tables = jnp.stack([k.table_limbs for k in ks_keys])  # [P, R, 4*C]
    onehot = keyswitch_onehot(sample.a, l, b)  # [..., parties, R] int8
    oh = onehot.reshape((-1, parties, onehot.shape[-1]))
    prods = jax.lax.dot_general(
        oh, tables,
        (((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.int32,
    ).reshape(parties, -1, 4, cols_p)  # batch-major: [P, B, 4, C]
    acc = prods[:, :, 0, :]
    for limb in range(1, 4):
        acc = acc + (prods[:, :, limb, :] << (8 * limb))
    a_out = jnp.moveaxis(-acc[..., : ks0.n_out], 0, 1).reshape(
        batch_shape + (parties, ks0.n_out))
    b_out = sample.b - jnp.sum(acc[..., ks0.n_out], axis=0).reshape(
        batch_shape)
    cv = sample.cv + sum(
        keyswitch_var(k.n_in, l, b, k.noise_stddev) for k in ks_keys)
    return MKLweSample(a_out, b_out, cv)


# --- MK bootstrap (reference: src/mk_internals.jl:414-515) ---


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["limbs"],
    meta_fields=["parties", "lwe_size", "decomp_length", "log2_base",
                 "polynomial_degree", "block", "noise_stddev", "sparse",
                 "balanced"],
)
@dataclasses.dataclass(frozen=True)
class MKBootstrapKey:
    """Expanded MK bootstrap key, party-major step order matching the
    reference's rotation order (src/mk_internals.jl:473-485: party outer
    loop, key-bit inner).

    Three storage forms:
    * block == 0, sparse=False: prepared limbs int8[parties*n, 4, P, K, 2N]
      — compact (grows as parties^2); the TPU fast path expands per step,
      the XLA fallback materializes a Toeplitz gather at gate time.
    * block == 0, sparse=True: nonzero blocks only,
      int8[parties*n, 4, NZ, l, 2N] with NZ = 3*parties+1 in
      mk_nonzero_blocks order — the only form whose 8-party production key
      fits HBM (6.6 GB vs 21 GB dense). TPU fast path only.
    * block == T > 0: baked block-Toeplitz int8[parties*n, 2M*P*T, K*4*T]
      (ops/conv.py:bake_block_toeplitz) — gather-free dense matmuls at gate
      time, T x larger storage (CPU/fallback geometries).
    """

    limbs: jax.Array
    parties: int
    lwe_size: int
    decomp_length: int
    log2_base: int
    polynomial_degree: int
    block: int = 0
    noise_stddev: float = 0.0  # party keygen sigma, feeds the honest cv model
    sparse: bool = False
    balanced: bool = False  # gate-time nearest-rounding gadget (tgsw.py)


def _mk_bake_block(steps: int, p: int, kk: int, n: int,
                   budget_bytes: int) -> int:
    """Largest block T in {64, 32, 16} whose baked key fits the budget
    (size = steps * 2N * P * K*4 * T bytes); 0 = stay on the prepared path."""
    from ..tuning import get_tuning

    knob = get_tuning().mk_bake_budget
    budget = budget_bytes if knob < 0 else knob  # 0 forces the prepared path
    for t in (64, 32, 16):
        if n % t or n // t < 2:
            continue
        if steps * 2 * n * p * kk * 4 * t <= budget:
            return t
    return 0


def mk_bootstrap_key(parts_ue, pk_bs, decomp_length: int,
                     log2_base: int,
                     noise_stddev: float = 0.0,
                     balanced: bool = False) -> MKBootstrapKey:
    """Server-side expansion of all parties' uni-encrypted key bits.

    parts_ue: list of `parties` MKTGswUESample batches [n, 6, l, N];
    pk_bs: [parties, l, N]. Reference: src/mk_internals.jl:442-461.
    Bakes the block-Toeplitz form when it fits HBM (2-party production:
    ~4.7 GB at T=32); larger party counts fall back to prepared limbs.
    """
    from ..tuning import get_tuning

    parties = pk_bs.shape[0]
    n_lwe = parts_ue[0].cd.shape[0]
    steps = parties * n_lwe
    kk = parties + 1
    p = kk * decomp_length
    n = pk_bs.shape[-1]
    # On TPU with a 128-divisible ring the prepared form feeds the
    # sparse-expand kernel fast path directly — the T<=64 bake only helps
    # the XLA fallback (CPU tests, odd geometries). When even the dense
    # prepared form is too big (8-party production: 21 GB), store ONLY the
    # nonzero blocks (mk_nonzero_blocks order; 6.6 GB) — a layout only the
    # fast path consumes.
    fast = jax.default_backend() == "tpu" and n % 128 == 0 and n // 128 >= 2
    dense_bytes = steps * 4 * p * kk * 2 * n
    sparse_env = get_tuning().mk_sparse_limbs
    if sparse_env == "auto":
        sparse = fast and dense_bytes > 8 * 2**30
    else:
        sparse = bool(int(sparse_env))

    all_limbs = []
    for party in range(parties):
        exp = mk_tgsw_expand(
            parts_ue[party], party, pk_bs, decomp_length, log2_base
        )
        if sparse:
            nz = mk_nonzero_blocks(party, parties)
            limbs = build_extern_operand_sparse(
                exp, party, parties, decomp_length, nz)
        else:
            limbs = build_extern_operand(exp, party, parties, decomp_length)
        all_limbs.append(limbs)
    # Sparse keys stay a PER-PARTY TUPLE (a pytree of `parties` leaves):
    # the fast path scans each party's leaf directly — slicing one big
    # array under jit materializes a copy per party, which alone OOMs HBM
    # at 8-party production (8 x 840 MB on top of the 6.6 GB key).
    limbs = (tuple(all_limbs) if sparse
             else jnp.concatenate(all_limbs, axis=0))

    t = 0 if (fast or sparse) else _mk_bake_block(
        steps, p, kk, n, budget_bytes=6 * 2**30)
    if t:
        limbs = conv.bake_block_toeplitz(limbs, t)
    return MKBootstrapKey(
        limbs, parties, n_lwe, decomp_length, log2_base, n, t, noise_stddev,
        sparse, balanced,
    )


def mk_nonzero_blocks(party: int, parties: int):
    """Static nonzero (block_row j, output_col k) pairs of party's expanded
    operand — the complement is structurally zero (see build_extern_operand;
    reference placement src/mk_internals.jl:368-387): block row i touches
    only columns {i, party, body}; the body row touches {party, body}.
    NZ = 3*parties (vs dense (parties+1)^2): 13/25 at 4 parties, 25/81 at 8.
    """
    kk = parties + 1
    pairs = set()
    for i in range(parties):
        if i != party:
            pairs.add((i, i))
        pairs.add((i, party))
        pairs.add((i, kk - 1))
    pairs.add((kk - 1, party))
    pairs.add((kk - 1, kk - 1))
    return tuple(sorted(pairs))


def _use_mk_expand_kernel(bk: MKBootstrapKey) -> bool:
    """The expand+tiled-kernel MK fast path: prepared (block == 0) keys with
    a 128-divisible ring degree, on TPU (or forced via
    TuningConfig.mk_cmux)."""
    from ..tuning import get_tuning

    mode = get_tuning().mk_cmux
    if bk.block != 0 or bk.polynomial_degree % 128 or \
            bk.polynomial_degree // 128 < 2:
        return False
    if bk.sparse:  # sparse limbs exist ONLY for the expand kernel
        return True
    if mode == "expand":
        return True
    if mode in ("xla", "prepared"):
        return False
    return jax.default_backend() == "tpu"


def mk_blind_rotate(accum: TLweSample, bk: MKBootstrapKey, bara,
                    segments: int = 1,
                    trivial_masks: bool = True) -> TLweSample:
    """parties x n CMUX steps; accum: [B, parties+1, N]; bara: [B, parties, n].

    Reference: src/mk_internals.jl:473-485 (branchless equivalence as in the
    single-key path, SURVEY.md section 2 item 3).

    segments > 1 splits the scan into `segments` separately-jitted host-level
    chunks — bit-identical (the scan carry passes through unchanged), needed
    on devices with program-duration limits when the unbaked (gather) path
    makes one full rotation a multi-minute program (production 4+ parties).
    Only valid OUTSIDE jit; the default runs as one scan and is jittable.

    trivial_masks: the accumulator's mask components start ZERO (true for
    every bootstrap: the CGGI accumulator is the noiseless-trivial test
    vector, src/mk_internals.jl:488-495). This enables the TRIANGULAR
    rotation — while processing party p, parties p+1.. have structurally
    zero components, so their blocks are skipped (bit-identical;
    docs/mk_ksplit.md). Pass False for a pre-rotated/arbitrary accumulator.
    """
    l, b = bk.decomp_length, bk.log2_base
    steps = bk.parties * bk.lwe_size
    bara_flat = jnp.asarray(bara, jnp.int32).reshape(
        bara.shape[:-2] + (steps,)
    )
    bara_t = jnp.moveaxis(bara_flat, -1, 0)  # [steps, B]

    if _use_mk_expand_kernel(bk):
        # Fast path: per-step on-the-fly SPARSE expansion (the MK key CANNOT
        # be pre-baked at T=128 — it would be 42-262 GB — and the expanded
        # block matrix is mostly structural zeros) feeding the sparse-block
        # fused CMUX kernel. Steps are party-major, so each party's n-step
        # scan gets its own static nonzero-block pattern. The T<=64 baked /
        # prepared fallbacks below remain for CPU tests and odd geometries.
        from ..bootstrap import _default_depth
        from ..ops.karatsuba import expand_karatsuba_sparse, karatsuba_plan
        from ..tuning import get_tuning
        from ..ops.pallas_cmux import (
            cmux_step_pallas_sparse,
            mk_blind_rotate_pallas_chunk,
            mk_blind_rotate_pallas_compact,
        )
        from ..tgsw import decomp_offset

        n = bk.polynomial_degree
        t = 128
        depth = max(1, min(_default_depth() or 2,
                           (n // t).bit_length() - 1))
        plan = karatsuba_plan(n // t, depth, b)
        offset = decomp_offset(l, b, bk.balanced)
        k1 = bk.parties + 1
        n_lwe = bk.lwe_size
        interpret = jax.default_backend() != "tpu"
        progressive = trivial_masks and get_tuning().mk_progressive

        def active_plan(party):
            """Triangular-rotation restriction for this party's n-step loop.

            The rotation is party-major (reference order,
            src/mk_internals.jl:473-485) and the extern product only writes
            mask component i from blocks whose digits come from component i
            itself (the (i, i) diagonal) — so while processing party p, the
            accumulator components of parties p+1.. are STRUCTURALLY ZERO
            (decompose(0) == 0 in both gadget modes), their digit rows are
            zero, and every block touching them contributes exactly zero.
            Dropping those blocks and running the kernel on the active
            [masks 0..p, body] accumulator slice is bit-identical and cuts
            blocks/step from 3P+1 to 3p+4 (sum over parties: 1.27x/1.53x/
            1.72x fewer MACs at P = 2/4/8). Full derivation and the rank-k
            alternative's obstruction: docs/mk_ksplit.md.

            Returns (nz_orig, nz_kern, sel, k_act): original-index blocks
            (dense-operand selection in expand_karatsuba_sparse), the same
            blocks remapped to the active slice (kernel plan + scatter),
            positions into the stored full-nz axis (sparse keys), and the
            active component count.
            """
            full = mk_nonzero_blocks(party, bk.parties)
            k_act = party + 2
            if not progressive or k_act >= k1:
                return full, full, None, k1
            active = set(range(party + 1)) | {bk.parties}

            def remap(i):
                return i if i <= party else k_act - 1

            nz_orig, nz_kern, sel = [], [], []
            for pos, (j, kc) in enumerate(full):
                if j in active and kc in active:
                    nz_orig.append((j, kc))
                    nz_kern.append((remap(j), remap(kc)))
                    sel.append(pos)
            return tuple(nz_orig), tuple(nz_kern), tuple(sel), k_act

        def expand_one(limbs_i, nz_orig, nz_kern, sel):
            if bk.sparse:
                if sel is not None:
                    limbs_i = limbs_i[:, list(sel)]
                return expand_karatsuba_sparse(
                    limbs_i, t, plan, nz_kern, l, preselected=True)
            return expand_karatsuba_sparse(
                limbs_i, t, plan, nz_orig, l, preselected=False)

        def select_compact(limbs_p, nz_orig, sel):
            """The party's nz-selected compact limbs [steps, 4, NZ, l, 2N]
            for the compact megakernel (which expands IN-kernel)."""
            if bk.sparse:
                return (limbs_p if sel is None
                        else limbs_p[:, :, list(sel)])
            return jnp.stack(
                [limbs_p[:, :, j * l: (j + 1) * l, kc]
                 for (j, kc) in nz_orig], axis=2)

        def make_step(nz_orig, nz_kern, sel, k_act):
            def step(acc_a, xs):
                limbs_i, bara_i = xs
                e_i = expand_one(limbs_i, nz_orig, nz_kern, sel)
                out = cmux_step_pallas_sparse(
                    acc_a, e_i, bara_i, n=n, k1=k_act, l=l, b=b, t=t,
                    plan=plan, nz=nz_kern, offset=offset,
                    interpret=interpret,
                )
                return out, None
            return step

        def make_chunk_step(nz_orig, nz_kern, sel, k_act):
            # S steps per scan iteration: expand the whole chunk (one
            # batched XLA expansion), then ONE megakernel launch with the
            # accumulator resident in VMEM across the S steps — removes the
            # per-step acc HBM round-trip and 1/S of the scan-carry copies
            # (profiled at ~12% of the 2-party gate).
            expand_s = jax.vmap(
                lambda li: expand_one(li, nz_orig, nz_kern, sel))

            def step(acc_a, xs):
                limbs_c, bara_c = xs
                out = mk_blind_rotate_pallas_chunk(
                    acc_a, expand_s(limbs_c), bara_c, n=n, k1=k_act, l=l,
                    b=b, t=t, plan=plan, nz=nz_kern, offset=offset,
                    interpret=interpret,
                )
                return out, None
            return step

        def chunk_len(nz):
            # largest divisor of n_lwe <= 20 whose expanded chunk stays
            # under ~1 GB of HBM (8-party steps are 236 MB each)
            rows = plan.total_rows * len(nz) * l * t
            e_step = rows * 4 * t
            cap = get_tuning().mk_chunk
            if cap:
                return cap if n_lwe % cap == 0 else 1
            best = 1
            for d in range(2, 21):
                if n_lwe % d == 0 and d * e_step <= 2**30:
                    best = d
            return best

        from ..noise import mk_blind_rotate_var

        cv_out = accum.cv + mk_blind_rotate_var(
            bk.parties, bk.lwe_size, l, b, bk.polynomial_degree,
            bk.noise_stddev, bk.balanced)
        seg_len = n_lwe if segments <= 1 else -(-n_lwe * bk.parties
                                                // segments)
        run_seg = jax.jit(
            lambda a, li, ba, f: jax.lax.scan(f, a, (li, ba))[0],
            static_argnums=3,
        )
        acc_a = accum.a
        mega_mode = get_tuning().mk_mega
        # measured round 3 (batch 4096): the acc-resident chunk wins ~1% at
        # 4 parties and loses ~2% at 2 (the per-step HBM round-trip is fully
        # overlapped there) — auto picks per party count
        use_mega = (bk.parties >= 4 if mega_mode == "auto"
                    else mega_mode == "1")
        compact_mode = get_tuning().mk_compact
        # compact megakernel: in-kernel sparse expansion, acc resident for
        # the whole party loop — kills the per-step XLA expansion launches
        # and the expanded operand's HBM round-trip (round-5 measurement in
        # STATUS). Default for compiled TPU runs; interpret-mode tests force
        # it via the knob.
        use_compact = (compact_mode == "1"
                       or (compact_mode == "auto" and not interpret))
        for party in range(bk.parties):
            nz_orig, nz_kern, sel, k_act = active_plan(party)
            step = make_step(nz_orig, nz_kern, sel, k_act)
            p0 = party * n_lwe
            # sparse keys are per-party tuples (no jit-time slice copies)
            limbs_p = (bk.limbs[party] if bk.sparse
                       else bk.limbs[p0: p0 + n_lwe])
            if k_act < k1:
                # active slice: masks 0..party + body (the rest are zero)
                acc_run = jnp.concatenate(
                    [acc_a[:, : party + 1], acc_a[:, k1 - 1:]], axis=1)
            else:
                acc_run = acc_a
            if segments <= 1 and use_compact:
                acc_run = mk_blind_rotate_pallas_compact(
                    acc_run, select_compact(limbs_p, nz_orig, sel),
                    bara_t[p0: p0 + n_lwe], n=n, k1=k_act, l=l, b=b, t=t,
                    plan=plan, nz=nz_kern, offset=offset,
                    interpret=interpret)
            elif segments <= 1 and use_mega and \
                    (s_chunk := chunk_len(nz_kern)) > 1:
                n_chunks = n_lwe // s_chunk
                limbs_c = limbs_p.reshape(
                    (n_chunks, s_chunk) + limbs_p.shape[1:])
                bara_c = bara_t[p0: p0 + n_lwe].reshape(
                    n_chunks, s_chunk, -1)
                acc_run, _ = jax.lax.scan(
                    make_chunk_step(nz_orig, nz_kern, sel, k_act),
                    acc_run, (limbs_c, bara_c))
            elif segments <= 1:
                acc_run, _ = jax.lax.scan(
                    step, acc_run, (limbs_p, bara_t[p0: p0 + n_lwe]))
            else:
                for s0 in range(0, n_lwe, seg_len):
                    s1 = min(s0 + seg_len, n_lwe)
                    acc_run = run_seg(
                        acc_run, limbs_p[s0:s1],
                        bara_t[p0 + s0: p0 + s1], step)
            if k_act < k1:
                zeros = jnp.zeros(
                    acc_run.shape[:1] + (k1 - k_act, n), jnp.int32)
                acc_a = jnp.concatenate(
                    [acc_run[:, : party + 1], zeros, acc_run[:, -1:]],
                    axis=1)
            else:
                acc_a = acc_run
        return TLweSample(acc_a, cv_out)

    if bk.block:
        from ..bootstrap import mux_rotate_baked

        def step(acc_a, xs):
            e_i, bara_i = xs
            return mux_rotate_baked(
                acc_a, e_i, bara_i, l, b, bk.block, bk.balanced), None
    else:
        def step(acc_a, xs):
            limbs_i, bara_i = xs
            acc = TLweSample(acc_a, jnp.zeros(acc_a.shape[0], jnp.float32))
            from ..tgsw import tgsw_extern_mul_prepared
            from ..tlwe import tlwe_mul_by_monomial

            rot = tlwe_mul_by_monomial(acc, bara_i)
            temp = TLweSample(rot.a - acc_a, acc.cv)
            delta = tgsw_extern_mul_prepared(temp, limbs_i, l, b,
                                             bk.balanced)
            return acc_a + delta.a, None

    from ..noise import mk_blind_rotate_var

    cv_out = accum.cv + mk_blind_rotate_var(
        bk.parties, bk.lwe_size, l, b, bk.polynomial_degree, bk.noise_stddev,
        bk.balanced,
    )
    if segments <= 1:
        out_a, _ = jax.lax.scan(step, accum.a, (bk.limbs, bara_t))
        return TLweSample(out_a, cv_out)

    @jax.jit
    def run_segment(acc_a, limbs_seg, bara_seg):
        out_a, _ = jax.lax.scan(step, acc_a, (limbs_seg, bara_seg))
        return out_a

    seg_len = -(-steps // segments)
    acc_a = accum.a
    for s0 in range(0, steps, seg_len):
        acc_a = run_segment(
            acc_a, bk.limbs[s0 : s0 + seg_len], bara_t[s0 : s0 + seg_len]
        )
    return TLweSample(acc_a, cv_out)


def mk_blind_rotate_and_extract(v, bk: MKBootstrapKey, barb, bara,
                                segments: int = 1) -> MKLweSample:
    """Reference: src/mk_internals.jl:488-495."""
    testvectbis = polynomial.mul_by_monomial(v, -jnp.asarray(barb, jnp.int32))
    accum = mk_tlwe_noiseless_trivial(testvectbis, bk.parties)
    accum = mk_blind_rotate(accum, bk, bara, segments)
    return mk_tlwe_extract_sample(accum)


def mk_bootstrap_wo_keyswitch(bk: MKBootstrapKey, mu, x: MKLweSample,
                              segments: int = 1) -> MKLweSample:
    """Reference: src/mk_internals.jl:498-509."""
    from ..numeric import decode_message

    p_degree = bk.polynomial_degree
    bara = decode_message(x.a, p_degree * 2)  # [B, parties, n]
    barb = decode_message(x.b, p_degree * 2)  # [B]
    testvect = jnp.broadcast_to(
        jnp.asarray(mu, jnp.int32), x.b.shape + (p_degree,)
    )
    return mk_blind_rotate_and_extract(testvect, bk, barb, bara, segments)


def mk_bootstrap(bk: MKBootstrapKey, ks_keys, mu, x: MKLweSample,
                 segments: int = 1) -> MKLweSample:
    """Reference: src/mk_internals.jl:512-515."""
    u = mk_bootstrap_wo_keyswitch(bk, mu, x, segments)
    return mk_keyswitch(ks_keys, u)
