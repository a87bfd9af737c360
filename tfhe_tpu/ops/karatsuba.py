"""Block-level Karatsuba for the CMUX contraction — breaking the dense-MAC
ceiling while staying exact mod 2^32.

Round 1 computed the external product (reference hot kernel,
src/tgsw.jl:125-129) as a DENSE block-Toeplitz int8 matmul: M^2 = 64
(T=128, N=1024) super-block products per CMUX step, where one super-block
product is [B, P*T] x [P*T, K*4*T] (P = (k+1)*l operand polys, K = k+1
outputs, 4 torus limb planes). That algorithm's MAC count caps a v5e at
~6,200 gates/s (measured ~92% MXU utilization, STATUS round 1) — the
ceiling is ALGORITHMIC, not scheduling.

This module restructures the same arithmetic as a negacyclic polynomial
product over the block index: the full negacyclic N x N Toeplitz of a key
polynomial decomposes into T x T blocks W_d with W_{d+M} = -W_d, so

    out_o = sum_i D_i . W_{(o-i) mod 2M}   ==   C(z) = D(z) . E(z) mod z^M+1

with "coefficients" that multiply as (digit block-row) x (Toeplitz
super-block). Karatsuba over z then cuts super-block products 64 -> 40
(depth 2) -> 34 (depth 3), i.e. a 1.6x/1.88x algorithmic reduction, while
every remaining product is exactly the same int8 MXU dot as before:

* key-side combos (sums of W_d super-blocks) are formed at BAKE time in
  int32 — wraparound mod 2^32 is free — then limb-split into 4 int8 planes;
* digit-side combos are formed at gate time in int32 and split into one
  int8 limb when the combined bound fits [-128, 127] (sums of <= 2 digits
  for log2_base = 7), else two limbs (shifts 0, 7) — the 2-limb leaves are
  exactly the depth-3 "sum-of-sums" branches (7 of 27 leaves);
* reconstruction (overlap-add + the z^M = -1 fold) is int32 adds, exact.

Why not an NTT: modular (mod-p) arithmetic has no native path on the TPU —
every butterfly/pointwise product needs multi-limb VPU reduction chains,
which profiling puts far above the MXU cost it saves. Mod-2^32 block
Karatsuba keeps the "reduction" free (int32 wraparound) and all multiplies
on the MXU.

The plan (which leaves exist, their operand index-sets, their placement in
the output) is computed once per (M, depth, log2_base) as static Python
metadata shared by the XLA path (this file) and the fused Pallas kernel
(pallas_cmux.py); bit-exactness of every path is asserted against the dense
round-1 path, which is itself oracle-exact (tests/test_karatsuba.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

from .conv import _i8_matmul

_I32 = jnp.int32
_I8 = jnp.int8


@dataclasses.dataclass(frozen=True)
class Leaf:
    """One Karatsuba leaf: a linear convolution of two length-L combo
    sequences (same index-sets on the digit and key side)."""

    entries: tuple  # L tuples of original block indices to sum
    contribs: tuple  # ((offset, sign), ...) — placement in C(z)
    row_offset: int  # first super-block row of this leaf in the baked key
    d_shifts: tuple  # digit-side limb shifts: (0,) or (0, 7)

    @property
    def length(self) -> int:
        return len(self.entries)


@dataclasses.dataclass(frozen=True)
class KaratsubaPlan:
    m: int  # blocks per polynomial (N / T)
    depth: int
    log2_base: int
    leaves: tuple  # tuple[Leaf]
    total_rows: int  # super-block rows in the baked key (sum of leaf lengths)

    @property
    def macs_superblocks(self) -> int:
        """Super-block products per step (dense = m^2 per limb set)."""
        total = 0
        for lf in self.leaves:
            L = lf.length
            total += len(lf.d_shifts) * sum(
                min(L - 1, o) - max(0, o - L + 1) + 1 for o in range(2 * L - 1)
            )
        return total


def _digit_limb_shifts(bound: int) -> tuple:
    """Exact int8 limb decomposition shifts for |combo| <= bound
    (min combo >= -bound, max <= bound - 1, from digits in [-B/2, B/2))."""
    if bound <= 128:  # fits [-128, 127]
        return (0,)
    assert (bound + 64) // 128 + 1 <= 128, f"combo bound {bound} needs >2 limbs"
    return (0, 7)


@functools.lru_cache(maxsize=None)
def karatsuba_plan(m: int, depth: int, log2_base: int) -> KaratsubaPlan:
    """Static recursion metadata for a depth-`depth` split of length-m
    block sequences. depth=0 reproduces the dense linear convolution as a
    single leaf (used only for testing the scaffolding)."""
    assert m & (m - 1) == 0 and m >= 1
    depth = min(depth, m.bit_length() - 1)
    leaves = []

    def rec(entries, contribs, d):
        L = len(entries)
        if d == 0 or L == 1:
            # collapse duplicate offsets; drop cancelled ones
            acc = {}
            for off, sgn in contribs:
                acc[off] = acc.get(off, 0) + sgn
            contribs_c = tuple(sorted((o, s) for o, s in acc.items() if s))
            bound = (1 << (log2_base - 1)) * len(entries[0])
            leaves.append((entries, contribs_c, _digit_limb_shifts(bound)))
            return
        h = L // 2
        lo, hi = entries[:h], entries[h:]
        su = tuple(
            tuple(sorted(lo[j] + hi[j])) for j in range(h)
        )
        rec(lo, [(o, s) for o, s in contribs]
            + [(o + h, -s) for o, s in contribs], d - 1)
        rec(hi, [(o + 2 * h, s) for o, s in contribs]
            + [(o + h, -s) for o, s in contribs], d - 1)
        rec(su, [(o + h, s) for o, s in contribs], d - 1)

    rec(tuple((i,) for i in range(m)), [(0, 1)], depth)

    out, row = [], 0
    for entries, contribs, shifts in leaves:
        out.append(Leaf(entries, contribs, row, shifts))
        row += len(entries)
    return KaratsubaPlan(m, depth, log2_base, tuple(out), row)


# --- bake ---


@functools.lru_cache(maxsize=None)
def _block_window_index(n: int, t: int):
    """[M, T(u), T(w)] int32 index: W_d[u, w] = doubled[(d*T + w - u) mod 2N].
    NumPy constant (lru_cache must never hold traced arrays)."""
    m = n // t
    d = np.arange(m)[:, None, None]
    u = np.arange(t)[None, :, None]
    w = np.arange(t)[None, None, :]
    return ((d * t + w - u) % (2 * n)).astype(np.int32)


def bake_karatsuba(limbs_doubled, t: int, plan: KaratsubaPlan,
                   chunk: int = 8):
    """Bake per-leaf key combos into MXU-ready int8 storage.

    limbs_doubled: int8[n_steps, 4, P, K, 2N] (prepare_shared_torus output —
    the same raw form the dense bake consumes, so keys serialize once).
    Returns E: int8[n_steps, total_rows * P * T, K * 4 * T]; leaf `lf` owns
    row block [lf.row_offset * P*T, (lf.row_offset + L) * P*T), entries
    stored REVERSED (entry L-1 first) so every linear-conv output o consumes
    one contiguous slice.

    The int32 combos are reconstructed exactly from the int8 limbs
    (sum limb_j << 8j is the identity by construction), summed with int32
    wraparound, then re-split — so combos of combos stay exact mod 2^32.
    """
    steps, four, p, k, n2 = limbs_doubled.shape
    n = n2 // 2
    m = n // t
    assert plan.m == m
    idx = jnp.asarray(_block_window_index(n, t))  # [M, T, T]

    def bake_steps(limbs):  # [c, 4, P, K, 2N] -> [c, R*P*T, K*4*T]
        c = limbs.shape[0]
        # exact int32 reconstruction of the doubled key words
        words = (
            limbs[:, 0].astype(_I32)
            + (limbs[:, 1].astype(_I32) << 8)
            + (limbs[:, 2].astype(_I32) << 16)
            + (limbs[:, 3].astype(_I32) << 24)
        )  # [c, P, K, 2N] int32
        blocks = jnp.take(words, idx.reshape(-1), axis=-1).reshape(
            c, p, k, m, t, t
        )  # [c, P, K, M, T(u), T(w)] int32
        rows = []
        for lf in plan.leaves:
            for entry in reversed(lf.entries):
                comb = blocks[:, :, :, entry[0]]
                for d in entry[1:]:
                    comb = comb + blocks[:, :, :, d]  # int32 wraparound: exact
                rows.append(comb)  # [c, P, K, T, T]
        e = jnp.stack(rows, axis=1)  # [c, R, P, K, T(u), T(w)]
        from .conv import split_torus_limbs

        e = split_torus_limbs(e)  # [4, c, R, P, K, T, T] int8
        e = e.transpose(1, 2, 3, 5, 4, 0, 6)  # [c, R, P, T(u), K, 4, T(w)]
        return e.reshape(c, plan.total_rows * p * t, k * 4 * t)

    if steps <= chunk:
        return bake_steps(limbs_doubled)

    # Multi-GB keys: assemble chunks IN PLACE into a donated accumulator.
    # (concatenate/lax.map assembly would transiently hold two copies of the
    # full key — an instant HBM OOM at production sizes.)
    import jax

    rows, cols = plan.total_rows * p * t, k * 4 * t
    update = jax.jit(
        lambda buf, lim, s0: lax.dynamic_update_slice(
            buf, bake_steps(lim), (s0, 0, 0)
        ),
        donate_argnums=0,
    )
    out = jnp.zeros((steps, rows, cols), _I8)
    for s0 in range(0, steps, chunk):
        s0 = min(s0, steps - chunk)  # last chunk overlaps: same values, one compile
        out = update(out, lax.slice_in_dim(limbs_doubled, s0, s0 + chunk), s0)
    return out


@functools.lru_cache(maxsize=None)
def _toeplitz_select(t: int, lw: int):
    """Static 0/1 selector S[(u,w), j] = 1 iff j == t + w - u (NumPy — an
    lru_cache'd jnp array would leak tracers into later traces)."""
    u = np.arange(t)[:, None]
    w = np.arange(t)[None, :]
    sel = np.zeros((t * t, lw), np.int8)
    sel[np.arange(t * t), (t + w - u).reshape(-1)] = 1
    return sel


def expand_karatsuba_step(limbs_step, t: int, plan: KaratsubaPlan):
    """Gate-time expansion of ONE step's compact key into the leaf layout.

    limbs_step: int8[4, P, K, 2N] (prepare_shared_torus row). Returns the
    same [total_rows*P*T, K*4*T] int8 layout as `bake_karatsuba` — verified
    bit-identical — via the Toeplitz-selection int8 matmul (no gathers:
    TPU gathers run ~2 Gelem/s while the MXU moves the same data at
    134 GiB/s).

    Kept as the DENSE expansion; the multi-key hot path uses
    `expand_karatsuba_sparse` below (same machinery, nonzero blocks only).
    """
    four, p, k, n2 = limbs_step.shape
    n = n2 // 2
    m = n // t
    assert plan.m == m
    words = (
        limbs_step[0].astype(_I32)
        + (limbs_step[1].astype(_I32) << 8)
        + (limbs_step[2].astype(_I32) << 16)
        + (limbs_step[3].astype(_I32) << 24)
    )  # [P, K, 2N] int32, 2N-periodic doubled coefficients

    lw = 2 * t + 1  # window length: indices T+w-u span [1, 2T], all < LW

    def window(d):
        # indices d*T + w - u for u,w in [0,T) lie in [d*T-T+1, d*T+T);
        # slice [d*T-T, d*T+T+1) (mod 2N for d = 0)
        lo = d * t - t
        if 0 <= lo and lo + lw <= n2:
            return lax.slice_in_dim(words, lo, lo + lw, axis=-1)
        if lo < 0:  # wrap below (words is 2N-periodic)
            return jnp.concatenate(
                [lax.slice_in_dim(words, n2 + lo, n2, axis=-1),
                 lax.slice_in_dim(words, 0, lo + lw, axis=-1)], axis=-1)
        return jnp.concatenate(  # wrap above (d = 2M-1: one element over)
            [lax.slice_in_dim(words, lo, n2, axis=-1),
             lax.slice_in_dim(words, 0, lo + lw - n2, axis=-1)], axis=-1)

    from .conv import split_torus_limbs

    # Gather all entry combos first: [R, P, K, LW] int32 (tiny — the combos
    # sum in int32, wraparound exact), limb-split to int8, THEN expand.
    combos = []
    for lf in plan.leaves:
        for entry in reversed(lf.entries):
            comb = window(entry[0])
            for d in entry[1:]:
                comb = comb + window(d)  # int32 wraparound: exact
            combos.append(comb)
    r = len(combos)
    lb = split_torus_limbs(jnp.stack(combos))  # [4, R, P, K, LW] int8

    # Toeplitz expansion rows[u, w] = win[T + w - u] as ONE int8 MXU matmul
    # with a static 0/1 selection matrix (a gather-by-matmul: each Sel row
    # has exactly one 1, so the int32 product is the selected int8 value and
    # the narrowing cast is exact). Measured 134 GiB/s on-chip vs 53 GiB/s
    # for a T-way stack of shifted slices and ~24 GiB/s for log-doubling
    # rolls — lane-shift data movement is exactly what the MXU's systolic
    # broadcast does for free.
    sel = jnp.asarray(_toeplitz_select(t, lw))  # [T*T, LW] int8
    flat = lb.reshape(four * r * p * k, lw)
    prod = lax.dot_general(
        sel, flat.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [T*T, 4*R*P*K]
    e = prod.reshape(t, t, four, r, p, k).transpose(3, 4, 0, 5, 2, 1)
    return e.astype(jnp.int8).reshape(plan.total_rows * p * t, k * 4 * t)


def expand_karatsuba_sparse(limbs_step, t: int, plan: KaratsubaPlan,
                            nz, l: int, preselected: bool = False):
    """Sparse-block variant of `expand_karatsuba_step` for the multi-key
    operand, whose (parties+1)^2 block matrix is mostly structural zeros
    (reference block placement: src/mk_internals.jl:368-387 — only columns
    {i, party, body} of block row i carry data). Expands ONLY the `nz`
    static (j_blockrow, k_col) pairs.

    limbs_step: int8[4, P=(kk*l), K=kk, 2N] (dense prepared rows), or, with
    preselected=True, int8[4, NZ, l, 2N] (sparse-stored keys,
    build_extern_operand_sparse — same nz order). Returns
    int8[total_rows * NZ * l * T, 4 * T]: rows (entry r, nz index z, l', u)
    with entries in bake order, cols (limb, w) for that block's single
    output column. ~NZ/(kk^2) of the dense bytes AND MACs (13/25 at 4
    parties, 25/81 at 8).
    """
    four = limbs_step.shape[0]
    n2 = limbs_step.shape[-1]
    n = n2 // 2
    m = n // t
    assert plan.m == m
    lw = 2 * t + 1
    words = (
        limbs_step[0].astype(_I32)
        + (limbs_step[1].astype(_I32) << 8)
        + (limbs_step[2].astype(_I32) << 16)
        + (limbs_step[3].astype(_I32) << 24)
    )
    if preselected:
        assert words.shape[:2] == (len(nz), l)  # [NZ, l, 2N] already
    else:
        # select the nonzero (j, k) blocks BEFORE windowing: [NZ, l, 2N]
        words = jnp.stack(
            [lax.slice_in_dim(words, j * l, (j + 1) * l, axis=0)[:, kc]
             for (j, kc) in nz])

    def window(d):
        lo = d * t - t
        if 0 <= lo and lo + lw <= n2:
            return lax.slice_in_dim(words, lo, lo + lw, axis=-1)
        if lo < 0:
            return jnp.concatenate(
                [lax.slice_in_dim(words, n2 + lo, n2, axis=-1),
                 lax.slice_in_dim(words, 0, lo + lw, axis=-1)], axis=-1)
        return jnp.concatenate(
            [lax.slice_in_dim(words, lo, n2, axis=-1),
             lax.slice_in_dim(words, 0, lo + lw - n2, axis=-1)], axis=-1)

    from .conv import split_torus_limbs

    combos = []
    for lf in plan.leaves:
        for entry in reversed(lf.entries):
            comb = window(entry[0])
            for d in entry[1:]:
                comb = comb + window(d)  # int32 wraparound: exact
            combos.append(comb)
    r = len(combos)
    nzn = len(nz)
    lb = split_torus_limbs(jnp.stack(combos))  # [4, R, NZ, l, LW] int8

    sel = jnp.asarray(_toeplitz_select(t, lw))  # [T*T, LW] int8
    flat = lb.reshape(four * r * nzn * l, lw)
    prod = lax.dot_general(
        sel, flat.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [T*T, 4*R*NZ*l]
    e = prod.reshape(t, t, four, r, nzn, l).transpose(3, 4, 5, 0, 2, 1)
    # [R, NZ, l, T(u), 4, T(w)]
    return e.astype(jnp.int8).reshape(r * nzn * l * t, 4 * t)



def _digit_combos(digits, plan: KaratsubaPlan, t: int):
    """digits: int32[B, P, N] -> per-leaf int8 limb operands.

    Returns list over leaves of int8[S_leaf, B, L*P*T] with entry-major
    columns (entry j at columns [j*P*T, (j+1)*P*T), rows (p, u) within).
    """
    b, p, n = digits.shape
    m = n // t
    dblk = digits.reshape(b, p, m, t).transpose(0, 2, 1, 3).reshape(b, m, p * t)
    out = []
    for lf in plan.leaves:
        combos = []
        for entry in lf.entries:
            comb = dblk[:, entry[0]]
            for d in entry[1:]:
                comb = comb + dblk[:, d]
            combos.append(comb)
        v = jnp.concatenate(combos, axis=-1)  # [B, L*P*T] int32
        if lf.d_shifts == (0,):
            out.append(v.astype(_I8)[None])
        else:
            lo = ((v & 127) ^ 64) - 64
            hi = (v - lo) >> 7
            out.append(jnp.stack([lo.astype(_I8), hi.astype(_I8)]))
    return out


def karatsuba_delta_cols(digits, e_cols, t: int, plan: KaratsubaPlan,
                         group_ids, k_out: int):
    """Partial CMUX delta from a COLUMN SHARD of the baked key.

    e_cols: the column block of `bake_karatsuba` output holding the
    (k, limb) groups listed in `group_ids` (each one T-column group, in
    storage order). Returns int32[B, k_out, N] containing ONLY these groups'
    limb-shifted contributions — summing the results over all groups (e.g.
    with an int32 psum over a `model` mesh axis) reproduces
    `karatsuba_delta` bit-exactly (int32 wraparound addition commutes).
    This is the model-axis bootstrap-key sharding: per-device key bytes
    scale as 1/model.
    """
    b, p, n = digits.shape
    m = n // t
    g_local = len(group_ids)
    assert e_cols.shape[-1] == g_local * t
    pt = p * t

    d_ops = _digit_combos(digits, plan, t)
    acc = jnp.zeros((b, m, g_local * t), _I32)
    for lf, d_op in zip(plan.leaves, d_ops):
        L = lf.length
        base_row = lf.row_offset * pt
        for o in range(2 * L - 1):
            i0, i1 = max(0, o - L + 1), min(L - 1, o)
            lhs = d_op[:, :, i0 * pt: (i1 + 1) * pt]
            r0 = base_row + (L - 1 - o + i0) * pt
            rhs = e_cols[r0: r0 + (i1 - i0 + 1) * pt]
            prod = _i8_matmul(lhs.reshape(-1, lhs.shape[-1]), rhs)
            prod = prod.reshape(len(lf.d_shifts), b, g_local * t)
            rec = prod[0] if lf.d_shifts[0] == 0 else prod[0] << lf.d_shifts[0]
            for s in range(1, len(lf.d_shifts)):
                rec = rec + (prod[s] << lf.d_shifts[s])
            for off, sgn in lf.contribs:
                pos = off + o
                if pos >= 2 * m - 1:
                    continue
                sgn_f = sgn if pos < m else -sgn
                posm = pos % m
                acc = acc.at[:, posm].add(rec if sgn_f == 1 else -rec)
    out = jnp.zeros((b, k_out, m, t), _I32)
    for gi, (k, limb) in enumerate(group_ids):
        contrib = acc[:, :, gi * t: (gi + 1) * t]
        if limb:
            contrib = contrib << (8 * limb)
        out = out.at[:, k].add(contrib)
    return out.reshape(b, k_out, n)


def karatsuba_delta(digits, e_step, t: int, plan: KaratsubaPlan):
    """CMUX delta = sum_p conv(digits[:, p], key[p, :]) via the block plan.

    digits: int32[B, P, N] (|digits| < 2^(log2_base-1) from `decompose`);
    e_step: int8[total_rows*P*T, K*4*T] from `bake_karatsuba`.
    Returns int32[B, K, N]. Bit-exact vs the dense path
    (conv.block_toeplitz_matmul + recombine) for every depth.
    """
    b, p, n = digits.shape
    m = n // t
    cols = e_step.shape[-1]
    k_out = cols // (4 * t)
    pt = p * t

    d_ops = _digit_combos(digits, plan, t)
    # folded accumulator: C_o - C_{o+M}, accumulated directly at o mod M
    acc = jnp.zeros((b, m, cols), _I32)
    for lf, d_op in zip(plan.leaves, d_ops):
        L = lf.length
        base_row = lf.row_offset * pt
        for o in range(2 * L - 1):
            i0, i1 = max(0, o - L + 1), min(L - 1, o)
            lhs = d_op[:, :, i0 * pt: (i1 + 1) * pt]
            r0 = base_row + (L - 1 - o + i0) * pt
            rhs = e_step[r0: r0 + (i1 - i0 + 1) * pt]
            prod = _i8_matmul(lhs.reshape(-1, lhs.shape[-1]), rhs)
            prod = prod.reshape(len(lf.d_shifts), b, cols)
            rec = prod[0] if lf.d_shifts[0] == 0 else prod[0] << lf.d_shifts[0]
            for s in range(1, len(lf.d_shifts)):
                rec = rec + (prod[s] << lf.d_shifts[s])
            for off, sgn in lf.contribs:
                pos = off + o
                if pos >= 2 * m - 1:
                    continue  # C has length 2M-1; higher terms don't exist
                sgn_f = sgn if pos < m else -sgn
                posm = pos % m
                acc = acc.at[:, posm].add(rec if sgn_f == 1 else -rec)
    # limb recombination (k, limb, w) -> int32 words mod 2^32
    accr = acc.reshape(b, m, k_out, 4, t)
    out = accr[:, :, :, 0, :]
    for limb in range(1, 4):
        out = out + (accr[:, :, :, limb, :] << (8 * limb))
    return out.transpose(0, 2, 1, 3).reshape(b, k_out, n)
