"""Fused Pallas TPU kernels for the CMUX blind-rotation step.

Two kernels per scan step (reference hot loop: src/bootstrap.jl:19-39):

* `rotate_decompose` (VPU): barrel-rotate the accumulator by X^bara, subtract,
  gadget-decompose, split digit limbs — one pass per mask polynomial on clean
  2D [BT, 2N] tiles through a single scratch buffer. Digits are stored as
  [S, B, M*P*T] with the contraction order (i, j, i_l, u) laid out along
  lanes purely via 128-aligned slice writes (Mosaic forbids lane-splitting
  reshapes, which dictates T = 128 = lane width).

* `cmux_matmul` (MXU): ONE full-contraction int8 dot per output block. The
  baked key (ops/conv.py:bake_block_toeplitz) stores block shifts in the
  PERMUTED order baked[j] = shift (M-1-j) mod 2M, which makes output block
  o's weight window the single contiguous slice baked[M-1-o : 2M-1-o] — so
  the kernel DMAs one [M*P*T, cols] window per o (persisting across the
  batch-cell grid), runs one [BT, M*P*T] x [M*P*T, cols] dot, recombines the
  4 limb planes once, and adds the accumulator slice. Exact MAC count, zero
  gathers, zero copies.

Both kernels are bit-exact vs the XLA path (ops/conv.py) — asserted by
tests/test_pallas_cmux.py in interpret mode — hence exact vs the NumPy
oracle by composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tuning import get_tuning


def _rotate_decompose_kernel(bara_ref, acc_ref, dig_ref, *, n, k1, l, b, t,
                             s_limbs, offset):
    """Per-tile digits of (X^bara - 1) * acc, int8, layout [S, BT, M*P*T].

    bara_ref: [BT, 1] int32; acc_ref: [BT, k1, N] int32;
    dig_ref: [S, BT, M*P*T] int8, lane order (i, j, i_l, u), P = k1 * l.
    """
    shift2 = jnp.mod(bara_ref[...], 2 * n)  # [BT, 1] in [0, 2N)
    shift1 = shift2 & (n - 1)  # rotation within one period
    wrap = shift2 >= n  # [BT, 1] bool: X^N = -1 half-period flip
    stages = (n - 1).bit_length()
    mask = jnp.int32((1 << b) - 1)
    half = jnp.int32(1 << (b - 1))
    m = n // t
    pt = k1 * l * t
    bt = acc_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(scr):
        for j in range(k1):
            row = acc_ref[:, j, :]  # [BT, N]
            # Half-width barrel: rotate within one N-period (log2 N stages on
            # [BT, N] instead of log2 2N on [BT, 2N] — ~55% less VPU traffic)
            # then apply the negacyclic sign: out[r] = +-row[(r - s) mod N]
            # with -1 iff (r >= s mod N) XOR (s < N). In-place through one
            # scratch buffer to bound VMEM.
            scr[...] = row
            for s in range(stages):
                cur = scr[...]
                rolled = pltpu.roll(cur, 1 << s, axis=1)
                take = (shift1 >> s) & 1
                scr[...] = jnp.where(take != 0, rolled, cur)
            flip = (col >= shift1) ^ (~wrap)  # [BT, N]
            rotated = jnp.where(flip, -scr[...], scr[...])
            shifted = rotated - row + jnp.int32(offset)

            for i_l in range(l):
                d = ((shifted >> (32 - (i_l + 1) * b)) & mask) - half
                for i in range(m):
                    blk = d[:, i * t : (i + 1) * t]  # [BT, T] lane-aligned
                    seg = slice(i * pt + (j * l + i_l) * t,
                                i * pt + (j * l + i_l + 1) * t)
                    if s_limbs == 1:
                        dig_ref[0, :, seg] = blk.astype(jnp.int8)
                    else:
                        lo = ((blk & 15) ^ 8) - 8
                        hi = (blk - lo) >> 4
                        dig_ref[0, :, seg] = lo.astype(jnp.int8)
                        dig_ref[1, :, seg] = hi.astype(jnp.int8)

    pl.run_scoped(body, pltpu.VMEM((bt, n), jnp.int32))


def _cmux_matmul_kernel(dig_ref, acc_ref, e_hbm, out_ref, w_buf, sem, *,
                        n, k1, l, b, t, s_limbs, d_shifts):
    """Per-(o, cell) CMUX output block: out = acc + recombine(digits (x) W_o).

    dig_ref: [S, BT, M*P*T] int8 (VMEM); acc_ref/out_ref: [BT, k1, T] int32
    (the o-th column block); e_hbm: [2M*P*T, k1*4*T] int8 (HBM, PERMUTED-d,
    2D); w_buf: VMEM scratch [M*P*T, k1*4*T] int8 (persists across the cell
    grid dim — reloaded only when o changes); sem: DMA semaphore.
    """
    m = n // t
    bt = acc_ref.shape[0]
    pt_row = dig_ref.shape[-1]  # M*P*T
    pt = pt_row // m

    o = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _load_window():
        start = ((m - 1) - o) * pt  # contiguous rows, never wraps
        cp = pltpu.make_async_copy(
            e_hbm.at[pl.ds(start, m * pt)], w_buf, sem
        )
        cp.start()
        cp.wait()

    rec = None
    for s in range(s_limbs):
        prod = lax.dot_general(
            dig_ref[s], w_buf[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [BT, k1*4*T]
        if d_shifts[s]:
            prod = prod << d_shifts[s]
        rec = prod if rec is None else rec + prod

    for k in range(k1):
        acc_k = rec[:, (k * 4) * t : (k * 4 + 1) * t]
        for limb in range(1, 4):
            acc_k = acc_k + (
                rec[:, (k * 4 + limb) * t : (k * 4 + limb + 1) * t]
                << (8 * limb)
            )
        out_ref[:, k, :] = acc_ref[:, k, :] + acc_k


def _kernel_plan(plan, p: int, t: int, inline_combos: bool = False):
    """Lower a KaratsubaPlan into static kernel metadata.

    Returns (combo_writes, leaf_dots, comb_rows):
    * combo_writes: ((dst_row, src_blocks, shifts, leaf_len), ...) — one per
      combo-leaf entry; limb s of entry j lands at dcomb row
      dst_row + s*leaf_len (rows in PT units). Only non-singleton or
      multi-limb leaves materialize.
    * leaf_dots: ((e_row, L, lhs_descs, contribs), ...) per leaf, where
      lhs_descs = ((buffer_id, row_start, shift), ...) per digit limb
      (buffer 0 = raw digit scratch, 1 = combo scratch).
    * comb_rows: total dcomb rows (PT units).

    Singleton single-limb leaves slice the raw digit buffer directly: their
    entry index-sets are consecutive original blocks by construction (L/H
    splits preserve contiguous ranges), so no copy is ever needed.
    """
    combo_writes = []
    leaf_dots = []
    comb_row = 0
    for lf in plan.leaves:
        L = lf.length
        singleton = all(len(e) == 1 for e in lf.entries)
        if singleton and lf.d_shifts == (0,):
            first = lf.entries[0][0]
            assert tuple(e[0] for e in lf.entries) == tuple(
                range(first, first + L)
            )
            lhs_descs = ((0, first, 0),)
        elif inline_combos and lf.d_shifts == (0,):
            # single-limb combo: the tiled kernel sums digit blocks inline
            # (exact in int8: sums of digits bounded by the plan's
            # _digit_limb_shifts check), no dcomb materialization
            lhs_descs = ((2, lf.entries, 0),)
        else:
            base = comb_row
            n_s = len(lf.d_shifts)
            for j, entry in enumerate(lf.entries):
                combo_writes.append((base + j, entry, lf.d_shifts, L))
            lhs_descs = tuple(
                (1, base + s * L, lf.d_shifts[s]) for s in range(n_s)
            )
            comb_row += n_s * L
        leaf_dots.append((lf.row_offset, L, lhs_descs, lf.contribs))
    return tuple(combo_writes), tuple(leaf_dots), comb_row


def _fused_karatsuba_kernel(bara_ref, acc_hbm, e_hbm, out_hbm, acc_ref,
                            dig_ref, dcomb_ref, ebuf_ref, cacc_ref, sem,
                            sem_io, *, n, k1, l, b, t, offset, combo_writes,
                            leaf_dots, dig_i32, ablate=()):
    """One fully-fused CMUX step: rotate -> decompose -> digit combos ->
    per-leaf int8 dots (double-buffered key DMA) -> limb recombine ->
    fold/scatter -> accumulator update. See module docstring for layouts.

    acc in/out ride MANUAL single-buffered DMA (acc_hbm/out_hbm in ANY
    space): the VMEM this frees over pipelined BlockSpecs is what lets the
    batch tile reach 256 rows, halving how often the step's whole key is
    re-streamed (E traffic scales as B/BT). The rotate scratch reuses
    cacc_ref's first N lanes — cacc is only zeroed after the digits exist.
    """
    m = n // t
    p = k1 * l
    pt = p * t
    bt = acc_ref.shape[0]
    cols = ebuf_ref.shape[-1]
    kt = k1 * t
    c = pl.program_id(0)

    cp_in = pltpu.make_async_copy(
        acc_hbm.at[pl.ds(c * bt, bt)], acc_ref, sem_io)
    if "io" not in ablate:
        cp_in.start()

    shift2 = jnp.mod(bara_ref[...], 2 * n)
    shift1 = shift2 & (n - 1)
    wrap = shift2 >= n
    stages = (n - 1).bit_length()
    mask = jnp.int32((1 << b) - 1)
    half = jnp.int32(1 << (b - 1))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    if "io" not in ablate:
        cp_in.wait()

    # --- rotate + decompose into dig_ref [BT, M*PT], lane order (i, j, i_l, u)
    # (cacc_ref's first N lanes double as the barrel scratch; zeroed later)
    for j in range(k1 if "rot" not in ablate else 0):
        row = acc_ref[:, j * n: (j + 1) * n]
        cacc_ref[:, 0:n] = row
        for s in range(stages):
            cur = cacc_ref[:, 0:n]
            rolled = pltpu.roll(cur, 1 << s, axis=1)
            take = (shift1 >> s) & 1
            cacc_ref[:, 0:n] = jnp.where(take != 0, rolled, cur)
        flip = (col >= shift1) ^ (~wrap)
        rotated = jnp.where(flip, -cacc_ref[:, 0:n], cacc_ref[:, 0:n])
        shifted = rotated - row + jnp.int32(offset)
        for i_l in range(l):
            d = ((shifted >> (32 - (i_l + 1) * b)) & mask) - half
            for i in range(m):
                seg = slice(i * pt + (j * l + i_l) * t,
                            i * pt + (j * l + i_l + 1) * t)
                blk = d[:, i * t: (i + 1) * t]
                dig_ref[:, seg] = blk if dig_i32 else blk.astype(jnp.int8)

    # --- digit combos (int32 sums -> exact int8 limb splits)
    for dst_row, src_blocks, shifts, leaf_len in combo_writes:
        comb = dig_ref[:, src_blocks[0] * pt: (src_blocks[0] + 1) * pt]
        comb = comb.astype(jnp.int32)
        for blk in src_blocks[1:]:
            comb = comb + dig_ref[:, blk * pt: (blk + 1) * pt].astype(jnp.int32)
        if len(shifts) == 1:
            dcomb_ref[:, dst_row * pt: (dst_row + 1) * pt] = comb.astype(
                jnp.int8)
        else:
            lo = ((comb & 127) ^ 64) - 64
            hi = (comb - lo) >> 7
            dcomb_ref[:, dst_row * pt: (dst_row + 1) * pt] = lo.astype(jnp.int8)
            r2 = dst_row + leaf_len
            dcomb_ref[:, r2 * pt: (r2 + 1) * pt] = hi.astype(jnp.int8)

    # --- leaf dots with double-buffered E streaming
    def e_dma(li):
        e_row, L, _, _ = leaf_dots[li]
        return pltpu.make_async_copy(
            e_hbm.at[pl.ds(e_row * pt, L * pt)],
            ebuf_ref.at[li % 2, pl.ds(0, L * pt)],
            sem.at[li % 2],
        )

    cacc_ref[...] = jnp.zeros(cacc_ref.shape, jnp.int32)
    n_leaves = len(leaf_dots)
    if "dots" in ablate:
        leaf_dots = leaf_dots[:0]
    else:
        e_dma(0).start()
    for li, (e_row, L, lhs_descs, contribs) in enumerate(leaf_dots):
        if li + 1 < n_leaves and "dma" not in ablate:
            e_dma(li + 1).start()
        if li == 0 or "dma" not in ablate:
            e_dma(li).wait()
        for o in range(2 * L - 1):
            i0, i1 = max(0, o - L + 1), min(L - 1, o)
            width = (i1 - i0 + 1) * pt
            rhs = ebuf_ref[li % 2, pl.ds((L - 1 - o + i0) * pt, width)]
            rec = None
            for buf_id, row0, d_shift in lhs_descs:
                src = dcomb_ref if buf_id else dig_ref
                lhs = src[:, (row0 + i0) * pt: (row0 + i0) * pt + width]
                if dig_i32 and buf_id == 0:
                    lhs = lhs.astype(jnp.int8)
                prod = lax.dot_general(
                    lhs, rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [BT, K*4*T]
                if d_shift:
                    prod = prod << d_shift
                rec = prod if rec is None else rec + prod
            # limb recombination -> [BT, K*T] int32 words (exact mod 2^32)
            word = None
            for k in range(k1):
                wk = rec[:, (k * 4) * t: (k * 4 + 1) * t]
                for limb in range(1, 4):
                    wk = wk + (
                        rec[:, (k * 4 + limb) * t: (k * 4 + limb + 1) * t]
                        << (8 * limb)
                    )
                word = wk if word is None else jnp.concatenate(
                    [word, wk], axis=-1)
            # fold/scatter into cacc (flat [BT, M*K*T], block pos-major)
            for off, sgn in contribs:
                pos = off + o
                if pos >= 2 * m - 1:
                    continue
                sgn_f = sgn if pos < m else -sgn
                posm = pos % m
                cur = cacc_ref[:, posm * kt: (posm + 1) * kt]
                cacc_ref[:, posm * kt: (posm + 1) * kt] = (
                    cur + word if sgn_f == 1 else cur - word
                )

    # --- accumulator update in place, then DMA back to HBM
    for k in range(k1):
        for i in range(m):
            dst = pl.ds(k * n + i * t, t)
            acc_ref[:, dst] = (
                acc_ref[:, dst]
                + cacc_ref[:, i * kt + k * t: i * kt + (k + 1) * t]
            )
    if "io" not in ablate:
        cp_out = pltpu.make_async_copy(
            acc_ref, out_hbm.at[pl.ds(c * bt, bt)], sem_io)
        cp_out.start()
        cp_out.wait()


def _rotate_decompose_body(acc_ref, cacc_ref, dig_ref, bara_row, *, n, k1, l,
                           b, t, offset, dig_i32, acc_flat=False):
    """Shared rotate+decompose: digits of (X^bara - 1) * acc into dig_ref.

    bara_row: int32[BT] values in [0, 2N). cacc_ref's first N lanes are the
    barrel scratch (caller zeroes cacc afterwards). acc_flat: acc_ref is
    [BT, k1*N] (2D layouts keep Mosaic DMA slicing happy for k1 > 2).
    """
    m = n // t
    p = k1 * l
    pt = p * t
    shift2 = jnp.mod(bara_row[:, None], 2 * n)
    shift1 = shift2 & (n - 1)
    wrap = shift2 >= n
    stages = (n - 1).bit_length()
    mask = jnp.int32((1 << b) - 1)
    half = jnp.int32(1 << (b - 1))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    for j in range(k1):
        row = acc_ref[:, j * n: (j + 1) * n] if acc_flat else acc_ref[:, j, :]
        cacc_ref[:, 0:n] = row
        for s in range(stages):
            cur = cacc_ref[:, 0:n]
            rolled = pltpu.roll(cur, 1 << s, axis=1)
            take = (shift1 >> s) & 1
            cacc_ref[:, 0:n] = jnp.where(take != 0, rolled, cur)
        flip = (col >= shift1) ^ (~wrap)
        rotated = jnp.where(flip, -cacc_ref[:, 0:n], cacc_ref[:, 0:n])
        shifted = rotated - row + jnp.int32(offset)
        for i_l in range(l):
            d = ((shifted >> (32 - (i_l + 1) * b)) & mask) - half
            for i in range(m):
                seg = slice(i * pt + (j * l + i_l) * t,
                            i * pt + (j * l + i_l + 1) * t)
                blk = d[:, i * t: (i + 1) * t]
                dig_ref[:, seg] = blk if dig_i32 else blk.astype(jnp.int8)


def _combo_body(dig_ref, dcomb_ref, combo_writes, pt):
    """Digit combos: int32 sums of digit blocks -> exact int8 limb splits."""
    for dst_row, src_blocks, shifts, leaf_len in combo_writes:
        comb = dig_ref[:, src_blocks[0] * pt: (src_blocks[0] + 1) * pt]
        comb = comb.astype(jnp.int32)
        for blk in src_blocks[1:]:
            comb = comb + dig_ref[:, blk * pt: (blk + 1) * pt].astype(jnp.int32)
        if len(shifts) == 1:
            dcomb_ref[:, dst_row * pt: (dst_row + 1) * pt] = comb.astype(
                jnp.int8)
        else:
            lo = ((comb & 127) ^ 64) - 64
            hi = (comb - lo) >> 7
            dcomb_ref[:, dst_row * pt: (dst_row + 1) * pt] = lo.astype(jnp.int8)
            r2 = dst_row + leaf_len
            dcomb_ref[:, r2 * pt: (r2 + 1) * pt] = hi.astype(jnp.int8)


def _leaf_dots_body(dig_ref, dcomb_ref, ebuf_ref, cacc_ref, leaf_dots, *,
                    k1, t, pt, m, dig_i32, slot_of, wait_leaf, start_next):
    """All leaf dots + limb recombine + fold/scatter for one step.

    slot_of(li) -> ebuf slot; wait_leaf(li) waits for that leaf's DMA;
    start_next(li) kicks off the following leaf's DMA (cross-step capable).
    """
    kt = k1 * t
    for li, (e_row, L, lhs_descs, contribs) in enumerate(leaf_dots):
        start_next(li)
        wait_leaf(li)
        slot = slot_of(li)
        for o in range(2 * L - 1):
            i0, i1 = max(0, o - L + 1), min(L - 1, o)
            width = (i1 - i0 + 1) * pt
            rhs = ebuf_ref[slot, pl.ds((L - 1 - o + i0) * pt, width)]
            rec = None
            for buf_id, row0, d_shift in lhs_descs:
                src = dcomb_ref if buf_id else dig_ref
                lhs = src[:, (row0 + i0) * pt: (row0 + i0) * pt + width]
                if dig_i32 and buf_id == 0:
                    lhs = lhs.astype(jnp.int8)
                prod = lax.dot_general(
                    lhs, rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if d_shift:
                    prod = prod << d_shift
                rec = prod if rec is None else rec + prod
            word = None
            for k in range(k1):
                wk = rec[:, (k * 4) * t: (k * 4 + 1) * t]
                for limb in range(1, 4):
                    wk = wk + (
                        rec[:, (k * 4 + limb) * t: (k * 4 + limb + 1) * t]
                        << (8 * limb)
                    )
                word = wk if word is None else jnp.concatenate(
                    [word, wk], axis=-1)
            for off, sgn in contribs:
                pos = off + o
                if pos >= 2 * m - 1:
                    continue
                sgn_f = sgn if pos < m else -sgn
                posm = pos % m
                cur = cacc_ref[:, posm * kt: (posm + 1) * kt]
                cacc_ref[:, posm * kt: (posm + 1) * kt] = (
                    cur + word if sgn_f == 1 else cur - word
                )


def _leaf_dots_core(dig_ref, dcomb_ref, cacc_ref, leaf, rhs_at, *,
                    k1, t, pt, m, dig_i32):
    """Dots + limb recombine + fold/scatter for ONE leaf; `rhs_at(o, i0,
    width)` supplies the E operand slice (DMA'd slot or VMEM-resident).

    All 2L-1 output dots are issued BEFORE any recombine/fold: each
    recombine depends only on its own dot, so the VPU epilogue of output o
    can run while the MXU is still crunching outputs o+1... — emitting
    dot -> recon -> dot serially instead measurably stalls the MXU behind
    each output's VPU tail.
    """
    kt = k1 * t
    _, L, lhs_descs, contribs = leaf
    recs = []
    for o in range(2 * L - 1):
        i0, i1 = max(0, o - L + 1), min(L - 1, o)
        width = (i1 - i0 + 1) * pt
        rhs = rhs_at(o, i0, width)
        rec = None
        for buf_id, row0, d_shift in lhs_descs:
            src = dcomb_ref if buf_id else dig_ref
            lhs = src[:, (row0 + i0) * pt: (row0 + i0) * pt + width]
            if dig_i32 and buf_id == 0:
                lhs = lhs.astype(jnp.int8)
            prod = lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if d_shift:
                prod = prod << d_shift
            rec = prod if rec is None else rec + prod
        recs.append(rec)
    for o, rec in enumerate(recs):
        word = None
        for k in range(k1):
            wk = rec[:, (k * 4) * t: (k * 4 + 1) * t]
            for limb in range(1, 4):
                wk = wk + (
                    rec[:, (k * 4 + limb) * t: (k * 4 + limb + 1) * t]
                    << (8 * limb)
                )
            word = wk if word is None else jnp.concatenate(
                [word, wk], axis=-1)
        for off, sgn in contribs:
            pos = off + o
            if pos >= 2 * m - 1:
                continue
            sgn_f = sgn if pos < m else -sgn
            posm = pos % m
            cur = cacc_ref[:, posm * kt: (posm + 1) * kt]
            cacc_ref[:, posm * kt: (posm + 1) * kt] = (
                cur + word if sgn_f == 1 else cur - word
            )


def _one_leaf_dots(dig_ref, dcomb_ref, ebuf_ref, cacc_ref, leaf, slot, *,
                   k1, t, pt, m, dig_i32):
    """`_leaf_dots_core` against the E tile resident in ebuf slot `slot`."""
    L = leaf[1]

    def rhs_at(o, i0, width):
        return ebuf_ref[slot, pl.ds((L - 1 - o + i0) * pt, width)]

    _leaf_dots_core(dig_ref, dcomb_ref, cacc_ref, leaf, rhs_at,
                    k1=k1, t=t, pt=pt, m=m, dig_i32=dig_i32)


def _rotate_decompose_thunks(acc_ref, scr_ref, dig_ref, bara_row, *, n, k1, l,
                             b, t, offset, dig_i32):
    """The rotate+decompose of `_rotate_decompose_body` as a list of 0-arg
    thunks, so the pipelined megakernel can interleave this subtile's VPU
    work between the OTHER subtile's MXU leaf dots. Sequential execution of
    the thunks is bit-identical to `_rotate_decompose_body`.

    acc_ref is the FLAT [BT, k1*N] accumulator (2D layouts keep Mosaic HBM
    DMA slicing legal for odd k1 — sublane tiling rejects a k1=3 slice of a
    3D [B, k1, N] memref; the bytes are identical either way).

    scr_ref must be a [BT, >=N] int32 region private to this subtile; it
    carries the barrel state between thunks and holds `shifted` for the
    digit-extraction thunks.
    """
    m = n // t
    p = k1 * l
    pt = p * t
    stages = (n - 1).bit_length()
    half_stages = stages // 2
    mask = jnp.int32((1 << b) - 1)
    half = jnp.int32(1 << (b - 1))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def shifts():
        shift2 = jnp.mod(bara_row[:, None], 2 * n)
        return shift2 & (n - 1), shift2 >= n

    thunks = []
    for j in range(k1):
        def t_lo(j=j):
            shift1, _ = shifts()
            scr_ref[:, 0:n] = acc_ref[:, j * n: (j + 1) * n]
            for s in range(half_stages):
                cur = scr_ref[:, 0:n]
                rolled = pltpu.roll(cur, 1 << s, axis=1)
                take = (shift1 >> s) & 1
                scr_ref[:, 0:n] = jnp.where(take != 0, rolled, cur)

        def t_hi(j=j):
            shift1, wrap = shifts()
            for s in range(half_stages, stages):
                cur = scr_ref[:, 0:n]
                rolled = pltpu.roll(cur, 1 << s, axis=1)
                take = (shift1 >> s) & 1
                scr_ref[:, 0:n] = jnp.where(take != 0, rolled, cur)
            flip = (col >= shift1) ^ (~wrap)
            rotated = jnp.where(
                flip, -scr_ref[:, 0:n], scr_ref[:, 0:n])
            scr_ref[:, 0:n] = (
                rotated - acc_ref[:, j * n: (j + 1) * n] + jnp.int32(offset))

        thunks.extend([t_lo, t_hi])
        for i_l in range(l):
            def t_dig(j=j, i_l=i_l):
                d = ((scr_ref[:, 0:n] >> (32 - (i_l + 1) * b)) & mask) - half
                for i in range(m):
                    seg = slice(i * pt + (j * l + i_l) * t,
                                i * pt + (j * l + i_l + 1) * t)
                    blk = d[:, i * t: (i + 1) * t]
                    dig_ref[:, seg] = blk if dig_i32 else blk.astype(jnp.int8)

            thunks.append(t_dig)
    return thunks


def _combo_thunks(dig_ref, dcomb_ref, combo_writes, pt, groups=2):
    """`_combo_body` split into `groups` thunks (appended after the rotate
    thunks — combos read the full digit buffer)."""
    if not combo_writes:
        return []
    chunks = []
    per = max(1, -(-len(combo_writes) // groups))
    for g0 in range(0, len(combo_writes), per):
        part = combo_writes[g0: g0 + per]

        def t_comb(part=part):
            _combo_body(dig_ref, dcomb_ref, part, pt)

        chunks.append(t_comb)
    return chunks


def _pipelined_visits(n_leaves: int, n_slots: int):
    """Static leaf-visit schedule for the two-subtile pipelined megakernel.

    Both subtiles read the SAME per-step E leaves from one shared slot ring.
    Slots are assigned by VISIT POSITION (slot = v % n_slots over the
    2*n_leaves-visit step cycle, requiring n_slots | 2*n_leaves), so any
    ring size works and every slot's occupancy windows are exactly n_slots
    visits apart. That makes the "start the fetch for visit v at visit
    v - (n_slots-1)" rule safe — the previous occupant's last read is at
    v - n_slots — and gives a fetch lead of n_slots - 1 leaf-dot times.

    * phase 1 (subtile A): leaves ascending, all fetched.
    * phase 2 (subtile B): first re-read the min(n_slots, n_leaves) - 0 ...
      tiles still resident from phase 1's tail (the leaf whose phase-1 visit
      shares the slot), then fetch the remaining leaves.

    Returns (visits, lead): visits is a 2*n_leaves tuple of
    (subtile, leaf, slot, fetch?, starts) where starts lists
    (dstep, leaf, slot) fetches to kick off at this visit.
    """
    n_v = 2 * n_leaves
    assert n_v % n_slots == 0 and n_slots <= n_leaves
    lead = n_slots - 1
    p1 = list(range(n_leaves))
    # phase-2 rereads: visit v' (= n_leaves..) shares slot with phase-1
    # visit v' - n_slots; reread that leaf while it is still resident
    reread = [p1[v - n_slots] for v in range(n_leaves, n_leaves + n_slots)
              if v - n_slots < n_leaves]
    rest = [lf for lf in reversed(range(n_leaves)) if lf not in reread]
    p2 = reread + rest
    assert sorted(p2) == list(range(n_leaves))
    seq = [(0, lf, True) for lf in p1] + [
        (1, lf, i >= len(reread)) for i, lf in enumerate(p2)]
    visits = [
        [sub, lf, v % n_slots, fetch, []]
        for v, (sub, lf, fetch) in enumerate(seq)
    ]
    # attach each fetch to the visit `lead` positions earlier; wrapping past
    # the cycle start means the start is issued during the PREVIOUS cycle,
    # i.e. with dstep +1 relative to the issuing step
    for v, (sub, lf, slot, fetch, _) in enumerate(visits):
        if fetch:
            src = (v - lead) % n_v
            visits[src][4].append((1 if v - lead < 0 else 0, lf, slot))
    out = []
    for v, (sub, lf, slot, fetch, starts) in enumerate(visits):
        fixed = tuple(
            (1 if v + lead >= n_v else dstep, f_lf, f_slot)
            for (dstep, f_lf, f_slot) in starts
        )
        out.append((sub, lf, slot, fetch, fixed))
    return tuple(out), lead


def _blind_rotate_pipelined_kernel(
        bara_ref, acc_hbm, e_hbm, out_hbm, acc_a_ref, acc_b_ref, dig_a_ref,
        dig_b_ref, dcomb_a_ref, dcomb_b_ref, ebuf_ref, cacc_a_ref, cacc_b_ref,
        sem, sem_io, *, n, k1, l, b, t, offset, combo_writes, leaf_dots,
        dig_i32, n_steps, n_slots, visits):
    """Two-subtile software-pipelined blind rotation (one launch).

    Each 2*BT-row batch cell is split into independent subtiles A and B.
    Step s runs as two phases: phase 1 = A's leaf dots (MXU) interleaved
    with B's rotate/decompose thunks (VPU) for step s; phase 2 = B's dots
    interleaved with A's rotate for step s+1. The VPU work that the serial
    megakernel paid ~0.26 ms/step for thus overlaps the MXU dots, and both
    subtiles share one E fetch stream (schedule: `_pipelined_visits`).
    Bit-exact vs the serial megakernel by construction (same thunk bodies,
    same order per subtile).
    """
    m = n // t
    p = k1 * l
    pt = p * t
    bt = acc_a_ref.shape[0]
    c = pl.program_id(0)
    n_leaves = len(leaf_dots)

    cp_a = pltpu.make_async_copy(
        acc_hbm.at[pl.ds(c * 2 * bt, bt)], acc_a_ref, sem_io)
    cp_b = pltpu.make_async_copy(
        acc_hbm.at[pl.ds(c * 2 * bt + bt, bt)], acc_b_ref, sem_io)
    cp_a.start()
    cp_b.start()

    def e_dma(step, li, slot):
        e_row, L, _, _ = leaf_dots[li]
        return pltpu.make_async_copy(
            e_hbm.at[step, pl.ds(e_row * pt, L * pt)],
            ebuf_ref.at[slot, pl.ds(0, L * pt)],
            sem.at[slot],
        )

    # warm-up: fetches owed to the first `lead` visits of step 0
    lead = n_slots - 1
    for v in range(lead):
        sub, lf, slot, fetch, _ = visits[v]
        if fetch:
            e_dma(0, lf, slot).start()
    cp_a.wait()
    cp_b.wait()

    refs = (
        (acc_a_ref, dig_a_ref, dcomb_a_ref, cacc_a_ref),
        (acc_b_ref, dig_b_ref, dcomb_b_ref, cacc_b_ref),
    )

    def rotate_thunks(sub, s_idx):
        acc_r, dig_r, dcomb_r, cacc_r = refs[sub]
        # clamp: at the last step, phase 2 builds (guarded, skipped) thunks
        # for step n_steps — the row load itself must stay in bounds.
        # bara_ref is [1, 2, n_steps, BT]: static subtile index ahead of the
        # step index, so the dynamic step load starts at lane offset 0
        # (Mosaic rejects dynamic loads at a 128-lane column offset).
        bara_row = bara_ref[0, sub, jnp.minimum(s_idx, n_steps - 1), :]
        th = _rotate_decompose_thunks(
            acc_r, cacc_r, dig_r, bara_row,
            n=n, k1=k1, l=l, b=b, t=t, offset=offset, dig_i32=dig_i32)
        th += _combo_thunks(dig_r, dcomb_r, combo_writes, pt)
        return th

    def acc_update(sub):
        acc_r, _, _, cacc_r = refs[sub]
        kt = k1 * t
        for k in range(k1):
            for i in range(m):
                dst = pl.ds(k * n + i * t, t)
                acc_r[:, dst] = (
                    acc_r[:, dst]
                    + cacc_r[:, i * kt + k * t: i * kt + (k + 1) * t]
                )

    # prologue: rotate+decompose subtile A for step 0 (nothing to overlap)
    for th in rotate_thunks(0, 0):
        th()

    def step_body(s, _):
        half = len(visits) // 2
        for ph, base in ((0, 0), (1, half)):
            # dots subtile: A in phase 0, B in phase 1
            d_sub = ph
            o_sub = 1 - ph
            o_step = s if ph == 0 else s + 1
            acc_r, dig_r, dcomb_r, cacc_r = refs[d_sub]
            cacc_r[...] = jnp.zeros(cacc_r.shape, jnp.int32)
            other = rotate_thunks(o_sub, o_step)
            n_v = half

            def run_other(vi, other=other, o_step=o_step, ph=ph):
                # distribute the other subtile's thunks across visits
                if "rot" in get_tuning().pipe_ablate:
                    return  # timing-only ablation: results are wrong
                lo = (len(other) * vi) // n_v
                hi = (len(other) * (vi + 1)) // n_v
                for th in other[lo:hi]:
                    if ph == 1:  # step s+1 rotate: skip past the end
                        @pl.when(o_step < n_steps)
                        def _(th=th):
                            th()
                    else:
                        th()

            for vi in range(n_v):
                sub, lf, slot, fetch, starts = visits[base + vi]
                assert sub == d_sub
                for dstep, f_lf, f_slot in starts:
                    f_step = s + dstep

                    @pl.when(f_step < n_steps)
                    def _(f_step=f_step, f_lf=f_lf, f_slot=f_slot):
                        e_dma(f_step, f_lf, f_slot).start()
                if fetch:
                    e_dma(s, lf, slot).wait()
                _one_leaf_dots(
                    dig_r, dcomb_r, ebuf_ref, cacc_r, leaf_dots[lf], slot,
                    k1=k1, t=t, pt=pt, m=m, dig_i32=dig_i32)
                run_other(vi)
            acc_update(d_sub)
        return 0

    jax.lax.fori_loop(0, n_steps, step_body, 0)
    cp_a2 = pltpu.make_async_copy(
        acc_a_ref, out_hbm.at[pl.ds(c * 2 * bt, bt)], sem_io)
    cp_a2.start()
    cp_a2.wait()
    cp_b2 = pltpu.make_async_copy(
        acc_b_ref, out_hbm.at[pl.ds(c * 2 * bt + bt, bt)], sem_io)
    cp_b2.start()
    cp_b2.wait()


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "plan", "offset", "interpret",
                     "btk"),
)
def blind_rotate_pallas_pipelined(acc, e_all, bara_t, *, n, k1, l, b, t, plan,
                                  offset, interpret=False, btk=None):
    """Whole blind rotation, two-subtile pipelined megakernel.

    Same contract as `blind_rotate_pallas_karatsuba`; requires the batch to
    divide into 2*BT-row cells. Bit-exact vs the serial megakernel
    (tests/test_pallas_cmux.py runs both in interpret mode).
    """
    assert n & (n - 1) == 0
    b_sz = acc.shape[0]
    m = n // t
    p = k1 * l
    pt = p * t
    cols = k1 * 4 * t
    n_steps = e_all.shape[0]

    combo_writes, leaf_dots, comb_rows = _kernel_plan(plan, p, t)
    max_l = max(L for _, L, _, _ in leaf_dots)
    dig_i32 = b > 8
    bt = _pick_tile(b_sz // 2, btk or get_tuning().btp)
    n_leaves = len(leaf_dots)
    want_slots = get_tuning().pslots
    n_slots = 1
    for cand in range(min(want_slots, n_leaves), 0, -1):
        if (2 * n_leaves) % cand == 0:
            n_slots = cand
            break
    visits, _ = _pipelined_visits(n_leaves, n_slots)

    fn = functools.partial(
        _blind_rotate_pipelined_kernel,
        n=n, k1=k1, l=l, b=b, t=t, offset=offset,
        combo_writes=combo_writes, leaf_dots=leaf_dots, dig_i32=dig_i32,
        n_steps=n_steps, n_slots=n_slots, visits=visits,
    )
    dig_dt = jnp.int32 if dig_i32 else jnp.int8
    n_cells = b_sz // (2 * bt)
    # [cells, 2, n_steps, bt]: subtile index ahead of the step index so the
    # kernel's dynamic-step row loads start at lane offset 0 (rotate_thunks)
    bara4 = bara_t.reshape(n_steps, n_cells, 2, bt).transpose(1, 2, 0, 3)
    out = pl.pallas_call(
        fn,
        out_shape=jax.ShapeDtypeStruct((b_sz, k1 * n), jnp.int32),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((1, 2, n_steps, bt), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bt, k1 * n), jnp.int32),  # acc A (flat: odd-k1 DMA)
            pltpu.VMEM((bt, k1 * n), jnp.int32),  # acc B
            pltpu.VMEM((bt, m * pt), dig_dt),  # dig A
            pltpu.VMEM((bt, m * pt), dig_dt),  # dig B
            pltpu.VMEM((bt, max(comb_rows, 1) * pt), jnp.int8),  # dcomb A
            pltpu.VMEM((bt, max(comb_rows, 1) * pt), jnp.int8),  # dcomb B
            pltpu.VMEM((n_slots, max_l * pt, cols), jnp.int8),  # shared E ring
            pltpu.VMEM((bt, m * k1 * t), jnp.int32),  # cacc A (+rot scratch)
            pltpu.VMEM((bt, m * k1 * t), jnp.int32),  # cacc B (+rot scratch)
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        # two subtiles' scratches + the shared E ring + Mosaic stack temps
        # run ~17 MB at bt=128 — past the 16 MB default scoped limit but
        # comfortably inside the v5e's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bara4, acc.reshape(b_sz, k1 * n), e_all)
    return out.reshape(b_sz, k1, n)


def _sparse_plan(plan, l: int, p: int, t: int, nz):
    """Static metadata for the sparse-block multi-key kernel.

    One unit per (leaf, nonzero (j, k) block): `e_tiles` are the E row
    offsets of the leaf's L entry-tiles (each [l*T, 4T], contiguous in the
    expand_karatsuba_sparse layout), `outs` give, per linear-conv output o,
    the digit-side operand descs (j-sliced out of the dense dig/dcomb
    buffers) and the folded scatter positions into output column k.
    """
    combo_writes, leaf_dots, comb_rows = _kernel_plan(
        plan, p, t, inline_combos=True)
    lt = l * t
    pt = p * t
    m = plan.m
    nzn = len(nz)
    units = []
    for e_row, L, lhs_descs, contribs in leaf_dots:
        for zi, (j, k_col) in enumerate(nz):
            e_tiles = tuple(
                ((e_row + a) * nzn + zi) * lt for a in range(L))
            outs = []
            for o in range(2 * L - 1):
                i0, i1 = max(0, o - L + 1), min(L - 1, o)
                ops = []
                for i in range(i0, i1 + 1):
                    a = L - 1 - o + i  # packed (reversed) entry slot
                    descs = []
                    for desc in lhs_descs:
                        if desc[0] == 2:  # inline digit-block sum
                            descs.append((2, tuple(
                                blk * pt + j * lt for blk in desc[1][i]), 0))
                        else:
                            buf, row0, sh = desc
                            descs.append((buf, (row0 + i) * pt + j * lt, sh))
                    ops.append((a, tuple(descs)))
                placed = []
                for off, sgn in contribs:
                    pos = off + o
                    if pos >= 2 * m - 1:
                        continue
                    placed.append((pos % m, sgn if pos < m else -sgn))
                outs.append((tuple(ops), tuple(placed)))
            units.append((e_tiles, k_col, tuple(outs)))
    return combo_writes, tuple(units), comb_rows


def _unit_dots_body(dig_ref, dcomb_ref, acc_ref, unit, rhs_at, *, n, t, lt,
                    dig_i32):
    """Dots + limb recombine + scatter for ONE sparse-block unit, writing
    the accumulator in place. `rhs_at(a)` supplies entry slot a's [l*T, 4T]
    E tile (DMA'd slot or just-expanded VMEM)."""
    _, k_col, outs = unit
    for ops, placed in outs:
        pacc = None
        for a, descs in ops:
            rhs = rhs_at(a)
            rec = None
            for buf, lrow0, d_shift in descs:
                if buf == 2:
                    # Mosaic has no int8 vector adds: sum in int32, then
                    # narrow (exact: plan bounds digit sums to int8)
                    lhs = dig_ref[:, lrow0[0]: lrow0[0] + lt].astype(
                        jnp.int32)
                    for rr in lrow0[1:]:
                        lhs = lhs + dig_ref[:, rr: rr + lt].astype(
                            jnp.int32)
                    lhs = lhs.astype(jnp.int8)
                else:
                    src = dcomb_ref if buf else dig_ref
                    lhs = src[:, lrow0: lrow0 + lt]
                    if dig_i32 and buf == 0:
                        lhs = lhs.astype(jnp.int8)
                prod = lax.dot_general(
                    lhs, rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if d_shift:
                    prod = prod << d_shift
                rec = prod if rec is None else rec + prod
            pacc = rec if pacc is None else pacc + rec
        word = pacc[:, 0:t]
        for limb in range(1, 4):
            word = word + (pacc[:, limb * t: (limb + 1) * t] << (8 * limb))
        for posm, sgn in placed:
            dst = pl.ds(k_col * n + posm * t, t)
            if sgn == 1:
                acc_ref[:, dst] = acc_ref[:, dst] + word
            else:
                acc_ref[:, dst] = acc_ref[:, dst] - word


def _sparse_mk_kernel(bara_ref, acc_hbm, e_hbm, out_hbm, acc_ref, dig_ref,
                      dcomb_ref, ebuf_ref, rot_ref, sem, sem_io, *, n, k1, l,
                      b, t, offset, combo_writes, units, dig_i32):
    """Fused multi-key CMUX step over the SPARSE block structure: only the
    nonzero (block row, output column) pairs of the expanded operand are
    streamed and multiplied, and a leaf's L entry-tiles stay resident in
    VMEM for all its 2L-1 outputs (the dense tiled kernel re-streamed each
    entry per output). Bit-exact vs the prepared XLA path.
    """
    lt = l * t
    bt = acc_ref.shape[0]
    c = pl.program_id(0)

    cp_in = pltpu.make_async_copy(
        acc_hbm.at[pl.ds(c * bt, bt)], acc_ref, sem_io)
    cp_in.start()
    cp_in.wait()

    _rotate_decompose_body(
        acc_ref, rot_ref, dig_ref, bara_ref[:, 0],
        n=n, k1=k1, l=l, b=b, t=t, offset=offset, dig_i32=dig_i32,
        acc_flat=True)
    _combo_body(dig_ref, dcomb_ref, combo_writes, k1 * lt)

    def unit_dmas(ui, slot):
        e_tiles = units[ui][0]
        return [
            pltpu.make_async_copy(
                e_hbm.at[pl.ds(r0, lt)],
                ebuf_ref.at[slot, pl.ds(a * lt, lt)],
                sem.at[slot, a],
            )
            for a, r0 in enumerate(e_tiles)
        ]

    n_units = len(units)
    for cp in unit_dmas(0, 0):
        cp.start()
    for ui, unit in enumerate(units):
        slot = ui % 2
        if ui + 1 < n_units:
            for cp in unit_dmas(ui + 1, (ui + 1) % 2):
                cp.start()
        for cp in unit_dmas(ui, slot):
            cp.wait()
        _unit_dots_body(
            dig_ref, dcomb_ref, acc_ref, unit,
            lambda a, slot=slot: ebuf_ref[slot, pl.ds(a * lt, lt), :],
            n=n, t=t, lt=lt, dig_i32=dig_i32)

    cp_out = pltpu.make_async_copy(
        acc_ref, out_hbm.at[pl.ds(c * bt, bt)], sem_io)
    cp_out.start()
    cp_out.wait()


def _sparse_mk_megakernel(bara_ref, acc_hbm, e_hbm, out_hbm, acc_ref, dig_ref,
                          dcomb_ref, ebuf_ref, rot_ref, sem, sem_io, *, n, k1,
                          l, b, t, offset, combo_writes, units, dig_i32,
                          n_steps, e_step_rows):
    """A CHUNK of multi-key CMUX steps in one launch: fori_loop over the
    chunk's steps with the accumulator resident in VMEM (the per-step kernel
    pays a [B, k1*N] HBM round-trip per step), sparse-unit E streaming with
    cross-step lookahead. Bit-exact vs scanning cmux_step_pallas_sparse.

    e_hbm: [n_steps * e_step_rows, 4T] (chunk-stacked expand_karatsuba_sparse
    rows); bara_ref block: [1, n_steps, BT].
    """
    lt = l * t
    bt = acc_ref.shape[0]
    c = pl.program_id(0)
    n_units = len(units)

    cp_in = pltpu.make_async_copy(
        acc_hbm.at[pl.ds(c * bt, bt)], acc_ref, sem_io)
    cp_in.start()

    def unit_dmas(step, ui, slot):
        e_tiles = units[ui][0]
        return [
            pltpu.make_async_copy(
                e_hbm.at[pl.ds(step * e_step_rows + r0, lt)],
                ebuf_ref.at[slot, pl.ds(a * lt, lt)],
                sem.at[slot, a],
            )
            for a, r0 in enumerate(e_tiles)
        ]

    cp_in.wait()

    def step_body(s, _):
        # unit 0's fetch hides behind the step's rotate/decompose VPU work
        # (cross-step prefetch would need step-parity slot juggling: the
        # unit count is odd, so the in-step slot = ui % 2 ring restarts)
        for cp in unit_dmas(s, 0, 0):
            cp.start()
        _rotate_decompose_body(
            acc_ref, rot_ref, dig_ref, bara_ref[0, s, :],
            n=n, k1=k1, l=l, b=b, t=t, offset=offset, dig_i32=dig_i32,
            acc_flat=True)
        _combo_body(dig_ref, dcomb_ref, combo_writes, k1 * lt)

        for ui, unit in enumerate(units):
            slot = ui % 2
            if ui + 1 < n_units:
                for cp in unit_dmas(s, ui + 1, (ui + 1) % 2):
                    cp.start()
            for cp in unit_dmas(s, ui, slot):
                cp.wait()
            _unit_dots_body(
                dig_ref, dcomb_ref, acc_ref, unit,
                lambda a, slot=slot: ebuf_ref[slot, pl.ds(a * lt, lt), :],
                n=n, t=t, lt=lt, dig_i32=dig_i32)
        return 0

    jax.lax.fori_loop(0, n_steps, step_body, 0)
    cp_out = pltpu.make_async_copy(
        acc_ref, out_hbm.at[pl.ds(c * bt, bt)], sem_io)
    cp_out.start()
    cp_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "plan", "nz", "offset",
                     "interpret", "btk"),
)
def mk_blind_rotate_pallas_chunk(acc, e_chunk, bara_t, *, n, k1, l, b, t,
                                 plan, nz, offset, interpret=False, btk=None):
    """A chunk of S multi-key CMUX steps as ONE fused launch.

    acc: int32[B, k1, N]; e_chunk: int8[S, rows, 4T] (vmapped
    expand_karatsuba_sparse); bara_t: int32[S, B]. Bit-exact vs scanning
    cmux_step_pallas_sparse over the S steps (tests/test_mk_megakernel.py).
    """
    assert n & (n - 1) == 0
    b_sz = acc.shape[0]
    m = n // t
    p = k1 * l
    pt = p * t
    lt = l * t
    s_steps, e_step_rows, _ = e_chunk.shape

    combo_writes, units, comb_rows = _sparse_plan(plan, l, p, t, nz)
    dig_i32 = b > 8
    max_l = max(len(u[0]) for u in units)

    if btk is None:
        btk = get_tuning().mk_btk
    if not btk:
        ebuf = 2 * max_l * lt * 4 * t

        def scratch(bt_):
            return bt_ * (
                k1 * n * 4 + m * pt * (4 if dig_i32 else 1)
                + max(comb_rows, 1) * pt + n * 4)

        btk = 64
        for cand in (1024, 512, 256, 128):
            if scratch(cand) + ebuf <= 64 * 2**20:
                btk = cand
                break
    bt = _pick_tile(b_sz, btk)
    n_cells = b_sz // bt

    fn = functools.partial(
        _sparse_mk_megakernel,
        n=n, k1=k1, l=l, b=b, t=t, offset=offset,
        combo_writes=combo_writes, units=units, dig_i32=dig_i32,
        n_steps=s_steps, e_step_rows=e_step_rows,
    )
    bara3 = bara_t.reshape(s_steps, n_cells, bt).transpose(1, 0, 2)
    out = pl.pallas_call(
        fn,
        out_shape=jax.ShapeDtypeStruct((b_sz, k1 * n), jnp.int32),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((1, s_steps, bt), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bt, k1 * n), jnp.int32),
            pltpu.VMEM((bt, m * pt), jnp.int32 if dig_i32 else jnp.int8),
            pltpu.VMEM((bt, max(comb_rows, 1) * pt), jnp.int8),
            pltpu.VMEM((2, max_l * lt, 4 * t), jnp.int8),
            pltpu.VMEM((bt, n), jnp.int32),
            pltpu.SemaphoreType.DMA((2, max_l)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bara3, acc.reshape(b_sz, k1 * n),
      e_chunk.reshape(s_steps * e_step_rows, 4 * t))
    return out.reshape(b_sz, k1, n)


def _mk_compact_megakernel(limbs_ref, bara_ref, acc_hbm, out_hbm, acc_all,
                           words_ref, comb_ref, base_ref, ebuf_ref, dig_ref,
                           dcomb_ref, rot_ref, sem_io, *, n, k1, l, b, t,
                           offset, combo_writes, units, units_exp, dig_i32,
                           n_steps):
    """Multi-key blind rotation from the COMPACT key: grid over the steps,
    the whole batch group's accumulator resident in VMEM, each step's sparse
    nonzero blocks expanded IN-KERNEL (one strided lane rotate per
    entry-tile, exactly the single-key compact machinery of
    `_expand_entries_body` applied to the sparse MK layout) and consumed
    straight from VMEM. The expanded operand never exists in HBM, and the
    per-step XLA expansion launches of the chunked path
    (mk/internals.py expand_one) disappear entirely.

    Because rotate/decompose and the unit dots run over the FULL resident
    group (the MXU tiles large row counts internally), each step's expansion
    runs exactly once per group — there is no batch-cell loop to amortize
    against. Bit-exact vs scanning cmux_step_pallas_sparse
    (tests/test_mk_megakernel.py).

    limbs_ref block: int8[1, 4*NZ*l, 2N] (nz-selected compact limbs);
    bara_ref block: int32[1, group]; units_exp[ui] = (zi, entries) with
    entries the unit's leaf entry index-sets in packed (reversed) order.
    """
    lt = l * t
    t2 = 2 * t
    n2 = 2 * n
    zl = words_ref.shape[0]  # NZ * l
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _load_acc():
        cp = pltpu.make_async_copy(acc_hbm, acc_all, sem_io)
        cp.start()
        cp.wait()

    # --- words reconstruction: int8 limb rows -> int32 doubled words
    lb = limbs_ref[0]
    words_ref[...] = (
        lb[0:zl].astype(jnp.int32)
        + (lb[zl: 2 * zl].astype(jnp.int32) << 8)
        + (lb[2 * zl: 3 * zl].astype(jnp.int32) << 16)
        + (lb[3 * zl: 4 * zl].astype(jnp.int32) << 24)
    )

    # --- rotate + decompose + combos over the full group
    _rotate_decompose_body(
        acc_all, rot_ref, dig_ref, bara_ref[0, 0, :],
        n=n, k1=k1, l=l, b=b, t=t, offset=offset, dig_i32=dig_i32,
        acc_flat=True)
    _combo_body(dig_ref, dcomb_ref, combo_writes, k1 * lt)

    def window(zi, d):
        rows = slice(zi * l, (zi + 1) * l)
        lo = d * t - t
        if lo < 0:  # d == 0 wraps below (words are 2N-periodic)
            return jnp.concatenate(
                [words_ref[rows, n2 + lo:], words_ref[rows, 0: lo + t2]],
                axis=-1)
        return words_ref[rows, lo: lo + t2]

    for ui, unit in enumerate(units):
        zi, gentries = units_exp[ui]
        # expand this unit's entry tiles into ebuf: tile[a][l'*T+u, limb*T+w]
        # = limb_split(C_a[l', T + w - u]) via one strided roll per entry
        # (cross-block wrap only contaminates lanes < u of each 2T block,
        # which the [T, 2T) read window never touches)
        for a, entry in enumerate(gentries):
            comb = window(zi, entry[0])
            for d in entry[1:]:
                comb = comb + window(zi, d)  # int32 wraparound: exact
            comb_ref[...] = comb  # [l, 2T]
            for lj in range(l):
                base_ref[:, lj * t2: (lj + 1) * t2] = jnp.broadcast_to(
                    comb_ref[lj: lj + 1, :], (t, t2))
            rolled = pltpu.roll(base_ref[...], 0, 1, stride=1, stride_axis=0)
            for lj in range(l):
                cur = rolled[:, lj * t2 + t: (lj + 1) * t2]  # [T, T] int32
                for limb in range(4):
                    lo8 = ((cur & 255) ^ 128) - 128  # balanced low byte
                    ebuf_ref[a * lt + lj * t: a * lt + (lj + 1) * t,
                             limb * t: (limb + 1) * t] = lo8.astype(jnp.int8)
                    if limb < 3:
                        cur = (cur - lo8) >> 8
        _unit_dots_body(
            dig_ref, dcomb_ref, acc_all, unit,
            lambda a: ebuf_ref[pl.ds(a * lt, lt), :],
            n=n, t=t, lt=lt, dig_i32=dig_i32)

    @pl.when(s == n_steps - 1)
    def _store_acc():
        cp = pltpu.make_async_copy(acc_all, out_hbm, sem_io)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "plan", "nz", "offset",
                     "interpret", "group_budget"),
)
def mk_blind_rotate_pallas_compact(acc, limbs, bara_t, *, n, k1, l, b, t,
                                   plan, nz, offset, interpret=False,
                                   group_budget=None):
    """A party's full n-step multi-key blind rotation from the COMPACT key
    as grid-over-steps megakernel launches with in-kernel sparse expansion.

    acc: int32[B, k1, N] (k1 = active components, triangular rotation);
    limbs: int8[n_steps, 4, NZ, l, 2N] — the nz-selected compact prepared
    limbs (sparse-stored keys sliced by `sel`, or dense prepared keys with
    the nz blocks stacked); bara_t: int32[n_steps, B] in [0, 2N).
    The batch splits into groups whose resident accumulator + digit buffers
    fit `group_budget` of VMEM; each group re-runs the per-step expansion
    (measured negligible on the single-key compact path). Bit-exact vs the
    per-step sparse kernel. Reference hot loop: src/mk_internals.jl:473-485.
    """
    assert n & (n - 1) == 0
    b_sz = acc.shape[0]
    m = n // t
    p = k1 * l
    pt = p * t
    lt = l * t
    n_steps = limbs.shape[0]
    nzn = len(nz)
    assert limbs.shape[1:] == (4, nzn, l, 2 * n), limbs.shape

    combo_writes, units, comb_rows = _sparse_plan(plan, l, p, t, nz)
    dig_i32 = b > 8
    max_l = max(len(u[0]) for u in units)

    units_exp = []
    for lf in plan.leaves:
        gentries = tuple(tuple(e) for e in reversed(lf.entries))
        for zi in range(nzn):
            units_exp.append((zi, gentries))
    units_exp = tuple(units_exp)

    if group_budget is None:
        group_budget = get_tuning().mk_group_mb << 20
    row_bytes = (k1 * n * 4 + m * pt * (4 if dig_i32 else 1) + n * 4
                 + max(comb_rows, 1) * pt)
    group = _pick_tile(b_sz, max(1, min(b_sz, group_budget // row_bytes)))
    zl = nzn * l

    fn = functools.partial(
        _mk_compact_megakernel,
        n=n, k1=k1, l=l, b=b, t=t, offset=offset,
        combo_writes=combo_writes, units=units, units_exp=units_exp,
        dig_i32=dig_i32, n_steps=n_steps,
    )
    run = pl.pallas_call(
        fn,
        out_shape=jax.ShapeDtypeStruct((group, k1 * n), jnp.int32),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 4 * zl, 2 * n), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            # [n_steps, 1, group]: the unit middle dim keeps the block's
            # last two dims equal to the array's (Mosaic tiling rule)
            pl.BlockSpec((1, 1, group), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # acc group: one-time DMA in
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # one-time DMA out
        scratch_shapes=[
            pltpu.VMEM((group, k1 * n), jnp.int32),  # resident accumulator
            pltpu.VMEM((zl, 2 * n), jnp.int32),  # step's doubled words
            pltpu.VMEM((l, 2 * t), jnp.int32),  # entry combo windows
            pltpu.VMEM((t, l * 2 * t), jnp.int32),  # roll base
            pltpu.VMEM((max_l * lt, 4 * t), jnp.int8),  # expanded unit tiles
            pltpu.VMEM((group, m * pt), jnp.int32 if dig_i32 else jnp.int8),
            pltpu.VMEM((group, max(comb_rows, 1) * pt), jnp.int8),
            pltpu.VMEM((group, n), jnp.int32),  # rotate barrel scratch
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )
    limbs_r = limbs.reshape(n_steps, 4 * zl, 2 * n)
    outs = []
    for g0 in range(0, b_sz, group):
        outs.append(run(
            limbs_r, bara_t[:, None, g0: g0 + group],
            lax.slice_in_dim(acc.reshape(b_sz, k1 * n), g0, g0 + group)))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(b_sz, k1, n)


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "plan", "nz", "offset",
                     "interpret", "btk"),
)
def cmux_step_pallas_sparse(acc, e_step, bara, *, n, k1, l, b, t, plan, nz,
                            offset, interpret=False, btk=None):
    """Sparse-block multi-key CMUX step (reference contraction:
    src/mk_internals.jl:368-387, which also only touches the nonzero
    blocks). acc: int32[B, k1, N]; e_step: expand_karatsuba_sparse layout;
    bara: int32[B]; nz: static ((j, k), ...) nonzero block pairs.
    Bit-exact vs mux_rotate_karatsuba / the prepared XLA path.
    """
    assert n & (n - 1) == 0
    b_sz = acc.shape[0]
    m = n // t
    p = k1 * l
    pt = p * t
    lt = l * t

    combo_writes, units, comb_rows = _sparse_plan(plan, l, p, t, nz)
    dig_i32 = b > 8
    max_l = max(len(u[0]) for u in units)

    if btk is None:
        btk = get_tuning().mk_btk
    if not btk:
        ebuf = 2 * max_l * lt * 4 * t

        def scratch(bt_):
            return bt_ * (
                k1 * n * 4 + m * pt * (4 if dig_i32 else 1)
                + max(comb_rows, 1) * pt + n * 4)

        # Largest batch tile whose scratches + double-buffered E tiles fit
        # ~64 MB of the v5e's 128 MB VMEM (the scoped limit is raised below;
        # staying at the old 16 MB default forced 8-party tiles to 64 rows —
        # half the MXU's 128 row lanes wasted on every dot). Big tiles also
        # cut the per-cell re-streaming of the expanded sparse operand, the
        # next-largest cost after the dots (2-party: 1,472 gates/s at 256
        # rows -> 1,617 at 1024, batch 4096).
        btk = 64
        for cand in (1024, 512, 256, 128):
            if scratch(cand) + ebuf <= 64 * 2**20:
                btk = cand
                break
    bt = _pick_tile(b_sz, btk)

    fn = functools.partial(
        _sparse_mk_kernel,
        n=n, k1=k1, l=l, b=b, t=t, offset=offset,
        combo_writes=combo_writes, units=units, dig_i32=dig_i32,
    )
    out = pl.pallas_call(
        fn,
        out_shape=jax.ShapeDtypeStruct((b_sz, k1 * n), jnp.int32),
        grid=(b_sz // bt,),
        in_specs=[
            pl.BlockSpec((bt, 1), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bt, k1 * n), jnp.int32),  # acc tile (2D: k1 may be odd)
            pltpu.VMEM((bt, m * pt), jnp.int32 if dig_i32 else jnp.int8),
            pltpu.VMEM((bt, max(comb_rows, 1) * pt), jnp.int8),
            pltpu.VMEM((2, max_l * lt, 4 * t), jnp.int8),
            pltpu.VMEM((bt, n), jnp.int32),  # rotate barrel scratch
            pltpu.SemaphoreType.DMA((2, max_l)),
            pltpu.SemaphoreType.DMA(()),
        ],
        # many-party scratches exceed the 16 MB default scoped limit at
        # full-width tiles; the v5e has 128 MB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bara.reshape(b_sz, 1), acc.reshape(b_sz, k1 * n), e_step)
    return out.reshape(b_sz, k1, n)


def _blind_rotate_megakernel(bara_ref, acc_hbm, e_hbm, out_hbm, acc_ref,
                             dig_ref, dcomb_ref, ebuf_ref, cacc_ref, sem,
                             sem_io, *, n, k1, l, b, t, offset, combo_writes,
                             leaf_dots, dig_i32, n_steps, n_slots):
    """The FULL blind rotation in one kernel launch: grid over batch cells,
    fori_loop over the n CMUX steps inside, the accumulator resident in VMEM
    for the whole rotation (one HBM round-trip per cell total, vs one per
    step for the per-step kernel), key leaves streamed with double buffering
    that crosses step boundaries.
    """
    m = n // t
    p = k1 * l
    pt = p * t
    bt = acc_ref.shape[0]
    c = pl.program_id(0)
    n_leaves = len(leaf_dots)

    cp_in = pltpu.make_async_copy(
        acc_hbm.at[pl.ds(c * bt, bt)], acc_ref, sem_io)
    cp_in.start()

    def e_dma(step, li, slot):
        e_row, L, _, _ = leaf_dots[li]
        return pltpu.make_async_copy(
            e_hbm.at[step, pl.ds(e_row * pt, L * pt)],
            ebuf_ref.at[slot, pl.ds(0, L * pt)],
            sem.at[slot],
        )

    # warm-up: first n_slots-1 leaves of step 0 (slot = li % n_slots,
    # consistent with the static assignment since n_slots divides n_leaves)
    if n_slots > 1:
        for li in range(n_slots - 1):
            e_dma(0, li % n_leaves, li % n_slots).start()
    cp_in.wait()

    def step_body(s, _):
        # n_slots divides n_leaves, so slot assignment is STATIC (li % slots)
        # and consistent across step boundaries — the prefetch n_slots ahead
        # in the global leaf stream lands exactly in the slot being freed.
        def slot_of(li):
            return li % n_slots

        def wait_leaf(li):
            if n_slots == 1:  # degenerate: serial start+wait per leaf
                e_dma(s, li, 0).start()
            e_dma(s, li, slot_of(li)).wait()

        def start_next(li):
            if n_slots == 1:
                return  # no lookahead possible with a single slot
            # lookahead n_slots-1: the target slot held leaf li-1, whose
            # dots are already done — prefetching n_slots ahead would land
            # in the slot THIS leaf is about to read (a DMA/compute race)
            ahead = li + n_slots - 1
            nli = ahead % n_leaves
            ns = s + ahead // n_leaves

            @pl.when(ns < n_steps)
            def _():
                e_dma(ns, nli, slot_of(ahead)).start()

        bara_row = bara_ref[s, :]
        if "rot" not in get_tuning().pipe_ablate:
            _rotate_decompose_body(
                acc_ref, cacc_ref, dig_ref, bara_row,
                n=n, k1=k1, l=l, b=b, t=t, offset=offset, dig_i32=dig_i32,
                acc_flat=True)
            _combo_body(dig_ref, dcomb_ref, combo_writes, pt)
        cacc_ref[...] = jnp.zeros(cacc_ref.shape, jnp.int32)
        _leaf_dots_body(
            dig_ref, dcomb_ref, ebuf_ref, cacc_ref, leaf_dots,
            k1=k1, t=t, pt=pt, m=m, dig_i32=dig_i32,
            slot_of=slot_of, wait_leaf=wait_leaf, start_next=start_next)
        kt = k1 * t
        for k in range(k1):
            for i in range(m):
                dst = pl.ds(k * n + i * t, t)
                acc_ref[:, dst] = (
                    acc_ref[:, dst]
                    + cacc_ref[:, i * kt + k * t: i * kt + (k + 1) * t]
                )
        return 0

    jax.lax.fori_loop(0, n_steps, step_body, 0)
    cp_out = pltpu.make_async_copy(
        acc_ref, out_hbm.at[pl.ds(c * bt, bt)], sem_io)
    cp_out.start()
    cp_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "plan", "offset", "interpret",
                     "btk"),
)
def blind_rotate_pallas_karatsuba(acc, e_all, bara_t, *, n, k1, l, b, t, plan,
                                  offset, interpret=False, btk=None):
    """Whole blind rotation (all steps) as ONE fused Pallas launch.

    acc: int32[B, k1, N]; e_all: int8[n_steps, total_rows*P*T, K*4*T]
    (bake_karatsuba); bara_t: int32[n_steps, B] in [0, 2N).
    Bit-exact vs scanning cmux_step_pallas_karatsuba / the XLA path.
    """
    assert n & (n - 1) == 0, f"polynomial degree must be a power of 2, got {n}"
    b_sz = acc.shape[0]
    m = n // t
    p = k1 * l
    pt = p * t
    cols = k1 * 4 * t
    n_steps = e_all.shape[0]

    combo_writes, leaf_dots, comb_rows = _kernel_plan(plan, p, t)
    max_l = max(L for _, L, _, _ in leaf_dots)
    dig_i32 = b > 8
    # bt=128: all scratch + Mosaic stack temps fit the 16M scoped VMEM at
    # every depth; per-step key re-streaming at 32 cells measured ~0.08 ms
    # (fully hidden behind the dots)
    bt = _pick_tile(b_sz, btk or get_tuning().btk)
    n_leaves = len(leaf_dots)
    # slots must divide the leaf count so slot assignment stays static and
    # step-boundary-consistent (plans have 3^depth leaves -> 3 divides)
    want_slots = get_tuning().eslots
    n_slots = 1
    for cand in range(min(want_slots, n_leaves), 0, -1):
        if n_leaves % cand == 0:
            n_slots = cand
            break

    fn = functools.partial(
        _blind_rotate_megakernel,
        n=n, k1=k1, l=l, b=b, t=t, offset=offset,
        combo_writes=combo_writes, leaf_dots=leaf_dots, dig_i32=dig_i32,
        n_steps=n_steps, n_slots=n_slots,
    )
    out = pl.pallas_call(
        fn,
        out_shape=jax.ShapeDtypeStruct((b_sz, k1 * n), jnp.int32),
        grid=(b_sz // bt,),
        in_specs=[
            pl.BlockSpec((n_steps, bt), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # acc: manual DMA per cell
            pl.BlockSpec(memory_space=pl.ANY),  # baked key, streamed
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # manual DMA per cell
        scratch_shapes=[
            pltpu.VMEM((bt, k1 * n), jnp.int32),  # acc tile (flat: odd k1)
            pltpu.VMEM((bt, m * pt), jnp.int32 if dig_i32 else jnp.int8),
            pltpu.VMEM((bt, max(comb_rows, 1) * pt), jnp.int8),
            pltpu.VMEM((n_slots, max_l * pt, cols), jnp.int8),
            pltpu.VMEM((bt, m * k1 * t), jnp.int32),  # cacc (+rotate scratch)
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        # scratches at bt=256 + Mosaic stack temps pass the 16 MB default
        # scoped limit; the v5e has 128 MB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bara_t, acc.reshape(b_sz, k1 * n), e_all)
    return out.reshape(b_sz, k1, n)


def _pick_tile(b_sz: int, target: int) -> int:
    bt = min(b_sz, target)
    while b_sz % bt:
        bt -= 1
    return bt


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "plan", "offset", "interpret",
                     "btk", "ablate"),
)
def cmux_step_pallas_karatsuba(acc, e_step, bara, *, n, k1, l, b, t, plan,
                               offset, interpret=False, btk=None, ablate=()):
    """One fused block-Karatsuba CMUX step (single pallas_call).

    acc: int32[B, k1, N]; e_step: int8[total_rows*P*T, K*4*T]
    (ops/karatsuba.py:bake_karatsuba); bara: int32[B]. Bit-exact vs the XLA
    path (bootstrap.mux_rotate_karatsuba) — tests/test_pallas_cmux.py.

    Fusing rotate/decompose (VPU), digit combos (VPU), all leaf matmuls
    (MXU, per-leaf double-buffered key DMA from HBM) and the fold/recombine
    epilogue (VPU) into one kernel removes the per-step digits HBM
    round-trip of the round-1 two-kernel design and gives Mosaic's scheduler
    the chance to co-issue VPU and MXU work.
    """
    assert n & (n - 1) == 0, f"polynomial degree must be a power of 2, got {n}"
    b_sz = acc.shape[0]
    m = n // t
    p = k1 * l
    pt = p * t
    cols = k1 * 4 * t

    combo_writes, leaf_dots, comb_rows = _kernel_plan(plan, p, t)
    max_l = max(L for _, L, _, _ in leaf_dots)
    dig_i32 = b > 8
    bt = _pick_tile(b_sz, btk or get_tuning().bt_step)

    fn = functools.partial(
        _fused_karatsuba_kernel,
        n=n, k1=k1, l=l, b=b, t=t, offset=offset,
        combo_writes=combo_writes, leaf_dots=leaf_dots, dig_i32=dig_i32,
        ablate=ablate,
    )
    out = pl.pallas_call(
        fn,
        out_shape=jax.ShapeDtypeStruct((b_sz, k1 * n), jnp.int32),
        grid=(b_sz // bt,),
        in_specs=[
            pl.BlockSpec((bt, 1), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # acc: manual DMA per cell
            pl.BlockSpec(memory_space=pl.ANY),  # E stays in HBM, streamed
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # manual DMA per cell
        scratch_shapes=[
            pltpu.VMEM((bt, k1 * n), jnp.int32),  # acc tile (flat: odd k1)
            pltpu.VMEM((bt, m * pt), jnp.int32 if dig_i32 else jnp.int8),
            pltpu.VMEM((bt, max(comb_rows, 1) * pt), jnp.int8),
            pltpu.VMEM((2, max_l * pt, cols), jnp.int8),
            pltpu.VMEM((bt, m * k1 * t), jnp.int32),  # cacc (+rotate scratch)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(bara.reshape(b_sz, 1), acc.reshape(b_sz, k1 * n), e_step)
    return out.reshape(b_sz, k1, n)


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "s_limbs", "d_shifts",
                     "offset", "interpret"),
)
def cmux_step_pallas(acc, e_step, bara, *, n, k1, l, b, t, s_limbs, d_shifts,
                     offset, interpret=False):
    """One fused CMUX step: acc += BK_i (x) [(X^bara - 1) * acc].

    acc: int32[B, k1, N]; e_step: int8[2M, P*T, k1*4*T] (permuted-d baked);
    bara: int32[B]. Bit-exact vs the XLA path (mux_rotate_baked).
    """
    # The rotate kernel computes shift mod N as `shift2 & (n - 1)`, which is
    # only correct for power-of-two N (all shipped presets are).
    assert n & (n - 1) == 0, f"polynomial degree must be a power of 2, got {n}"
    b_sz = acc.shape[0]
    m = n // t
    m2 = 2 * m
    p = k1 * l
    pt = p * t
    cols = k1 * 4 * t

    bt_a = _pick_tile(b_sz, get_tuning().bta)
    rot_fn = functools.partial(
        _rotate_decompose_kernel,
        n=n, k1=k1, l=l, b=b, t=t, s_limbs=s_limbs, offset=offset,
    )
    digits = pl.pallas_call(
        rot_fn,
        out_shape=jax.ShapeDtypeStruct((s_limbs, b_sz, m * pt), jnp.int8),
        grid=(b_sz // bt_a,),
        in_specs=[
            pl.BlockSpec((bt_a, 1), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt_a, k1, n), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_limbs, bt_a, m * pt), lambda c: (0, c, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bara.reshape(b_sz, 1), acc)

    bt_b = _pick_tile(b_sz, get_tuning().btb)
    mm_fn = functools.partial(
        _cmux_matmul_kernel,
        n=n, k1=k1, l=l, b=b, t=t, s_limbs=s_limbs, d_shifts=d_shifts,
    )
    delta = pl.pallas_call(
        mm_fn,
        out_shape=jax.ShapeDtypeStruct((b_sz, k1, n), jnp.int32),
        grid=(m, b_sz // bt_b),
        in_specs=[
            pl.BlockSpec((s_limbs, bt_b, m * pt), lambda o, c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt_b, k1, t), lambda o, c: (c, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # E stays in HBM, streamed
        ],
        out_specs=pl.BlockSpec((bt_b, k1, t), lambda o, c: (c, 0, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m * pt, cols), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(digits, acc, e_step)
    return delta


def _leaf_dots_resident(dig_ref, dcomb_ref, e_ref, cacc_ref, leaf_dots, *,
                        k1, t, pt, m, dig_i32):
    """Leaf dots + limb recombine + fold/scatter against a step's FULL
    expanded operand resident in VMEM (e_ref: [total_rows*P*T, K*4*T] in the
    bake layout) — the no-DMA sibling of `_one_leaf_dots`, used by the
    compact megakernel where E never exists in HBM at all.
    """
    for leaf in leaf_dots:
        e_row, L = leaf[0], leaf[1]

        def rhs_at(o, i0, width, e_row=e_row, L=L):
            return e_ref[pl.ds((e_row + L - 1 - o + i0) * pt, width)]

        _leaf_dots_core(dig_ref, dcomb_ref, cacc_ref, leaf, rhs_at,
                        k1=k1, t=t, pt=pt, m=m, dig_i32=dig_i32)


def _expand_entries_body(words_ref, comb_ref, base_ref, e_ref, entry_rows, *,
                         n, t, p, k1):
    """In-kernel Toeplitz expansion of one step's compact key into the dense
    bake layout, entirely in VMEM.

    words_ref: [P*K, 2N] int32 doubled key words; e_ref out:
    [total_rows*P*T, K*4*T] int8 (== bake_karatsuba rows, bit-exact).

    The block window W[u, w] = C[T + w - u] (C a combo of 2T-long word
    windows) is produced by ONE strided lane rotate per (entry, poly):
    base[u, :] = C broadcast, then `pltpu.roll(base, 0, axis=1, stride=1,
    stride_axis=0)` rolls row u right by u, so the fixed lane window
    [T, 2T) of row u holds C[T + w - u]. K output columns ride the same
    roll (2T-lane blocks side by side); the roll's cross-block wrap only
    contaminates lanes < u <= T of each block, which the read window never
    touches. Limb-splitting happens AFTER the rotate (the rotate unit is
    32-bit only), with the same balanced-byte arithmetic as
    conv.split_torus_limbs.
    """
    n2 = 2 * n
    t2 = 2 * t
    kk = k1

    def window(d):
        lo = d * t - t
        if lo < 0:  # d == 0 wraps below (words are 2N-periodic)
            return jnp.concatenate(
                [words_ref[:, n2 + lo:], words_ref[:, 0: lo + t2]], axis=-1)
        return words_ref[:, lo: lo + t2]

    for row, entry in entry_rows:
        comb = window(entry[0])
        for d in entry[1:]:
            comb = comb + window(d)  # int32 wraparound: exact
        comb_ref[...] = comb  # [P*K, 2T]
        for pj in range(p):
            for k in range(kk):
                base_ref[:, k * t2: (k + 1) * t2] = jnp.broadcast_to(
                    comb_ref[pj * kk + k: pj * kk + k + 1, :], (t, t2))
            rolled = pltpu.roll(base_ref[...], 0, 1, stride=1, stride_axis=0)
            r0 = (row * p + pj) * t
            for k in range(kk):
                w32 = rolled[:, k * t2 + t: (k + 1) * t2]  # [T, T] int32
                cur = w32
                for limb in range(4):
                    lo8 = ((cur & 255) ^ 128) - 128  # balanced low byte
                    e_ref[r0: r0 + t,
                          (k * 4 + limb) * t: (k * 4 + limb + 1) * t] = (
                        lo8.astype(jnp.int8))
                    if limb < 3:
                        cur = (cur - lo8) >> 8


def _compact_megakernel(limbs_ref, bara_ref, acc_hbm, out_hbm, acc_all,
                        e_ref, words_ref, comb_ref, base_ref, acc_t_ref,
                        dig_ref, dcomb_ref, cacc_ref, sem_io, *, n, k1, l, b,
                        t, offset, combo_writes, leaf_dots, entry_rows,
                        dig_i32, n_steps, n_cells, bt):
    """Blind rotation from the COMPACT key: grid over the n steps, the FULL
    batch group's accumulator resident in VMEM, each step's dense operand
    expanded in-kernel (once per step, amortized over every batch cell) and
    consumed straight from VMEM — the expanded key never exists in HBM.
    Bit-exact vs the baked megakernel (tests/test_compact_key.py).
    """
    m = n // t
    p = k1 * l
    pt = p * t
    pk = k1 * p  # words rows: P * K
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _load_acc():
        cp = pltpu.make_async_copy(acc_hbm, acc_all, sem_io)
        cp.start()
        cp.wait()

    # --- words reconstruction: int8 limb rows -> int32 doubled words
    lb = limbs_ref[0]
    words_ref[...] = (
        lb[0:pk].astype(jnp.int32)
        + (lb[pk: 2 * pk].astype(jnp.int32) << 8)
        + (lb[2 * pk: 3 * pk].astype(jnp.int32) << 16)
        + (lb[3 * pk: 4 * pk].astype(jnp.int32) << 24)
    )

    # --- expand this step's operand into VMEM (once for all cells)
    _expand_entries_body(
        words_ref, comb_ref, base_ref, e_ref, entry_rows,
        n=n, t=t, p=p, k1=k1)

    # --- every batch cell: rotate/decompose -> dots vs resident E -> update
    def cell(c, _):
        bara_row = bara_ref[0, c, :]
        acc_t_ref[...] = acc_all[pl.ds(c * bt, bt), :]
        _rotate_decompose_body(
            acc_t_ref, cacc_ref, dig_ref, bara_row,
            n=n, k1=k1, l=l, b=b, t=t, offset=offset, dig_i32=dig_i32,
            acc_flat=True)
        _combo_body(dig_ref, dcomb_ref, combo_writes, pt)
        cacc_ref[...] = jnp.zeros(cacc_ref.shape, jnp.int32)
        _leaf_dots_resident(
            dig_ref, dcomb_ref, e_ref, cacc_ref, leaf_dots,
            k1=k1, t=t, pt=pt, m=m, dig_i32=dig_i32)
        kt = k1 * t
        for k in range(k1):
            for i in range(m):
                dst = pl.ds(k * n + i * t, t)
                acc_t_ref[:, dst] = (
                    acc_t_ref[:, dst]
                    + cacc_ref[:, i * kt + k * t: i * kt + (k + 1) * t]
                )
        acc_all[pl.ds(c * bt, bt), :] = acc_t_ref[...]
        return 0

    jax.lax.fori_loop(0, n_cells, cell, 0)

    @pl.when(s == n_steps - 1)
    def _store_acc():
        cp = pltpu.make_async_copy(acc_all, out_hbm, sem_io)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "plan", "offset", "interpret",
                     "btc", "group_budget"),
)
def blind_rotate_pallas_compact(acc, limbs, bara_t, *, n, k1, l, b, t, plan,
                                offset, interpret=False, btc=None,
                                group_budget=None):
    """Whole blind rotation from the COMPACT (prepared-limb) key as grid-
    over-steps megakernel launches with in-kernel expansion.

    acc: int32[B, k1, N]; limbs: int8[n_steps, 4, P, K, 2N] (prepare_tgsw);
    bara_t: int32[n_steps, B] in [0, 2N). The batch is split into groups
    whose resident accumulator fits ~36 MB of VMEM; each group re-runs the
    per-step expansion (exactly like the baked path re-streams its key per
    batch cell). Bit-exact vs the baked megakernel.
    """
    assert n & (n - 1) == 0
    b_sz = acc.shape[0]
    m = n // t
    p = k1 * l
    pt = p * t
    n_steps = limbs.shape[0]
    combo_writes, leaf_dots, comb_rows = _kernel_plan(plan, p, t)
    dig_i32 = b > 8

    entry_rows = []
    row = 0
    for lf in plan.leaves:
        for entry in reversed(lf.entries):
            entry_rows.append((row, entry))
            row += 1
    entry_rows = tuple(entry_rows)

    if group_budget is None:
        group_budget = get_tuning().bs_group_mb << 20
    row_bytes = k1 * n * 4
    group = _pick_tile(b_sz, max(1, min(b_sz, group_budget // row_bytes)))
    bt = _pick_tile(group, btc or get_tuning().btc)
    n_cells = group // bt

    fn = functools.partial(
        _compact_megakernel,
        n=n, k1=k1, l=l, b=b, t=t, offset=offset,
        combo_writes=combo_writes, leaf_dots=leaf_dots,
        entry_rows=entry_rows, dig_i32=dig_i32, n_steps=n_steps,
        n_cells=n_cells, bt=bt,
    )
    run = pl.pallas_call(
        fn,
        out_shape=jax.ShapeDtypeStruct((group, k1 * n), jnp.int32),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 4 * p * k1, 2 * n), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cells, bt), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # acc group: one-time DMA in
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # one-time DMA out
        scratch_shapes=[
            pltpu.VMEM((group, k1 * n), jnp.int32),  # resident accumulator
            pltpu.VMEM((plan.total_rows * pt, k1 * 4 * t), jnp.int8),  # E
            pltpu.VMEM((p * k1, 2 * n), jnp.int32),  # doubled words
            pltpu.VMEM((p * k1, 2 * t), jnp.int32),  # entry combo windows
            pltpu.VMEM((t, k1 * 2 * t), jnp.int32),  # roll base
            pltpu.VMEM((bt, k1 * n), jnp.int32),  # cell acc tile
            pltpu.VMEM((bt, m * pt), jnp.int32 if dig_i32 else jnp.int8),
            pltpu.VMEM((bt, max(comb_rows, 1) * pt), jnp.int8),
            pltpu.VMEM((bt, m * k1 * t), jnp.int32),  # cacc (+rot scratch)
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )
    limbs_r = limbs.reshape(n_steps, 4 * p * k1, 2 * n)
    outs = []
    for g0 in range(0, b_sz, group):
        bara_g = bara_t[:, g0: g0 + group].reshape(n_steps, n_cells, bt)
        outs.append(run(
            limbs_r, bara_g,
            lax.slice_in_dim(acc.reshape(b_sz, k1 * n), g0, g0 + group)))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(b_sz, k1, n)
