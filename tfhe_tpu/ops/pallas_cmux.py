"""Fused Pallas TPU kernels for the CMUX blind-rotation step.

Two kernels per scan step (reference hot loop: src/bootstrap.jl:19-39):

* `rotate_decompose` (VPU): barrel-rotate the accumulator by X^bara, subtract,
  gadget-decompose, split digit limbs, and store the int8 digits as
  [S*M, B, P*T] — i-block leading — so every operand the matmul kernel needs
  is a leading-dim slice (Mosaic supports leading-dim merges/slices freely;
  lane-dim reshapes are forbidden, which dictates T = 128 = lane width).
  The barrel runs on clean 2D [BT, 2N] tiles per mask polynomial (full
  sublane utilization) through a single scratch buffer (bounded VMEM).

* `cmux_matmul` (MXU): for each block shift d (static schedule), DMA the
  baked block-Toeplitz slice (ops/conv.py:bake_block_toeplitz, REVERSED-d
  layout) from HBM with double buffering, contract the matching contiguous
  digit window in one exact int8 MXU dot, recombine the 4 limb planes
  immediately (linear, so recombine-then-accumulate == accumulate-then-
  recombine) into a small int32 scratch, and emit the CMUX delta. The
  accumulator add happens in XLA (fuses into the scan cheaply).

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


def _rotate_decompose_kernel(bara_ref, acc_ref, dig_ref, *, n, k1, l, b, t,
                             s_limbs, offset):
    """Per-tile digits of (X^bara - 1) * acc, int8, layout [S*M, BT, P*T].

    bara_ref: [BT, 1] int32; acc_ref: [BT, k1, N] int32;
    dig_ref: [S*M, BT, P*T] int8 with P = k1 * l, rows (j, i_l, u) per block.
    """
    shift = jnp.mod(bara_ref[...], 2 * n)  # [BT, 1]
    stages = (2 * n - 1).bit_length()
    mask = jnp.int32((1 << b) - 1)
    half = jnp.int32(1 << (b - 1))
    m = n // t

    def body(scr):
        for j in range(k1):
            row = acc_ref[:, j, :]  # [BT, N]
            # In-place barrel rotation of the doubled row through one scratch
            # buffer — an unrolled stage chain would keep ~stages live
            # 2N-wide temporaries and blow the 16 MB VMEM budget.
            scr[...] = jnp.concatenate([row, -row], axis=-1)  # [BT, 2N]
            for s in range(stages):
                cur = scr[...]
                rolled = pltpu.roll(cur, 1 << s, axis=1)
                take = (shift >> s) & 1
                scr[...] = jnp.where(take != 0, rolled, cur)
            shifted = scr[:, :n] - row + jnp.int32(offset)

            for i_l in range(l):
                d = ((shifted >> (32 - (i_l + 1) * b)) & mask) - half
                for i in range(m):
                    blk = d[:, i * t : (i + 1) * t]  # [BT, T]
                    seg = slice((j * l + i_l) * t, (j * l + i_l + 1) * t)
                    if s_limbs == 1:
                        dig_ref[i, :, seg] = blk.astype(jnp.int8)
                    else:
                        lo = ((blk & 15) ^ 8) - 8
                        hi = (blk - lo) >> 4
                        dig_ref[i, :, seg] = lo.astype(jnp.int8)
                        dig_ref[m + i, :, seg] = hi.astype(jnp.int8)

    pl.run_scoped(body, pltpu.VMEM((acc_ref.shape[0], 2 * n), jnp.int32))


def _cmux_matmul_kernel(dig_ref, e_hbm, out_ref, e_buf, out_acc, sem, *,
                        n, k1, l, b, t, s_limbs, d_shifts):
    """Per-tile CMUX delta: out = recombine(digits (x) E'), exact mod 2^32.

    dig_ref: [S*M, BT, P*T] int8 (VMEM); e_hbm: [2M, P*T, k1*4*T] int8 (HBM,
    streamed); out_ref: [BT, k1, N] int32; e_buf: VMEM scratch
    [2, P*T, k1*4*T] int8; out_acc: VMEM scratch [M, BT, k1*T] int32;
    sem: DMA semaphores [2].
    """
    m = n // t
    m2 = 2 * m
    bt = out_ref.shape[0]

    # Static schedule (d, i0, i1, oshift): digit blocks i in [i0, i1) paired
    # with output blocks o = i + oshift; exact MAC count (see
    # ops/conv.py:block_toeplitz_matmul). The widest window (d = 0) is split
    # in half to bound the transient int32 product at (M/2)*BT*cols words.
    sched = []
    for d in range(m2):
        if d == 0:
            sched.append((0, 0, m // 2, 0))
            sched.append((0, m // 2, m, 0))
        elif d < m:
            sched.append((d, 0, m - d, d))
        elif d > m:
            sched.append((d, m2 - d, m, d - m2))

    def e_slot(d):
        # e_hbm stores REVERSED-d: E'[d'] = E[(2M - d') % 2M]
        return (m2 - d) % m2

    out_acc[...] = jnp.zeros_like(out_acc)

    # Walk distinct d values with double-buffered weight DMA.
    distinct = []
    for entry in sched:
        if not distinct or distinct[-1][0] != entry[0]:
            distinct.append([entry[0], [entry]])
        else:
            distinct[-1][1].append(entry)

    pltpu.make_async_copy(
        e_hbm.at[e_slot(distinct[0][0])], e_buf.at[0], sem.at[0]
    ).start()
    for di, (d, entries) in enumerate(distinct):
        if di + 1 < len(distinct):
            pltpu.make_async_copy(
                e_hbm.at[e_slot(distinct[di + 1][0])],
                e_buf.at[(di + 1) % 2],
                sem.at[(di + 1) % 2],
            ).start()
        pltpu.make_async_copy(
            e_hbm.at[e_slot(d)], e_buf.at[di % 2], sem.at[di % 2]
        ).wait()
        w = e_buf[di % 2]
        for (_, i0, i1, oshift) in entries:
            win = i1 - i0
            for s in range(s_limbs):
                lhs = dig_ref[s * m + i0 : s * m + i1]  # [win, BT, P*T]
                lhs = lhs.reshape(win * bt, lhs.shape[-1])
                prod = lax.dot_general(
                    lhs, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [win*BT, k1*4*T]
                # Recombine limb planes eagerly (linear in the partial sums).
                for k in range(k1):
                    rec = prod[:, (k * 4) * t : (k * 4 + 1) * t]
                    for limb in range(1, 4):
                        rec = rec + (
                            prod[:, (k * 4 + limb) * t : (k * 4 + limb + 1) * t]
                            << (8 * limb)
                        )
                    if d_shifts[s]:
                        rec = rec << d_shifts[s]
                    o0 = i0 + oshift
                    sl = slice(k * t, (k + 1) * t)
                    out_acc[o0 : o0 + win, :, sl] = (
                        out_acc[o0 : o0 + win, :, sl]
                        + rec.reshape(win, bt, t)
                    )

    for o in range(m):
        for k in range(k1):
            out_ref[:, k, o * t : (o + 1) * t] = out_acc[o, :, k * t : (k + 1) * t]


def _pick_tile(b_sz: int, target: int) -> int:
    bt = min(b_sz, target)
    while b_sz % bt:
        bt -= 1
    return bt


@functools.partial(
    jax.jit,
    static_argnames=("n", "k1", "l", "b", "t", "s_limbs", "d_shifts",
                     "offset", "interpret"),
)
def cmux_step_pallas(acc, e_step, bara, *, n, k1, l, b, t, s_limbs, d_shifts,
                     offset, interpret=False):
    """One fused CMUX step: acc += BK_i (x) [(X^bara - 1) * acc].

    acc: int32[B, k1, N]; e_step: int8[2M, P*T, k1*4*T] (reversed-d baked);
    bara: int32[B]. Bit-exact vs the XLA path (mux_rotate_baked).
    """
    b_sz = acc.shape[0]
    m = n // t
    m2 = 2 * m
    p = k1 * l
    pt = p * t
    cols = k1 * 4 * t

    bt_a = _pick_tile(b_sz, 128)
    rot_fn = functools.partial(
        _rotate_decompose_kernel,
        n=n, k1=k1, l=l, b=b, t=t, s_limbs=s_limbs, offset=offset,
    )
    digits = pl.pallas_call(
        rot_fn,
        out_shape=jax.ShapeDtypeStruct((s_limbs * m, b_sz, pt), jnp.int8),
        grid=(b_sz // bt_a,),
        in_specs=[
            pl.BlockSpec((bt_a, 1), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt_a, k1, n), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_limbs * m, bt_a, pt), lambda c: (0, c, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bara.reshape(b_sz, 1), acc)

    bt_b = _pick_tile(b_sz, 256)
    mm_fn = functools.partial(
        _cmux_matmul_kernel,
        n=n, k1=k1, l=l, b=b, t=t, s_limbs=s_limbs, d_shifts=d_shifts,
    )
    delta = pl.pallas_call(
        mm_fn,
        out_shape=jax.ShapeDtypeStruct((b_sz, k1, n), jnp.int32),
        grid=(b_sz // bt_b,),
        in_specs=[
            pl.BlockSpec((s_limbs * m, bt_b, pt), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # E stays in HBM, streamed
        ],
        out_specs=pl.BlockSpec((bt_b, k1, n), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pt, cols), jnp.int8),
            pltpu.VMEM((m, bt_b, k1 * t), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(digits, e_step)
    return acc + delta
