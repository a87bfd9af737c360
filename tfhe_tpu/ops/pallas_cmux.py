"""Fused Pallas TPU kernels for the CMUX blind-rotation step.

Two kernels per scan step (reference hot loop: src/bootstrap.jl:19-39):

* `rotate_decompose` (VPU): barrel-rotate the accumulator by X^bara, subtract,
  gadget-decompose, split digit limbs, and store the int8 digits as
  [S*M, B, P*T] — i-block leading — so every operand the matmul kernel needs
  is a leading-dim slice (Mosaic supports leading-dim merges/slices freely;
  lane-dim reshapes are forbidden, which dictates T = 128 = lane width).

* `cmux_matmul` (MXU): for each block shift d (static loop), DMA the baked
  block-Toeplitz slice E'[d] (ops/conv.py:bake_block_toeplitz, REVERSED-d
  layout) from HBM with double buffering, contract the matching contiguous
  digit window in ONE int8 MXU dot, and accumulate per-output-block partial
  products in a VMEM scratch; finally recombine the 4 int8 limb planes into
  int32 mod 2^32 and add into the accumulator. Exact MAC count, zero gathers,
  zero copies beyond the streamed weights.

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
    acc = acc_ref[...]
    shift = jnp.mod(bara_ref[...], 2 * n)[:, :, None]  # [BT, 1, 1]
    stages = (2 * n - 1).bit_length()
    bt = acc.shape[0]

    def rotate_body(scr):
        # In-place barrel rotation through a single scratch buffer — the
        # unrolled stage chain would otherwise keep ~stages live 2N-wide
        # temporaries on the Mosaic stack and blow the 16 MB VMEM budget.
        scr[...] = jnp.concatenate([acc, -acc], axis=-1)  # [BT, k1, 2N]
        for j in range(stages):
            cur = scr[...]
            rolled = pltpu.roll(cur, 1 << j, axis=2)
            take = (shift >> j) & 1
            scr[...] = jnp.where(take != 0, rolled, cur)
        shifted = scr[:, :, :n] - acc + jnp.int32(offset)

        mask = jnp.int32((1 << b) - 1)
        half = jnp.int32(1 << (b - 1))
        m = n // t
        for i in range(m):
            blk = shifted[:, :, i * t : (i + 1) * t]  # [BT, k1, T]
            for j in range(k1):
                for i_l in range(l):
                    d = ((blk[:, j, :] >> (32 - (i_l + 1) * b)) & mask) - half
                    seg = slice((j * l + i_l) * t, (j * l + i_l + 1) * t)
                    if s_limbs == 1:
                        dig_ref[i, :, seg] = d.astype(jnp.int8)
                    else:
                        lo = ((d & 15) ^ 8) - 8
                        hi = (d - lo) >> 4
                        dig_ref[i, :, seg] = lo.astype(jnp.int8)
                        dig_ref[m + i, :, seg] = hi.astype(jnp.int8)

    pl.run_scoped(rotate_body, pltpu.VMEM((bt, k1, 2 * n), jnp.int32))


def _cmux_matmul_kernel(dig_ref, acc_ref, e_hbm, out_ref, e_buf, out_acc,
                        sem, *, n, k1, l, b, t, s_limbs, d_shifts):
    """Per-tile: out = acc + recombine(digits (x) E'), exact mod 2^32.

    dig_ref: [S*M, BT, P*T] int8 (VMEM); acc_ref/out_ref: [BT, k1, N] int32
    (VMEM); e_hbm: [2M, P*T, k1*4*T] int8 (HBM, streamed); e_buf: VMEM
    scratch [2, P*T, k1*4*T]; out_acc: VMEM scratch [M, BT, k1*4*T] int32;
    sem: DMA semaphores [2].
    """
    m = n // t
    m2 = 2 * m
    cols = k1 * 4 * t
    bt = acc_ref.shape[0]

    # Static schedule of (d, digit-window, out-window) with exact MACs:
    # i in [max(0, d-m... see ops/conv.py block_toeplitz_matmul.
    sched = []
    for d in range(m2):
        if d < m:
            sched.append((d, 0, m - d, d))      # i in [0, m-d), o = i + d
        elif d > m:
            sched.append((d, m2 - d, m, d - m2))  # i in [2m-d, m), o = i+d-2m
    # e_hbm stores REVERSED-d: E'[d'] = E[(2M - d') % 2M]
    def e_slot(d):
        return (m2 - d) % m2

    def dma(idx, slot):
        d = sched[idx][0]
        return pltpu.make_async_copy(
            e_hbm.at[e_slot(d)], e_buf.at[slot], sem.at[slot]
        )

    dma(0, 0).start()
    for idx, (d, i0, i1, oshift) in enumerate(sched):
        if idx + 1 < len(sched):
            dma(idx + 1, (idx + 1) % 2).start()
        dma(idx, idx % 2).wait()
        for s in range(s_limbs):
            win = i1 - i0
            lhs = dig_ref[s * m + i0 : s * m + i1]  # [win, BT, P*T]
            lhs = lhs.reshape(win * bt, lhs.shape[-1])
            prod = lax.dot_general(
                lhs, e_buf[idx % 2],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(win, bt, cols)
            if d_shifts[s]:
                prod = prod << d_shifts[s]
            o0 = i0 + oshift
            first = idx == 0 and s == 0
            if first and win == m:
                out_acc[...] = prod
            else:
                if first:
                    out_acc[...] = jnp.zeros_like(out_acc)
                out_acc[o0 : o0 + win] = out_acc[o0 : o0 + win] + prod

    # Recombine limb planes and add into the accumulator.
    for o in range(m):
        pr = out_acc[o].reshape(bt, k1, 4, t)
        rec = pr[:, :, 0, :]
        for limb in range(1, 4):
            rec = rec + (pr[:, :, limb, :] << (8 * limb))
        out_ref[:, :, o * t : (o + 1) * t] = (
            acc_ref[:, :, o * t : (o + 1) * t] + rec
        )


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

    bt_a = _pick_tile(b_sz, 64)
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

    bt_b = _pick_tile(b_sz, 128)
    mm_fn = functools.partial(
        _cmux_matmul_kernel,
        n=n, k1=k1, l=l, b=b, t=t, s_limbs=s_limbs, d_shifts=d_shifts,
    )
    out = pl.pallas_call(
        mm_fn,
        out_shape=jax.ShapeDtypeStruct((b_sz, k1, n), jnp.int32),
        grid=(b_sz // bt_b,),
        in_specs=[
            pl.BlockSpec((s_limbs * m, bt_b, pt), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt_b, k1, n), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # E stays in HBM, streamed
        ],
        out_specs=pl.BlockSpec((bt_b, k1, n), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pt, cols), jnp.int8),
            pltpu.VMEM((m, bt_b, cols), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(digits, acc, e_step)
    return out
