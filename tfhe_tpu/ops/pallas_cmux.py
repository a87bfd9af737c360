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


def _pick_tile(b_sz: int, target: int) -> int:
    bt = min(b_sz, target)
    while b_sz % bt:
        bt -= 1
    return bt


def _env_tile(name: str, default: int) -> int:
    import os

    return int(os.environ.get(name, default))


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

    bt_a = _pick_tile(b_sz, _env_tile("TFHE_TPU_BTA", 256))
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

    bt_b = _pick_tile(b_sz, _env_tile("TFHE_TPU_BTB", 256))
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
