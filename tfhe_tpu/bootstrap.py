"""Gate bootstrapping: modulus switch -> blind rotate -> extract -> keyswitch.

TPU-native counterpart of the reference's bootstrap layer
(reference: src/bootstrap.jl:1-95). The reference's sequential CMUX loop with
data-dependent skips (src/bootstrap.jl:32-39) becomes a `lax.scan` over the n
LWE key bits with a BRANCHLESS batched CMUX body: when bara_i == 0 the rotated
accumulator equals the accumulator, the difference decomposes to all-zero
digits, and the external product contributes exactly zero (SURVEY.md
section 2 item 3) — identical results, no divergence. All throughput comes
from the ciphertext batch dimension riding the MXU contraction
(SURVEY.md section 3.3: the i-loop is inherently sequential).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from . import polynomial
from .keyswitch import KeyswitchKey, keyswitch
from .lwe import LweSample
from .numeric import decode_message
from .tgsw import prepare_tgsw, tgsw_encrypt, tgsw_extern_mul_prepared
from .tlwe import (
    TLweSample,
    tlwe_extract_sample,
    tlwe_mul_by_monomial,
    tlwe_noiseless_trivial,
)


def _default_block(poly_degree: int) -> int:
    """Toeplitz block size T: the TPU lane width (128) when possible.
    T=128 is required by the Pallas CMUX kernels (Mosaic forbids
    lane-splitting reshapes, so every block boundary must be lane-aligned);
    the baked key is n*2N*P*K4*T bytes (7.9 GB at T=128 for the 128-bit
    preset — HBM traded for gather-free MXU streaming). N = 128 yields
    M = 1 — a single full negacyclic Toeplitz block per polynomial
    (depth-0 single-leaf plan; the 128_fast8 geometry) — which every
    kernel path handles.
    """
    if poly_degree % 128 == 0:
        return 128
    for t in (64, 32, 16, 8, 4, 2, 1):
        if poly_degree % t == 0 and poly_degree // t >= 2:
            return t
    return 1


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["baked"],
    meta_fields=[
        "decomp_length", "log2_base", "polynomial_degree", "mask_size",
        "block", "depth", "noise_stddev", "balanced", "compact",
    ],
)
@dataclasses.dataclass(frozen=True)
class BootstrapKey:
    """Per-LWE-key-bit TGSW encryptions, baked into MXU-ready form.

    Two bakes, selected by `depth`:

    * depth == 0 — dense block-Toeplitz: baked int8[n, 2M*P*T, (k+1)*4*T]
      (P = (k+1)*l, M = N/T; ops/conv.py:bake_block_toeplitz), gate-time
      blind rotation is M^2 dense super-block int8 matmuls per step.
    * depth >= 1 — block-Karatsuba leaf storage: baked
      int8[n, total_rows*P*T, (k+1)*4*T] (ops/karatsuba.py:bake_karatsuba),
      cutting super-block products to 48/40/34 at depth 1/2/3 — the round-2
      lever past the dense path's algorithmic MAC ceiling.

    Both are the TPU-resident analogue of the reference storing its key
    pre-FFT'd (src/bootstrap.jl:1-16): HBM traded for gather-free MXU
    streaming.

    With `compact=True`, `baked` instead holds the PREPARED limb form
    int8[n, 4, P, K, 2N] (tgsw.prepare_tgsw — the same bytes the reference
    key carries, ~T x smaller than the bakes: 65 MB vs 6.2 GB at 128_fast)
    and the blind rotation expands each step's Toeplitz rows on the fly —
    batch-independent per-step MXU work that amortizes at large batches
    and trades ~nothing at batch 1 (the baked path is key-streaming-bound
    there anyway). This is the multi-tenant serving form
    (TuningConfig.bs_bake_budget, docs/serving.md); `block`/`depth` then
    describe the gate-time expansion plan rather than a bake.
    """

    baked: jax.Array
    decomp_length: int
    log2_base: int
    polynomial_degree: int
    mask_size: int
    block: int
    depth: int = 0
    noise_stddev: float = 0.0  # keygen sigma, feeds the honest cv model
    balanced: bool = False  # nearest-rounding gadget (tgsw.decomp_offset)
    compact: bool = False  # prepared limbs; expand per step at gate time

    @property
    def n(self) -> int:
        return self.baked.shape[0]

    @property
    def plan(self):
        from .ops.karatsuba import karatsuba_plan

        return karatsuba_plan(
            self.polynomial_degree // self.block, self.depth, self.log2_base
        )


def bootstrap_key_gen(rng, alpha: float, lwe_key, tlwe_key,
                      decomp_length: int, log2_base: int,
                      block: int | None = None,
                      balanced: bool = False) -> BootstrapKey:
    """TGSW-encrypt each bit of the LWE key under the TLWE key, then bake.

    Reference: src/bootstrap.jl:6-15.
    """
    n = lwe_key.shape[0]
    gsw = tgsw_encrypt(
        rng, lwe_key, alpha, tlwe_key, decomp_length, log2_base, batch_shape=(n,)
    )  # [n, l, k+1, k+1, N]
    return bootstrap_key_from_raw(gsw, decomp_length, log2_base, block,
                                  noise_stddev=alpha, balanced=balanced)


def _default_depth() -> int:
    """Karatsuba depth for new bootstrap keys (TuningConfig.karatsuba_depth).

    Depth 2 is the default: 40/64 of the dense super-block MACs with an
    18/16-row bake, measured 6,745 gates/s on the chip via the fused
    megakernel vs 4,731 dense (round 1). Depth 3 (34/64 MACs, 27/16 rows)
    measures slower (6,520 even at 9 DMA slots: more, smaller dots); depth 0
    keeps the dense block-Toeplitz path.
    """
    from .tuning import get_tuning

    return get_tuning().karatsuba_depth


def bootstrap_key_from_raw(gsw, decomp_length: int, log2_base: int,
                           block: int | None = None,
                           depth: int | None = None,
                           noise_stddev: float = 0.0,
                           balanced: bool = False) -> BootstrapKey:
    """Bake a key from raw coefficient-domain TGSW samples
    (gsw: int32[n, l, k+1, k+1, N]) — also used by oracle-equivalence tests."""
    from .ops.conv import bake_block_toeplitz
    from .ops.karatsuba import bake_karatsuba, karatsuba_plan

    from .tuning import get_tuning

    poly_degree = gsw.shape[-1]
    t = _default_block(poly_degree) if block is None else block
    depth = _default_depth() if depth is None else depth
    depth = min(depth, (poly_degree // t).bit_length() - 1)
    limbs = prepare_tgsw(gsw, decomp_length, log2_base)  # [n, 4, P, K, 2N]
    k1 = gsw.shape[-2]
    # Resident-key budget (docs/serving.md): keep the compact prepared form
    # when the bake would not fit — the serving knob for many tenants/chip.
    budget = get_tuning().bs_bake_budget
    if budget >= 0:
        rows = (karatsuba_plan(poly_degree // t, depth, log2_base).total_rows
                if depth else 2 * (poly_degree // t))
        baked_bytes = gsw.shape[0] * rows * k1 * decomp_length * t * k1 * 4 * t
        if budget == 0 or baked_bytes > budget:
            return BootstrapKey(
                limbs, decomp_length, log2_base, poly_degree, k1 - 1, t,
                depth, noise_stddev, balanced, compact=True,
            )
    if depth:
        plan = karatsuba_plan(poly_degree // t, depth, log2_base)
        baked = bake_karatsuba(limbs, t, plan)
    else:
        baked = bake_block_toeplitz(limbs, t)
    return BootstrapKey(
        baked, decomp_length, log2_base, poly_degree, k1 - 1, t,
        depth, noise_stddev, balanced,
    )


def mux_rotate_baked(acc_a, e_i, barai, decomp_length: int, log2_base: int,
                     block: int, balanced: bool = False):
    """accum += BK_i (x) [(X^bara_i - 1) * accum] — the CMUX, baked form.

    acc_a: int32[B, k+1, N]; e_i: int8[2M, P*T, K*4*T]; barai: int32[B].
    Reference: src/bootstrap.jl:19-23. Branchless: barai == 0 makes the
    rotated accumulator equal the accumulator, so digits and delta are all
    zero (SURVEY.md section 2 item 3).
    """
    from .ops.conv import (
        block_toeplitz_matmul,
        recombine_block_prods,
        split_small_limbs,
    )
    from .tgsw import decompose

    b_sz, kp1, n = acc_a.shape
    rot = polynomial.mul_by_monomial(acc_a, barai[:, None])
    temp = rot - acc_a
    digits = decompose(temp, decomp_length, log2_base, balanced)
    digits = digits.reshape(b_sz, kp1 * decomp_length, n)
    d_limbs, d_shifts = split_small_limbs(digits, log2_base - 1)
    prods = block_toeplitz_matmul(d_limbs, e_i, block)
    delta = recombine_block_prods(prods, kp1, d_shifts)
    return acc_a + delta


def mux_rotate_karatsuba(acc_a, e_i, barai, decomp_length: int,
                         log2_base: int, block: int, plan,
                         balanced: bool = False):
    """The CMUX against a block-Karatsuba-baked key (ops/karatsuba.py).

    acc_a: int32[B, k+1, N]; e_i: int8[total_rows*P*T, K*4*T]; barai: int32[B].
    Bit-exact vs `mux_rotate_baked` (tests/test_karatsuba.py) and hence vs
    the oracle. Reference: src/bootstrap.jl:19-23.
    """
    from .ops.karatsuba import karatsuba_delta
    from .tgsw import decompose

    b_sz, kp1, n = acc_a.shape
    rot = polynomial.mul_by_monomial(acc_a, barai[:, None])
    digits = decompose(rot - acc_a, decomp_length, log2_base, balanced)
    digits = digits.reshape(b_sz, kp1 * decomp_length, n)
    return acc_a + karatsuba_delta(digits, e_i, block, plan)


def mux_rotate(accum: TLweSample, bki_limbs, barai,
               decomp_length: int, log2_base: int,
               balanced: bool = False) -> TLweSample:
    """CMUX against a prepared (non-baked) TGSW operand — low-volume paths
    and oracle tests. accum: [B, k+1, N]; barai: int32[B].
    Reference: src/bootstrap.jl:19-23.
    """
    temp = tlwe_mul_by_monomial(accum, barai) - accum
    delta = tgsw_extern_mul_prepared(temp, bki_limbs, decomp_length,
                                     log2_base, balanced)
    return TLweSample(accum.a + delta.a, accum.cv)


def _use_pallas_cmux() -> bool:
    """Pallas kernels on real TPU; XLA path elsewhere (tests force either via
    TuningConfig.cmux = pallas|xla; CPU runs the kernels in interpret mode)."""
    from .tuning import get_tuning

    mode = get_tuning().cmux
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu"


def blind_rotate(accum: TLweSample, bk: BootstrapKey, bara) -> TLweSample:
    """Multiply the accumulator by X^{sum_i bara_i * s_i} via n CMUX steps.

    accum: [B, k+1, N]; bara: int32[B, n] in [0, 2N).
    Reference: src/bootstrap.jl:32-39 (the `bara_i != 0` skip is subsumed by
    the branchless no-op identity).
    """
    l, b, t = bk.decomp_length, bk.log2_base, bk.block

    from .tuning import get_tuning

    if get_tuning().debug and _use_pallas_cmux():
        # opt-in safe mode: engine-vs-XLA bit crosscheck + gadget
        # invariants on live data (tfhe_tpu/debug.py)
        from .debug import crosscheck_blind_rotate

        return crosscheck_blind_rotate(accum, bk, bara)

    interpret = jax.default_backend() != "tpu"
    if bk.compact:
        # Compact serving path: the key is prepared limbs [n, 4, P, K, 2N];
        # the rotation runs as the COMPACT MEGAKERNEL — grid over steps,
        # the batch group's accumulator resident in VMEM, each step's dense
        # operand expanded IN-KERNEL (a strided lane rotate per entry/poly,
        # once per step for all batch cells) and consumed straight from
        # VMEM. The expanded key never exists in HBM; the extra work vs the
        # baked path is ~the VPU expansion pass per step, amortized over
        # the whole batch. Bit-exact vs the baked paths
        # (tests/test_compact_key.py).
        k1 = bk.mask_size + 1
        n_deg = bk.polynomial_degree
        # depth >= 1, or the M = 1 degenerate geometry (N == T: a depth-0
        # single-leaf plan is the exact dense convolution)
        fast = _use_pallas_cmux() and (bk.depth or n_deg == t) and (
            interpret or (t == 128 and n_deg % 128 == 0))
        if fast:
            from .ops.pallas_cmux import blind_rotate_pallas_compact
            from .tgsw import decomp_offset

            bara_t = jnp.swapaxes(jnp.asarray(bara, jnp.int32), 0, 1)
            out_a = blind_rotate_pallas_compact(
                accum.a, bk.baked, bara_t,
                n=n_deg, k1=k1, l=l, b=b, t=t, plan=bk.plan,
                offset=decomp_offset(l, b, bk.balanced),
                interpret=interpret,
            )
            from .noise import blind_rotate_var

            cv = accum.cv + blind_rotate_var(
                bk.n, bk.mask_size, l, b, bk.polynomial_degree,
                bk.noise_stddev, bk.balanced,
            )
            return TLweSample(out_a, cv)
        else:
            def step(acc_a, xs):
                limbs_i, bara_i = xs
                acc = TLweSample(
                    acc_a, jnp.zeros(acc_a.shape[0], jnp.float32))
                rot = tlwe_mul_by_monomial(acc, bara_i)
                temp = TLweSample(rot.a - acc_a, acc.cv)
                delta = tgsw_extern_mul_prepared(temp, limbs_i, l, b,
                                                 bk.balanced)
                return acc_a + delta.a, None

        bara_t = jnp.swapaxes(jnp.asarray(bara, jnp.int32), 0, 1)
        out_a, _ = jax.lax.scan(step, accum.a, (bk.baked, bara_t))
        from .noise import blind_rotate_var

        cv = accum.cv + blind_rotate_var(
            bk.n, bk.mask_size, l, b, bk.polynomial_degree, bk.noise_stddev,
            bk.balanced,
        )
        return TLweSample(out_a, cv)
    if bk.depth:
        plan = bk.plan
        if _use_pallas_cmux() and (interpret or t == 128):
            from .ops.pallas_cmux import (
                blind_rotate_pallas_karatsuba,
                blind_rotate_pallas_pipelined,
            )
            from .noise import blind_rotate_var
            from .tgsw import decomp_offset
            from .tuning import get_tuning

            # ONE kernel launch for the whole rotation (megakernel): the
            # accumulator stays in VMEM across all n steps per batch cell.
            # The two-subtile pipelined variant overlaps each subtile's VPU
            # rotate/decompose with the other's MXU dots and shares one E
            # fetch ring — the default for batches of >= 2 full cells
            # (TuningConfig.pipe = 0/1 forces).
            bara_t = jnp.swapaxes(jnp.asarray(bara, jnp.int32), 0, 1)
            pipe_env = get_tuning().pipe
            b_sz = accum.a.shape[0]
            use_pipe = (
                b_sz % 256 == 0 if pipe_env == "auto" else pipe_env == "1"
            )
            rotate_fn = (
                blind_rotate_pallas_pipelined if use_pipe
                else blind_rotate_pallas_karatsuba
            )
            out_a = rotate_fn(
                accum.a, bk.baked, bara_t,
                n=bk.polynomial_degree, k1=bk.mask_size + 1, l=l, b=b, t=t,
                plan=plan, offset=decomp_offset(l, b, bk.balanced),
                interpret=interpret,
            )
            cv = accum.cv + blind_rotate_var(
                bk.n, bk.mask_size, l, b, bk.polynomial_degree,
                bk.noise_stddev, bk.balanced,
            )
            return TLweSample(out_a, cv)

        def step(acc_a, xs):
            e_i, bara_i = xs
            return mux_rotate_karatsuba(
                acc_a, e_i, bara_i, l, b, t, plan, bk.balanced), None
    # Compiled Mosaic kernels need lane-aligned blocks (T == 128); interpret
    # mode (CPU differential tests) has no such constraint.
    elif _use_pallas_cmux() and (interpret or t == 128):
        from .ops.conv import split_small_limbs
        from .ops.pallas_cmux import cmux_step_pallas
        from .tgsw import decomp_offset

        _, d_shifts = split_small_limbs(jnp.zeros((1,), jnp.int32), b - 1)
        s_limbs = len(d_shifts)
        offset = decomp_offset(l, b, bk.balanced)

        def step(acc_a, xs):
            e_i, bara_i = xs
            out = cmux_step_pallas(
                acc_a, e_i, bara_i,
                n=bk.polynomial_degree, k1=bk.mask_size + 1, l=l, b=b, t=t,
                s_limbs=s_limbs, d_shifts=tuple(d_shifts), offset=offset,
                interpret=interpret,
            )
            return out, None
    else:
        def step(acc_a, xs):
            e_i, bara_i = xs
            return mux_rotate_baked(
                acc_a, e_i, bara_i, l, b, t, bk.balanced), None

    bara_t = jnp.swapaxes(jnp.asarray(bara, jnp.int32), 0, 1)  # [n, B]
    out_a, _ = jax.lax.scan(step, accum.a, (bk.baked, bara_t))
    from .noise import blind_rotate_var

    cv = accum.cv + blind_rotate_var(
        bk.n, bk.mask_size, l, b, bk.polynomial_degree, bk.noise_stddev,
        bk.balanced,
    )
    return TLweSample(out_a, cv)


def blind_rotate_and_extract(v, bk: BootstrapKey, barb, bara) -> LweSample:
    """result = LWE(v_p) where p = barb - sum(bara_i s_i) mod 2N.

    v: int32[B, N] test polynomial; barb: int32[B]; bara: int32[B, n].
    Reference: src/bootstrap.jl:50-59.
    """
    testvectbis = polynomial.mul_by_monomial(v, -jnp.asarray(barb, jnp.int32))
    accum = tlwe_noiseless_trivial(testvectbis, bk.mask_size)
    accum = blind_rotate(accum, bk, bara)
    return tlwe_extract_sample(accum)


def bootstrap_wo_keyswitch(bk: BootstrapKey, mu, x: LweSample) -> LweSample:
    """LWE(mu) iff phase(x) > 0 else LWE(-mu), in the extracted (N*k)-dim space.

    x: any batch shape [..., n] (flattened to one scan batch internally).
    Reference: src/bootstrap.jl:69-82.
    """
    p_degree = bk.polynomial_degree
    batch_shape = x.b.shape
    flat = LweSample(
        x.a.reshape((-1, x.a.shape[-1])), x.b.reshape(-1), x.cv.reshape(-1)
    )
    bara = decode_message(flat.a, p_degree * 2)  # [B, n], mod switch to 2N
    barb = decode_message(flat.b, p_degree * 2)  # [B]
    testvect = jnp.broadcast_to(
        jnp.asarray(mu, jnp.int32), flat.b.shape + (p_degree,)
    )
    out = blind_rotate_and_extract(testvect, bk, barb, bara)
    return LweSample(
        out.a.reshape(batch_shape + (out.a.shape[-1],)),
        out.b.reshape(batch_shape),
        out.cv.reshape(batch_shape),
    )


def bootstrap(bk: BootstrapKey, ks: KeyswitchKey, mu, x: LweSample) -> LweSample:
    """Full gate bootstrap: refresh noise and return to the n-dim LWE space.

    Reference: src/bootstrap.jl:92-95.
    """
    return keyswitch(ks, bootstrap_wo_keyswitch(bk, mu, x))
