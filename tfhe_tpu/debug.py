"""Opt-in debug mode: runtime invariant checks at kernel boundaries.

The pure-functional design removes the data-race bug class the reference's
survey row worried about, but a silent Mosaic miscompile (or a DMA-schedule
race, which interpret-mode differential tests cannot see) would produce
WRONG CIPHERTEXTS, not errors. With `TuningConfig.debug = True`
(TFHE_TPU_DEBUG=1), the blind-rotation dispatcher:

* runs the compiled Pallas engine AND the XLA reference path and raises
  `FHEDebugError` on any bit mismatch (host callback: synchronous in eager
  mode, surfaced at the next device sync under jit);
* asserts the gadget-decomposition invariants on the live operands —
  digits in [-B/2, B/2) and exact reconstruction to l*b bits (the
  contract everything downstream relies on, SURVEY.md section 2 item 3);
* returns the XLA path's result, so debug mode is also a SAFE mode — even
  an undetected engine bug cannot corrupt outputs while it is on.

Cost: ~2.2x per bootstrap. The knob joins checkpoint fingerprints
(tuning.py RESULT_AFFECTING) so a job cannot silently resume with checks
dropped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class FHEDebugError(AssertionError):
    """A kernel-boundary invariant failed under TFHE_TPU_DEBUG=1."""


def _raise_on_mismatch(count, where):
    count = int(np.asarray(count))
    if count:
        raise FHEDebugError(
            f"debug crosscheck failed: {count} int32 words differ between "
            f"the compiled engine and the XLA reference path at {where} — "
            "suspect a miscompile or DMA race in the Pallas kernels")


def _raise_on_gadget(bad_digits, bad_recon, l, b, balanced):
    bad_digits = int(np.asarray(bad_digits))
    bad_recon = int(np.asarray(bad_recon))
    if bad_digits or bad_recon:
        raise FHEDebugError(
            f"gadget invariant violated (l={l}, b={b}, balanced={balanced}):"
            f" {bad_digits} digits outside [-B/2, B/2), {bad_recon} "
            f"coefficients reconstruct outside the {l * b}-bit rounding "
            "bound")


def check_gadget_invariants(x, decomp_length: int, log2_base: int,
                            balanced: bool) -> None:
    """Assert decompose's contract on live data: digit range and exact
    l*b-bit reconstruction (|error| <= ulp for the reference-exact
    truncating gadget, <= ulp/2 for the balanced one; decompose(0) == 0
    follows from the reconstruction bound at x = 0 only for balanced —
    the truncating bound is checked as-is)."""
    from .tgsw import decompose, gadget_values

    digits = decompose(x, decomp_length, log2_base, balanced)
    half = 1 << (log2_base - 1)
    bad_digits = jnp.sum((digits < -half) | (digits >= half))

    # digits: x.shape[:-1] + (l, N) — reduce the inserted l axis.
    # int32 wraparound IS arithmetic mod 2^32, so the wrapped error needs
    # no 64-bit widening (which plain jax configs do not enable anyway).
    g = gadget_values(decomp_length, log2_base)
    rec = jnp.sum(digits * g[:, None], axis=-2)  # int32 wrap: exact mod 2^32
    err = jnp.asarray(x, jnp.int32) - rec
    lb = decomp_length * log2_base
    bound = (1 << (32 - lb - 1)) if balanced else (1 << (32 - lb))
    bad_recon = jnp.sum(jnp.abs(err) > bound)
    jax.debug.callback(_raise_on_gadget, bad_digits, bad_recon,
                       decomp_length, log2_base, balanced)


def crosscheck_blind_rotate(accum, bk, bara):
    """Debug-mode blind rotation: engine vs XLA reference, bit-compared.

    Returns the XLA result (safe mode). Called from bootstrap.blind_rotate
    when TuningConfig.debug is set and a compiled engine would be used.
    """
    from . import bootstrap
    from .tuning import override

    with override(debug=False):
        fast = bootstrap.blind_rotate(accum, bk, bara)
    with override(debug=False, cmux="xla"):
        ref = bootstrap.blind_rotate(accum, bk, bara)
    mismatch = jnp.sum(jnp.not_equal(fast.a, ref.a))
    jax.debug.callback(_raise_on_mismatch, mismatch, "blind_rotate")
    # gadget invariants on a live operand: the first CMUX step's
    # decomposition input (X^bara_0 - 1) * accum
    from . import polynomial

    bara0 = jnp.asarray(bara, jnp.int32)[..., 0]
    rot = polynomial.mul_by_monomial(accum.a, bara0[..., None])
    check_gadget_invariants(rot - accum.a, bk.decomp_length, bk.log2_base,
                            bk.balanced)
    return ref
