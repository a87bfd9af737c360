"""Multi-key bootstrapped gates (reference: src/mk_gates.jl).

The reference ships only NAND; the affine+bootstrap structure is identical to
the single-key gate library, so the full gate set is provided here as a
capability extension (constants per src/gates.jl).
"""

from __future__ import annotations

from ..numeric import encode_message
from .api import MKCloudKey
from .internals import MKLweSample, mk_bootstrap, mk_lwe_noiseless_trivial

_MU = encode_message(1, 8)
_NEG_MU = encode_message(-1, 8)


def _trivial(mu, ck: MKCloudKey, x: MKLweSample) -> MKLweSample:
    return mk_lwe_noiseless_trivial(mu, x.n, ck.parties, x.b.shape)


def mk_gate_nand(ck: MKCloudKey, x: MKLweSample, y: MKLweSample,
                 segments: int = 1) -> MKLweSample:
    """NAND = mk_bootstrap(1/8 - x - y). Reference: src/mk_gates.jl:7-12.

    segments > 1 (outside jit only) splits the rotation into host-level
    chunks for devices with program-duration limits (see mk_blind_rotate).
    """
    temp = _trivial(_MU, ck, x) - x - y
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp, segments)


def mk_gate_and(ck: MKCloudKey, x: MKLweSample, y: MKLweSample) -> MKLweSample:
    """AND = mk_bootstrap(-1/8 + x + y) (constants per src/gates.jl:39-42)."""
    temp = _trivial(_NEG_MU, ck, x) + x + y
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_or(ck: MKCloudKey, x: MKLweSample, y: MKLweSample) -> MKLweSample:
    """OR = mk_bootstrap(1/8 + x + y) (constants per src/gates.jl:27-30)."""
    temp = _trivial(_MU, ck, x) + x + y
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_not(ck: MKCloudKey, x: MKLweSample) -> MKLweSample:
    """NOT = negation, no bootstrap (src/gates.jl:76-79)."""
    return -x
