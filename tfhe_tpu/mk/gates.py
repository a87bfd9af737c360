"""Multi-key bootstrapped gates (reference: src/mk_gates.jl).

The reference ships only NAND; the affine+bootstrap structure is identical to
the single-key gate library, so the full gate set is provided here as a
capability extension (constants per src/gates.jl).
"""

from __future__ import annotations

from ..numeric import encode_message
from .api import MKCloudKey
from .internals import (
    MKLweSample,
    mk_bootstrap,
    mk_bootstrap_wo_keyswitch,
    mk_keyswitch,
    mk_lwe_noiseless_trivial,
)

_MU = encode_message(1, 8)
_NEG_MU = encode_message(-1, 8)
_QUARTER = encode_message(1, 4)
_NEG_QUARTER = encode_message(-1, 4)


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


def mk_gate_xor(ck: MKCloudKey, x: MKLweSample, y: MKLweSample) -> MKLweSample:
    """XOR = mk_bootstrap(1/4 + 2(x + y)) (constants per src/gates.jl:51-54).

    Note: the 2(x+y) combination doubles input noise, so on the 2-party
    production preset (intrinsically ~1.5%/gate for NAND,
    docs/mk_noise_budget.md) XOR/XNOR fail correspondingly more often;
    the 4/8-party presets have ample margin.
    """
    temp = _trivial(_QUARTER, ck, x) + (x + y) * 2
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_xnor(ck: MKCloudKey, x: MKLweSample,
                 y: MKLweSample) -> MKLweSample:
    """XNOR = mk_bootstrap(-1/4 - 2(x + y)) (src/gates.jl:63-66)."""
    temp = _trivial(_NEG_QUARTER, ck, x) - (x + y) * 2
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_nor(ck: MKCloudKey, x: MKLweSample, y: MKLweSample) -> MKLweSample:
    """NOR = mk_bootstrap(-1/8 - x - y) (src/gates.jl:102-105)."""
    temp = _trivial(_NEG_MU, ck, x) - x - y
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_andny(ck: MKCloudKey, x: MKLweSample,
                  y: MKLweSample) -> MKLweSample:
    """ANDNY = AND(NOT x, y) = mk_bootstrap(-1/8 - x + y) (src/gates.jl:114-117)."""
    temp = _trivial(_NEG_MU, ck, x) - x + y
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_andyn(ck: MKCloudKey, x: MKLweSample,
                  y: MKLweSample) -> MKLweSample:
    """ANDYN = AND(x, NOT y) = mk_bootstrap(-1/8 + x - y) (src/gates.jl:126-129)."""
    temp = _trivial(_NEG_MU, ck, x) + x - y
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_orny(ck: MKCloudKey, x: MKLweSample,
                 y: MKLweSample) -> MKLweSample:
    """ORNY = OR(NOT x, y) = mk_bootstrap(1/8 - x + y) (src/gates.jl:138-141)."""
    temp = _trivial(_MU, ck, x) - x + y
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_oryn(ck: MKCloudKey, x: MKLweSample,
                 y: MKLweSample) -> MKLweSample:
    """ORYN = OR(x, NOT y) = mk_bootstrap(1/8 + x - y) (src/gates.jl:150-153)."""
    temp = _trivial(_MU, ck, x) + x - y
    return mk_bootstrap(ck.bootstrap_key, ck.keyswitch_keys, _MU, temp)


def mk_gate_mux(ck: MKCloudKey, x: MKLweSample, y: MKLweSample,
                z: MKLweSample) -> MKLweSample:
    """MUX(x, y, z) = x ? y : z via 2 MK blind rotations + 1 MK keyswitch.

    Same 2-rotation structure as the single-key MUX (src/gates.jl:163-177):
    the intermediate sums live in the extracted space.
    """
    bk, ks = ck.bootstrap_key, ck.keyswitch_keys

    t1 = _trivial(_NEG_MU, ck, x) + x + y  # AND(x, y)
    u1 = mk_bootstrap_wo_keyswitch(bk, _MU, t1)

    t2 = _trivial(_NEG_MU, ck, x) - x + z  # AND(NOT(x), z)
    u2 = mk_bootstrap_wo_keyswitch(bk, _MU, t2)

    t3 = mk_lwe_noiseless_trivial(_MU, u1.n, ck.parties, u1.b.shape) + u1 + u2
    return mk_keyswitch(ks, t3)
