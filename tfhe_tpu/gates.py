"""Bootstrapped boolean gate library, batched.

TPU-native counterpart of the reference's gate layer
(reference: src/gates.jl:1-177). Contract (src/gates.jl:1-6): inputs/outputs
are LWE samples with message in {-1/8, +1/8} and noise < 1/16; positive phase
encodes `true`. Every two-input gate is one affine combination plus one
bootstrap with mu = 1/8; all gates accept batches (leading dim B) and are
jit-compatible with the CloudKey as a pytree argument.
"""

from __future__ import annotations

from .api import CloudKey
from .bootstrap import bootstrap, bootstrap_wo_keyswitch
from .keyswitch import keyswitch
from .lwe import LweSample, lwe_noiseless_trivial
from .numeric import encode_message

_MU = encode_message(1, 8)  # +1/8
_NEG_MU = encode_message(-1, 8)  # -1/8
_QUARTER = encode_message(1, 4)  # +1/4
_NEG_QUARTER = encode_message(-1, 4)  # -1/4


def _trivial(mu, x: LweSample) -> LweSample:
    return lwe_noiseless_trivial(mu, x.n, x.batch_shape)


def gate_nand(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """NAND = bootstrap(1/8 - x - y). Reference: src/gates.jl:15-18."""
    result = _trivial(_MU, x) - x - y
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_or(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """OR = bootstrap(1/8 + x + y). Reference: src/gates.jl:27-30."""
    result = _trivial(_MU, x) + x + y
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_and(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """AND = bootstrap(-1/8 + x + y). Reference: src/gates.jl:39-42."""
    result = _trivial(_NEG_MU, x) + x + y
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_xor(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """XOR = bootstrap(1/4 + 2(x + y)). Reference: src/gates.jl:51-54."""
    result = _trivial(_QUARTER, x) + (x + y) * 2
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_xnor(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """XNOR = bootstrap(-1/4 - 2(x + y)). Reference: src/gates.jl:63-66."""
    result = _trivial(_NEG_QUARTER, x) - (x + y) * 2
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_not(ck: CloudKey, x: LweSample) -> LweSample:
    """NOT = negation; no bootstrap needed. Reference: src/gates.jl:76-79."""
    return -x


def gate_constant(ck: CloudKey, value, batch_shape=()) -> LweSample:
    """Noiseless trivial sample of a plaintext bool — NOT encrypted.

    Reference: src/gates.jl:91-93.
    """
    import jax.numpy as jnp

    mu = jnp.where(
        jnp.asarray(value, bool), jnp.int32(_MU), jnp.int32(_NEG_MU)
    )
    return lwe_noiseless_trivial(mu, ck.params.lwe_size, batch_shape)


def gate_nor(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """NOR = bootstrap(-1/8 - x - y). Reference: src/gates.jl:102-105."""
    result = _trivial(_NEG_MU, x) - x - y
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_andny(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """AND(NOT(x), y) = bootstrap(-1/8 - x + y). Reference: src/gates.jl:114-117."""
    result = _trivial(_NEG_MU, x) - x + y
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_andyn(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """AND(x, NOT(y)) = bootstrap(-1/8 + x - y). Reference: src/gates.jl:126-129."""
    result = _trivial(_NEG_MU, x) + x - y
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_orny(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """OR(NOT(x), y) = bootstrap(1/8 - x + y). Reference: src/gates.jl:138-141."""
    result = _trivial(_MU, x) - x + y
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_oryn(ck: CloudKey, x: LweSample, y: LweSample) -> LweSample:
    """OR(x, NOT(y)) = bootstrap(1/8 + x - y). Reference: src/gates.jl:150-153."""
    result = _trivial(_MU, x) + x - y
    return bootstrap(ck.bootstrap_key, ck.keyswitch_key, _MU, result)


def gate_mux(ck: CloudKey, x: LweSample, y: LweSample, z: LweSample) -> LweSample:
    """MUX(x, y, z) = x ? y : z via 2 blind rotations + 1 keyswitch.

    The intermediate sums live in the extracted (N*k)-dim space — faster and
    lower-noise than 3 full bootstraps. Reference: src/gates.jl:163-177.
    """
    bk, ks = ck.bootstrap_key, ck.keyswitch_key

    t1 = _trivial(_NEG_MU, x) + x + y  # AND(x, y)
    u1 = bootstrap_wo_keyswitch(bk, _MU, t1)

    t2 = _trivial(_NEG_MU, x) - x + z  # AND(NOT(x), z)
    u2 = bootstrap_wo_keyswitch(bk, _MU, t2)

    t3 = lwe_noiseless_trivial(_MU, u1.n, u1.batch_shape) + u1 + u2  # OR
    return keyswitch(ks, t3)
