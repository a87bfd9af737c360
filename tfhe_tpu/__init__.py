"""tfhe_tpu: a TPU-native TFHE framework (JAX/XLA/Pallas).

Brand-new implementation of TFHE gate bootstrapping and multi-key TFHE with
the capability surface of the reference Julia library (see SURVEY.md), built
TPU-first: batched struct-of-arrays ciphertexts, exact int8-limb MXU
convolutions instead of float FFTs, branchless scan-based blind rotation, and
`jax.sharding` scale-out.
"""

from .params import (
    SchemeParameters,
    tfhe_parameters_80,
    tfhe_parameters_128,
    tfhe_parameters_128_fast,
    tfhe_parameters_128_fast8,
    tfhe_parameters_128_pbs,
    tfhe_parameters_128_radix,
    tfhe_parameters_128_radix_reliable,
    tfhe_parameters_toy,
)
from .numeric import encode_message, decode_message, dtot32
from .lwe import (
    LweSample,
    lwe_encrypt,
    lwe_phase,
    lwe_noiseless_trivial,
    lwe_key_gen,
)
from .tlwe import (
    TLweSample,
    tlwe_key_gen,
    extract_lwe_key,
    tlwe_extract_sample,
    tlwe_encrypt_zero,
    tlwe_noiseless_trivial,
    tlwe_mul_by_monomial,
)
from .tgsw import (
    decompose,
    gadget_values,
    tgsw_encrypt,
    tgsw_extern_mul,
    tgsw_extern_mul_prepared,
    prepare_tgsw,
)
# NOTE: the `keyswitch` and `bootstrap` *functions* are deliberately not
# re-exported at package level — they would shadow their submodules (the
# reference likewise keeps them internal, src/TFHE.jl:24-61 exports only
# keys/gates/params). Use tfhe_tpu.keyswitch.keyswitch / tfhe_tpu.bootstrap.*.
from .keyswitch import KeyswitchKey, keyswitch_key_gen
from .bootstrap import BootstrapKey, bootstrap_key_gen
from . import keyswitch, bootstrap  # noqa: F811 — rebind submodules last
from .api import (
    SecretKey,
    CloudKey,
    make_secret_key,
    make_cloud_key,
    make_key_pair,
    encrypt,
    decrypt,
)
from .gates import (
    gate_nand,
    gate_or,
    gate_and,
    gate_xor,
    gate_xnor,
    gate_not,
    gate_constant,
    gate_nor,
    gate_andny,
    gate_andyn,
    gate_orny,
    gate_oryn,
    gate_mux,
)
from . import polynomial
from . import circuits
from . import compressed
from . import public
from . import rekey
from . import pbs
from . import radix
from . import mk
from .ops import conv

__all__ = [name for name in dir() if not name.startswith("_")]
__version__ = "0.1.0"
