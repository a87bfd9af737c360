"""Multi-key TFHE (Chen-Chillotti-Song), TPU-native.

Capability surface of the reference's MK layer (src/mk_internals.jl,
src/mk_api.jl, src/mk_gates.jl): shared/public keys, uni-encryption,
ciphertext expansion, MK external product, MK blind rotation and keyswitch,
the key ceremony, and bootstrapped MK gates.
"""

from .api import (
    SharedKey,
    CloudKeyPart,
    MKCloudKey,
    make_shared_key,
    make_cloud_key_part,
    make_mk_cloud_key,
    mk_encrypt,
    mk_decrypt,
    mk_partial_decrypt,
    mk_combine_shares,
    mktfhe_parameters_2party,
    mktfhe_parameters_2party_lownoise,
    mktfhe_parameters_4party,
    mktfhe_parameters_8party,
    mktfhe_parameters_toy,
)
from .internals import (
    MKLweSample,
    MKTGswUESample,
    MKTGswExpSample,
    MKBootstrapKey,
    mk_lwe_phase,
    mk_lwe_noiseless_trivial,
    mk_tgsw_encrypt,
    mk_tgsw_expand,
    mk_keyswitch,
    mk_blind_rotate,
    mk_bootstrap,
    mk_bootstrap_wo_keyswitch,
)
from .gates import (
    mk_gate_nand,
    mk_gate_and,
    mk_gate_or,
    mk_gate_not,
    mk_gate_xor,
    mk_gate_xnor,
    mk_gate_nor,
    mk_gate_andny,
    mk_gate_andyn,
    mk_gate_orny,
    mk_gate_oryn,
    mk_gate_mux,
)

__all__ = [name for name in dir() if not name.startswith("_")]
