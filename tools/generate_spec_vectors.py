"""Generate `spec/vectors/spec_vectors.npz` from the NumPy executable spec.

Same file format as tools/dump_reference_vectors.jl (the Julia golden-vector
dumper): inputs drawn from a seeded NumPy RNG, outputs computed by
spec/oracle.py. This proves tests/test_reference_vectors.py consumes the
format correctly even where Julia is unavailable — when a real
reference_vectors.npz is generated and dropped next to it, the same test
body validates against the reference binary itself.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/generate_spec_vectors.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spec.oracle as oracle  # noqa: E402


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "spec", "vectors")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(123)

    n_lwe, n, k, l, b = 16, 256, 1, 2, 10
    t32 = lambda shape: rng.integers(  # noqa: E731
        -(2**31), 2**31, size=shape, dtype=np.int64).astype(np.int32)

    vec = {}
    vec["params"] = np.asarray([n_lwe, n, k, l, b], np.int32)
    vec["lwe_key"] = rng.integers(0, 2, n_lwe).astype(np.int32)
    vec["tlwe_key"] = rng.integers(0, 2, (k, n)).astype(np.int32)

    vec["dec_in"] = t32(n)
    vec["dec_out"] = oracle.decompose(vec["dec_in"], l, b)

    vec["tm_x"] = rng.integers(-64, 64, n).astype(np.int32)
    vec["tm_y"] = t32(n)
    vec["tm_out"] = oracle.negacyclic_mul(vec["tm_x"], vec["tm_y"])

    # raw TGSW rows standing in for the bootstrap key (the oracle consumes
    # the same coefficient-domain layout as the Julia dump: [n, l, K, K, N])
    vec["bk_raw"] = t32((n_lwe, l, k + 1, k + 1, n))

    vec["em_acc"] = t32((k + 1, n))
    # the external PRODUCT (reference tgsw_extern_mul returns the product,
    # not the accumulated sample — mux_rotate does the addition)
    vec["em_out"] = oracle.tgsw_extern_mul(vec["em_acc"], vec["bk_raw"][0],
                                           l, b)

    vec["mr_acc"] = t32((k + 1, n))
    vec["mr_barai"] = np.asarray([int(rng.integers(1, 2 * n))], np.int32)
    vec["mr_out"] = oracle.mux_rotate(
        vec["mr_acc"], vec["bk_raw"][1], int(vec["mr_barai"][0]), l, b)

    vec["br_acc"] = t32((k + 1, n))
    bara = rng.integers(0, 2 * n, n_lwe).astype(np.int32)
    bara[0] = 0
    vec["br_bara"] = bara
    vec["br_out"] = oracle.blind_rotate(
        vec["br_acc"], vec["bk_raw"], bara, l, b)
    ex_a, ex_b = oracle.tlwe_extract_sample(vec["br_out"])
    vec["ex_a"] = ex_a
    vec["ex_b"] = np.asarray([ex_b], np.int32)

    ks_l, ks_b = 8, 2
    base = 1 << ks_b
    n_in = n * k
    vec["ks_a"] = t32((base - 1, ks_l, n_in, n_lwe))
    vec["ks_b"] = t32((base - 1, ks_l, n_in))
    vec["ks_in_a"] = t32(n_in)
    vec["ks_in_b"] = np.asarray([int(t32(1)[0])], np.int32)
    out_a, out_b = oracle.keyswitch(
        vec["ks_a"], vec["ks_b"], vec["ks_in_a"], int(vec["ks_in_b"][0]),
        ks_l, ks_b)
    vec["ks_out_a"] = out_a
    vec["ks_out_b"] = np.asarray([out_b], np.int32)

    path = os.path.join(out_dir, "spec_vectors.npz")
    np.savez(path, **vec)
    print("wrote", path)


if __name__ == "__main__":
    main()
