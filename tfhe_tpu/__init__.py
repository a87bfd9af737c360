"""tfhe_tpu: a TPU-native TFHE framework (JAX/XLA/Pallas)."""
