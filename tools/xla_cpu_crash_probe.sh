#!/usr/bin/env bash
# Reproduction probe for the XLA:CPU backend_compile segfault that
# tests/conftest.py works around by clearing jax caches every 8 tests.
#
# Symptom (first seen round 2, jaxlib 0.4.x-era CPU backend): once enough
# compiled executables accumulate in one process, backend_compile segfaults
# — reproducible at a stable collection point (test_radix ~12 tests in),
# gone when the module runs in isolation or caches are cleared.
#
# This probe runs the heaviest-compiling module WITH the workaround
# disabled. Interpretation:
#   * exit 0            -> the installed jaxlib no longer crashes; consider
#                          raising _CLEAR_EVERY or dropping the workaround
#                          (record the version below).
#   * exit 139/134/etc. -> crash still present; keep the workaround.
#
# Probe history:
#   jax 0.9.0 (2026-08, this image): STILL CRASHES — SIGSEGV inside
#   jax/_src/compiler.py:362 backend_compile_and_load after exactly 12
#   tests of test_radix (at test_radix_divide_by_zero), deterministic;
#   30/30 pass with the conftest workaround active. The workaround stays.
#
# Usage: bash tools/xla_cpu_crash_probe.sh [pytest-target]
set -u
TARGET=${1:-tests/test_radix.py}
cd "$(dirname "$0")/.."
TFHE_TPU_TEST_NOCLEAR=1 python -m pytest "$TARGET" -q -p no:cacheprovider
code=$?
echo "probe exit code: $code (0 = no crash; 139 = SIGSEGV)"
exit $code
