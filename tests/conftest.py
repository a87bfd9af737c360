"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run against
XLA's host-platform device emulation (8 virtual CPU devices), exactly how the
driver validates `dryrun_multichip`. Must be set before jax imports.
"""

import os

# Force CPU: the harness pre-sets JAX_PLATFORMS=axon (a tunneled TPU chip with
# per-dispatch network latency) and a sitecustomize that imports jax at
# interpreter startup — so the env var alone is too late; the config must be
# updated explicitly before any backend is initialized.
# TFHE_TPU_TEST_BACKEND=tpu keeps the real backend for the on-chip test tier
# (`pytest -m tpu`), which compiles the Mosaic kernels for real instead of
# running them in interpret mode.
_ON_CHIP = os.environ.get("TFHE_TPU_TEST_BACKEND") == "tpu"
if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(123)


# The XLA:CPU segfault workaround below can be disabled for reproduction
# runs with TFHE_TPU_TEST_NOCLEAR=1 (see the fixture docstrings).
_NOCLEAR = os.environ.get("TFHE_TPU_TEST_NOCLEAR") == "1"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop trace/compile caches after each test module.

    The suite compiles hundreds of programs; XLA:CPU has been observed to
    segfault inside backend_compile once enough compiled state accumulates
    (reproducible at the same collection point, gone in isolation). Clearing
    between modules keeps the compiler's working set bounded — and caps the
    suite's memory growth as a side effect.
    """
    yield
    if not _NOCLEAR:
        jax.clear_caches()


_TESTS_SINCE_CLEAR = [0]
_CLEAR_EVERY = 8  # test_radix alone crashes XLA:CPU after ~12 tests unclear


@pytest.fixture(autouse=True)
def _clear_jax_caches_periodically():
    """Also clear every few tests WITHIN a module.

    As modules grew, the XLA:CPU backend_compile segfault reappeared
    mid-module (first seen inside test_radix at ~45% of the suite);
    module-boundary clearing alone no longer bounds the compiler's working
    set. A periodic clear costs a few recompiles per module and keeps the
    accumulated compiled state far below the crash threshold.

    Reproduction / status: TFHE_TPU_TEST_NOCLEAR=1 disables both clearing
    fixtures to re-probe whether the installed jaxlib still crashes
    (tools/xla_cpu_crash_probe.sh records the per-version result).
    """
    yield
    if _NOCLEAR:
        return
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= _CLEAR_EVERY:
        _TESTS_SINCE_CLEAR[0] = 0
        jax.clear_caches()
