"""Test harness configuration.

Runs the whole suite on the CPU backend with 8 virtual devices so that
multi-chip sharding (mesh/shard_map) is exercised without TPU hardware —
the environment's stand-in for the reference's device-parametrized tests
(reference ``tests/utils.py:5-30``). Must set env vars before jax import.

Expected skips on the default CPU run (the green state is "0 failed,
N skipped" where every skip is on this list; anything else is red):

* backend-conditional (TPU-only fast paths whose interpret-mode
  equivalents cost minutes and are covered by smaller-shape tests):
  ``test_expm_pallas.py`` d=8 Mathias block, ``test_tpu_smoke.py``
  n>16 / d>=6 smokes, ``test_rolled32.py`` hardware-mirror rows;
* environment-conditional: ``test_native.py`` (entire module) when the
  C++ tier didn't build, ``test_graft.py``/``test_parallel.py`` multi-
  device tests when <8 virtual devices (never under this conftest);
* API-shape skips that fire on every platform:
  ``test_batched.py`` regularizer row, ``test_reduce.py`` keepdim row.

Setting ``FASTMATH_TEST_PLATFORM=axon`` flips the backend-conditional
group from skipped to run (and skips the interpret-only mirrors).
"""
import os

# Force CPU even under the axon TPU tunnel (its sitecustomize sets
# JAX_PLATFORMS=axon at interpreter start; backends initialize lazily, so
# overriding here still wins as long as no jax op ran yet). Set
# FASTMATH_TEST_PLATFORM=axon to run the suite on the real chip instead
# (the device-parametrization axis of the reference's test strategy).
_platform = os.environ.get("FASTMATH_TEST_PLATFORM", "cpu")
if _platform == "axon":
    # fail fast instead of hanging the whole pytest process: device
    # init under axon blocks forever when the relay tunnel is down
    # (observed round 3); probe in a subprocess — a hung PJRT init
    # cannot be interrupted in-process.
    import subprocess
    import sys as _sys

    try:
        subprocess.run(
            [_sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=600, check=True,
        )
    except Exception as e:
        raise RuntimeError(
            f"FASTMATH_TEST_PLATFORM=axon but TPU device init failed "
            f"({type(e).__name__}) — relay tunnel down? Unset the "
            f"variable to run the CPU suite."
        ) from e
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# jax snapshots JAX_PLATFORMS at import time (which already happened in
# sitecustomize), so the env var alone is not enough.
jax.config.update("jax_platforms", _platform)
if _platform == "cpu":
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    One process compiles thousands of distinct jitted programs across
    the suite; past ~25 min of accumulated executables the XLA CPU
    client segfaults inside a later compile (reproducible at the same
    test, gone when the same module runs alone or with only half the
    suite before it). Dropping caches at module boundaries keeps the
    live-executable count bounded; within a module everything still
    shares compilations.
    """
    yield
    jax.clear_caches()
