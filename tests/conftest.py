"""Test configuration: run on CPU with a virtual 8-device mesh and f64.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (the standard XLA trick); numerics
tests use float64 so golden comparisons are not precision-limited.

NOTE: this environment's sitecustomize registers a TPU plugin and overrides
`jax_platforms` at interpreter start, so the JAX_PLATFORMS env var alone is
NOT sufficient — the config must be re-set after importing jax (env-var-only
selection silently left the whole suite running f64-emulated on the TPU).
XLA_FLAGS must still be set before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles dominate test wall-time on small
# hosts; cache across runs so only changed computations recompile.  The dir
# is keyed by CPU fingerprint — XLA:CPU AOT artifacts from a different
# machine segfault on load (utils/cache.py).
from crazyflie_nmpc_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_footprint():
    """Drop JAX's in-memory executable/tracing caches after every module.

    The suite compiles hundreds of distinct XLA:CPU programs (several at
    f64, N up to 400); with all executables held live in one process the
    cumulative footprint eventually segfaults the XLA:CPU compiler on
    this jaxlib (observed in rounds 1-2 at ~163/177 tests — the crash
    site moves with test order, the cause is suite-global).  Clearing
    per module bounds the live-executable set to one module's worth;
    the persistent on-disk compilation cache (setup_compilation_cache
    above) makes any re-compile of a shared computation a cheap reload.
    """
    yield
    jax.clear_caches()
