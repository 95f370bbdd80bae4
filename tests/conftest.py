"""Test configuration: run on CPU with a virtual 8-device mesh and f64.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (the standard XLA trick); numerics tests
use float64 so golden comparisons are not precision-limited.  These env vars
must be set before jax initializes its backends, hence module scope here.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles dominate test wall-time on small
# hosts; cache across runs so only changed computations recompile.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
