"""Persistent-compilation-cache setup, keyed by host CPU identity.

XLA:CPU serializes AOT executables specialized to the *compiling* machine's
feature set (AVX-512 variants etc.).  A cache directory shared across
heterogeneous hosts segfaults on deserialization ("Machine type used for
XLA:CPU compilation doesn't match the machine type for execution ... SIGILL").
Keying the directory by a fingerprint of the CPU flags makes the cache safe
to keep on shared scratch across pool machines.
"""

from __future__ import annotations

import hashlib


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def setup_compilation_cache(base: str = "/tmp/jax_cache",
                            min_compile_secs: float = 0.5) -> str:
    """Point JAX's persistent cache at a host-specific directory."""
    import jax

    path = f"{base}_{_cpu_fingerprint()}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
