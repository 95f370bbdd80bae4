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
                            min_compile_secs: float = 0.5) -> str | None:
    """Point JAX's persistent cache at a host-specific directory.

    On the CPU backend the cache is left DISABLED: this jaxlib's XLA:CPU
    AOT deserialization intermittently segfaults even on same-host entries
    (observed twice in CI at `compilation_cache.get_executable_and_time`,
    preceded by 'Machine type used for XLA:CPU compilation doesn't match'
    loader errors).  TPU executables don't go through that loader, so the
    cache stays on where it matters (bench / serving startup).
    """
    import jax

    if jax.default_backend() == "cpu":
        return None
    path = f"{base}_{_cpu_fingerprint()}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
