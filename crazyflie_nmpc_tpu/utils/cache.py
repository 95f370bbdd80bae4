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
from contextlib import contextmanager


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


@contextmanager
def persistent_cache_disabled():
    """Skip the persistent compilation cache for compiles in this context.

    jax 0.9 has no per-backend cache scoping: once the cache is enabled
    for the TPU (setup_compilation_cache above), CPU-*pinned* executables
    compiled in the same process — e.g. the host-side simulated plant in
    bench.py's serving decomposition — are persisted and re-loaded
    through the same XLA:CPU AOT loader this module documents as
    intermittently segfaulting ('Machine type ... doesn't match' loader
    errors were observed in bench serving-phase logs).  A segfault there
    at round close loses the driver's BENCH artifact.  Wrapping the CPU
    jit+warm-up in this context keeps those executables process-local
    while the TPU compiles outside it keep the cache."""
    import jax

    prev = bool(jax.config.jax_enable_compilation_cache)
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
