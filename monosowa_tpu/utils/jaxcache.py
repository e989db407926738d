"""Machine-keyed persistent JAX compilation cache.

XLA:CPU executables in the persistent cache embed JIT-compiled machine
code; loading an entry written on a host with different CPU features
aborts the process (SIGABRT inside ``jax.Array._value`` at the first
execution — observed when this image migrates VMs between sessions).
Keying the cache directory by a fingerprint of the host's CPU feature
flags makes stale caches inert instead of fatal: a new machine simply
starts cold.
"""

from __future__ import annotations

import hashlib
import platform


def machine_fingerprint() -> str:
    """Short hash of the CPU feature set (+ arch) of the current host."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        pass
    blob = (platform.machine() + ":" + feats).encode()
    return hashlib.sha256(blob).hexdigest()[:10]


def machine_cache_dir(base: str) -> str:
    """``base`` -> ``base-<fingerprint>`` so caches never cross machines."""
    return f"{base}-{machine_fingerprint()}"


def enable_persistent_cache(base: str, min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at a machine-keyed dir.

    Returns the directory used (best-effort: config errors are swallowed so
    driver-critical paths never fail on cache setup).
    """
    import jax

    path = machine_cache_dir(base)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return path
