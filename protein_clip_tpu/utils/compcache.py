"""Persistent-compilation-cache setup, host-fingerprinted.

XLA:CPU stores AOT-compiled executables in the persistent cache keyed by
the computation alone — NOT by the machine features it was compiled for.
An entry written by a host with (say) full AVX-512 would load on a host
without it, risking SIGILL or silently different vector code. The cache
dir therefore embeds a hash of the CPU's feature flags: a different
machine generation gets a fresh cache instead of poisoned hits. TPU
entries are unaffected either way (their keys carry the device kind),
they just land in the per-host dir.

Reading the ``cpu_aot_loader`` "feature mismatch" errors: XLA bakes the
pseudo-features ``prefer-no-gather``/``prefer-no-scatter`` into compile
metadata, and host feature detection never reports them — so every AOT
cache hit logs a mismatch for those two, even a perfectly valid
same-host load. Only differences in REAL ISA flags indicate genuine
cross-machine reuse.
"""

from __future__ import annotations

import hashlib
import platform
from pathlib import Path


def _cpu_fingerprint() -> str:
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        flags = platform.processor()
    raw = f"{platform.machine()} {flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def cache_dir() -> Path:
    return Path.home() / ".cache" / f"jax_comp_cache_{_cpu_fingerprint()}"


def enable_persistent_cache(min_compile_secs: int = 2) -> None:
    """Point jax at the host-fingerprinted cache (idempotent)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
