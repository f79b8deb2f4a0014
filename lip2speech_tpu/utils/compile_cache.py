"""Persistent XLA compilation cache.

Full-size programs take 20-40 s (and the train step several minutes) to
compile through the single-chip axon tunnel; the persistent cache makes
every later process deserialize instead (measured: >115 s -> ~6 s compile
portion for a 2048^2 matmul chain). Enabled by every CLI / bench entry
point. Respects an explicit $JAX_COMPILATION_CACHE_DIR.

CPU-backend entries are scoped to a per-host CPU-feature fingerprint:
XLA:CPU serializes AOT code specialized to the compiling machine's ISA
extensions, and deserializing it on a host with different features logs
"machine feature +prefer-no-gather is not supported" loader errors and
can SIGILL (observed in MULTICHIP_r04.json's tail — the multichip dryrun
runs on whatever host the driver lands on). TPU entries are
target-specific already and stay shared.
"""

from __future__ import annotations

import hashlib
import os

DEFAULT_DIR = os.path.expanduser("~/.cache/jax_l2s")


def _cpu_feature_fingerprint() -> str:
    """Stable 8-hex digest of this host's CPU feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nofeat"


def _cpu_backend_requested() -> bool:
    """True when this process will run on the XLA:CPU backend (checked
    from the environment so the backend is not initialized early)."""
    plats = os.environ.get("JAX_PLATFORMS", "") or os.environ.get(
        "JAX_PLATFORM_NAME", ""
    )
    return "cpu" in plats.lower()


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    if _cpu_backend_requested():
        cache_dir = os.path.join(cache_dir, f"cpu-{_cpu_feature_fingerprint()}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - read-only fs etc.
        pass
