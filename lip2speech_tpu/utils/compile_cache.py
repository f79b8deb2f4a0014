"""Persistent XLA compilation cache.

Full-size programs take 20-40 s (and the train step several minutes) to
compile through the single-chip axon tunnel; the persistent cache makes
every later process deserialize instead (measured: >115 s -> ~6 s compile
portion for a 2048^2 matmul chain). Enabled by every CLI / bench entry
point. Respects an explicit $JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/jax_l2s")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - read-only fs etc.
        pass
