"""Small cross-cutting utilities (no reference analog)."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    Works with the remote (axon) TPU backend: measured here, a cache hit
    saves the full remote compile (~10-15 min for the flagship train step
    with both Pallas kernels).  Safe to call multiple times; a read-only or
    unavailable cache dir degrades to no caching.
    """
    import jax

    cache_dir = path or os.environ.get(
        "NRHINTS_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "nrhints_jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Only persist expensive programs: tiny jits cost more to serialize
        # than to recompile.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
