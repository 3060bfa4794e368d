"""JAX runtime configuration helpers."""
from __future__ import annotations

import os


def enable_persistent_compile_cache(path: str | None = None):
    """Turn on JAX's persistent compilation cache (idempotent).

    The lag-search FFT graphs take minutes to compile on some TPU toolchains;
    caching makes every process after the first start in milliseconds.
    """
    import jax

    path = path or os.environ.get(
        "EUICOREG_JAX_CACHE", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unknown config on exotic jax versions: non-fatal
        pass
