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


def with_retries(fn, retries: int = 2, backoff_s: float = 5.0):
    """Failure-detection wrapper for flaky accelerator runtimes.

    Some TPU deployments surface transient worker crashes/restarts as
    ``JaxRuntimeError`` (UNAVAILABLE / FAILED_PRECONDITION).  This retries the
    callable after a short backoff — the persistent compile cache makes the
    retry cheap.  The reference has no failure handling at all (a dead worker
    hangs its process pool, SURVEY.md section 5).
    """
    import functools
    import time

    from .obs import logger

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        from jax.errors import JaxRuntimeError

        last = None
        for attempt in range(retries + 1):
            try:
                return fn(*args, **kwargs)
            except JaxRuntimeError as exc:
                msg = str(exc)
                transient = ("UNAVAILABLE" in msg
                             or "FAILED_PRECONDITION" in msg
                             or "crashed or restarted" in msg)
                if not transient or attempt == retries:
                    raise
                last = exc
                logger.warning(
                    "transient TPU runtime error (attempt %d/%d): %s",
                    attempt + 1, retries, msg.splitlines()[0])
                time.sleep(backoff_s)
        raise last  # unreachable

    return wrapped
