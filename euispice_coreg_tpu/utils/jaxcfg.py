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


def ensure_backend_available():
    """Fall back to CPU when the pinned platform's plugin cannot load.

    A sitecustomize hook may pin ``jax_platforms`` to a plugin backend
    (e.g. a tunneled TPU) whose plugin is only importable with its site
    directory on PYTHONPATH; outside that environment every first device
    use raises ``RuntimeError: Unable to initialize backend``.  Examples
    and standalone scripts call this once at startup to degrade to CPU
    instead of crashing.  No-op when the configured backend initializes.
    """
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        jax.devices()  # raises only if even CPU is unavailable


# Error classes that retrying can never fix: the same call will fail the
# same way until a human (or a redeploy) changes the environment.
_PERSISTENT_MARKERS = (
    "version mismatch",          # e.g. libtpu client/terminal skew
    "must use the same",         # companion text of the version-mismatch error
    "unimplemented",
    "not implemented",
    "invalid_argument",
    "out of memory",
    "resource_exhausted: error allocating",
)

# Error classes worth retrying: transient worker/transport failures.
_TRANSIENT_MARKERS = (
    "unavailable",
    "crashed or restarted",
    "socket closed",
    "connection reset",
    "deadline_exceeded",
    "heartbeat",
    "failed_precondition",  # generic runtime hiccups — unless persistent above
)


# The worker process itself died: device buffers are gone, so re-dispatching
# a program over the SAME operand buffers cannot succeed — only a layer that
# re-uploads its operands (Alignment._with_engine_retries) can recover.
_RESTART_MARKERS = ("crashed or restarted",)


def is_worker_restart(msg: str) -> bool:
    """True when a runtime error indicates the device worker restarted
    (transient for a full re-run, fatal for buffer-reusing retries)."""
    m = msg.lower()
    return any(r in m for r in _RESTART_MARKERS)


def is_transient_runtime_error(msg: str) -> bool:
    """True when a JaxRuntimeError message describes a transient failure.

    Persistent markers win: a libtpu version mismatch surfaces as
    FAILED_PRECONDITION but retrying it burns ``retries x backoff`` for
    nothing (seen in round 1's multichip artifact).
    """
    m = msg.lower()
    if any(p in m for p in _PERSISTENT_MARKERS):
        return False
    return any(t in m for t in _TRANSIENT_MARKERS)


def with_retries(fn, retries: int = 2, backoff_s: float = 5.0,
                 on_retry=None):
    """Failure-detection wrapper for flaky accelerator runtimes.

    Some TPU deployments surface transient worker crashes/restarts as
    ``JaxRuntimeError`` (UNAVAILABLE / FAILED_PRECONDITION).  This retries the
    callable after a short backoff — the persistent compile cache makes the
    retry cheap.  The reference has no failure handling at all (a dead worker
    hangs its process pool, SURVEY.md section 5).

    ``on_retry``: optional zero-arg callback invoked before each retry —
    e.g. ``utils.devcache.clear`` so a re-run re-uploads operands whose
    device buffers died with the crashed worker.
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
                if not is_transient_runtime_error(msg) or attempt == retries:
                    raise
                last = exc
                logger.warning(
                    "transient TPU runtime error (attempt %d/%d): %s",
                    attempt + 1, retries, msg.splitlines()[0])
                time.sleep(backoff_s)
                if on_retry is not None:
                    on_retry()
        raise last  # unreachable

    return wrapped
