"""Observability: package logging, timing, and progress reporting.

The reference has no logging at all — only tqdm bars and stray prints
(SURVEY.md section 5).  This framework routes everything through the standard
``logging`` module (logger name ``euispice_coreg_tpu``) and a pluggable
progress callback, so pipelines can be monitored in production without
stdout scraping.
"""
from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("euispice_coreg_tpu")


def enable_console_logging(level=logging.INFO):
    """Attach a simple console handler (idempotent)."""
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(handler)
    logger.setLevel(level)


@contextlib.contextmanager
def timed(label: str, level=logging.INFO):
    """Log the wall-clock of a block: ``with timed('submap'): ...``"""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.log(level, "%s: %.3f s", label, time.perf_counter() - t0)


class Progress:
    """Minimal progress reporter: logs every ``every`` steps (and at the
    end), or delegates to a user callback ``cb(done, total, label)``."""

    def __init__(self, total: int, label: str = "", every: int | None = None,
                 cb=None, enabled: bool = True):
        self.total = total
        self.label = label
        self.every = every or max(1, total // 10)
        self.cb = cb
        self.enabled = enabled
        self.done = 0
        self._t0 = time.perf_counter()

    def step(self, n: int = 1):
        self.done += n
        if not self.enabled:
            return
        if self.cb is not None:
            self.cb(self.done, self.total, self.label)
        elif self.done % self.every == 0 or self.done == self.total:
            dt = time.perf_counter() - self._t0
            rate = self.done / dt if dt > 0 else 0.0
            logger.info("%s: %d/%d (%.1f/s)", self.label, self.done,
                        self.total, rate)
