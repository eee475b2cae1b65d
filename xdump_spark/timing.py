"""Verbosity + per-action timing logging.

The reference logs each generated query at verbosity 1 and its execution
time at verbosity 2, plus total dump/load wall time always
(reference: xdump/logging.py:10-21, xdump/base.py:24-35,98,222). Same
surface here: ``configure(verbosity)`` maps 0/1/2 → WARNING/INFO/DEBUG and
``log_time`` wraps engine actions.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("xdump_spark")

_LEVELS = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}


def configure(verbosity: int = 0) -> None:
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
    logger.setLevel(_LEVELS.get(min(verbosity, 2), logging.DEBUG))


@contextlib.contextmanager
def log_time(label: str, level: int = logging.INFO):
    """Log wall time of the wrapped block: ``<label>: 1.234s``."""
    t0 = time.time()
    try:
        yield
    finally:
        logger.log(level, "%s: %.3fs", label, time.time() - t0)
