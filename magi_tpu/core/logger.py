"""Singleton logger with process-0 gating (ref: inference/common/logger.py:20-51).

On TPU/JAX the analog of "rank" is `jax.process_index()` for multi-host; in
single-process (even multi-chip) runs everything is process 0.
"""

from __future__ import annotations

import logging
import os
import sys


class GlobalLogger:
    _logger = None

    @classmethod
    def get_logger(cls) -> logging.Logger:
        if cls._logger is None:
            logger = logging.getLogger("magi_tpu")
            level = os.getenv("MAGI_LOG_LEVEL", "INFO").upper()
            logger.setLevel(level)
            if not logger.handlers:
                handler = logging.StreamHandler(sys.stdout)
                handler.setFormatter(
                    logging.Formatter("[%(asctime)s][%(levelname)s][magi_tpu] %(message)s", "%H:%M:%S")
                )
                logger.addHandler(handler)
            logger.propagate = False
            cls._logger = logger
        return cls._logger


magi_logger = GlobalLogger.get_logger()


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def print_per_process(message: str) -> None:
    magi_logger.info(f"[process {_process_index()}] {message}")


def print_rank_0(message) -> None:
    """Log only on process 0 (ref: logger.py:45-51)."""
    if _process_index() == 0:
        magi_logger.info(message)
