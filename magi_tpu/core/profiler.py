"""Profiling / observability (SURVEY.md §5.1 — the reference has only an
event timer; we add the TPU-native equivalents: xplane traces + device
memory stats).

Env flags:
  MAGI_PROFILE_DIR=/path   capture a jax.profiler trace of the walk
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

from magi_tpu.core.logger import magi_logger


@contextlib.contextmanager
def maybe_trace(label: str) -> Iterator[None]:
    """jax.profiler trace if MAGI_PROFILE_DIR is set; no-op otherwise."""
    trace_dir = os.environ.get("MAGI_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    path = os.path.join(trace_dir, label)
    magi_logger.info(f"profiling -> {path}")
    with jax.profiler.trace(path):
        yield


def device_memory_stats() -> Optional[dict]:
    """Peak/in-use device memory (analog of the reference's
    torch.cuda.max_memory_allocated reporting, ref: pipeline.py:59-63)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return None
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    except Exception:
        return None


def log_memory(prefix: str) -> None:
    stats = device_memory_stats()
    if stats and stats.get("peak_bytes_in_use"):
        gb = 1024**3
        magi_logger.info(
            f"{prefix}: device memory in use "
            f"{(stats['bytes_in_use'] or 0) / gb:.2f} GB, "
            f"peak {(stats['peak_bytes_in_use'] or 0) / gb:.2f} GB"
        )
