"""Event-path timer (ref: inference/common/timer.py:22-85).

`synced_record` blocks on outstanding device work
(`jax.block_until_ready` is unnecessary here: we insert a trivial device
barrier via `jax.device_put(0).block_until_ready()`-style sync only when a
device is present) then logs the wall-clock delta since the previous event.
"""

from __future__ import annotations

import time
from typing import Optional

from magi_tpu.core.logger import magi_logger


def _device_sync() -> None:
    try:
        import jax
        import jax.numpy as jnp

        jnp.zeros(()).block_until_ready()
    except Exception:
        pass


class EventPathTimer:
    def __init__(self) -> None:
        self.prev_name: Optional[str] = None
        self.prev_time: Optional[float] = None

    def reset(self) -> None:
        self.prev_name = None
        self.prev_time = None

    def record(self, name: str) -> None:
        now = time.perf_counter()
        if self.prev_name is not None:
            magi_logger.info(f"Elapsed {(now - self.prev_time) * 1000:.1f} ms: [{self.prev_name}] -> [{name}]")
        self.prev_name, self.prev_time = name, now

    def synced_record(self, name: str) -> None:
        _device_sync()
        self.record(name)


_global_timer = EventPathTimer()


def event_path_timer() -> EventPathTimer:
    return _global_timer
