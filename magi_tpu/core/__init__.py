from magi_tpu.core.config import EngineConfig, MagiConfig, ModelConfig, RuntimeConfig
from magi_tpu.core.dataclasses import SegmentAttnSpec, ForwardMeta
from magi_tpu.core.logger import magi_logger, print_rank_0
from magi_tpu.core.timer import EventPathTimer, event_path_timer
from magi_tpu.core.utils import divide, env_is_true, set_random_seed

__all__ = [
    "MagiConfig",
    "ModelConfig",
    "RuntimeConfig",
    "EngineConfig",
    "SegmentAttnSpec",
    "ForwardMeta",
    "magi_logger",
    "print_rank_0",
    "EventPathTimer",
    "event_path_timer",
    "divide",
    "env_is_true",
    "set_random_seed",
]
