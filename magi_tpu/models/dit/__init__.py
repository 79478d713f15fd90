from magi_tpu.models.dit.model import (
    dit_forward,
    init_dit_params,
    init_kv_cache,
    kv_cache_shape,
)

__all__ = ["dit_forward", "init_dit_params", "init_kv_cache", "kv_cache_shape"]
