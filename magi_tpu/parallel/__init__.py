from magi_tpu.parallel.tile import pmap_tile_batch, replicate_vae_params
from magi_tpu.parallel.mesh import (
    build_mesh,
    destroy_mesh,
    get_mesh,
    initialize_mesh,
    set_mesh,
    shard_dit_params,
    shard_kv_cache,
)

__all__ = [
    "build_mesh",
    "initialize_mesh",
    "destroy_mesh",
    "get_mesh",
    "set_mesh",
    "shard_dit_params",
    "shard_kv_cache",
    "pmap_tile_batch",
    "replicate_vae_params",
]
