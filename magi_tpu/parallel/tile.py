"""Tile-parallel VAE execution (ref: inference/infra/parallelism/
tile_parallel.py).

The reference splits the 3D tile grid across ranks with size-sorted
round-robin assignment, all-gathers frames with shape negotiation, and
cross-fade-blends overlaps (ref: tile_parallel.py:26-448).  TPU-native:
tiles are already *batched* through one ViT forward (models/vae); under a
mesh we simply shard that tile batch across every device — the mesh IS the
round-robin, the all-gather is the unshard, and XLA handles both.
MAGI's ViTVAE disables spatial tiling and uses temporal overlap 0
(ref: vae_model.py:331-333), so no blend pass is needed; equal-size tiles
by construction make the load balance exact.

The reference's GENERIC capability — spatial+temporal tile grids with
linear cross-fade overlap blending for tokenizers that DO allow spatial
tiling (ref: TileProcessor + blend_t/v/h, tile_parallel.py:181-448) —
lives in `magi_tpu/pipeline/tiling.py` (`tiled_process_3d`), reached via
`tiled_encode` when `vae.allow_spatial_tiling` is set.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from magi_tpu.core.utils import cdiv
from magi_tpu.parallel.mesh import get_mesh, mesh_is_trivial

_ALL_AXES = ("dp", "pp", "cp", "tp")


def replicate_vae_params(params: dict, mesh=None) -> dict:
    mesh = mesh or get_mesh()
    if mesh_is_trivial(mesh):
        return params
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), params)


def pmap_tile_batch(fn: Callable, batch: jnp.ndarray) -> jnp.ndarray:
    """Run `fn` over a tile batch sharded across the whole mesh.

    Pads the batch to a multiple of the device count (padded results are
    dropped), constrains the batch axis to all mesh axes, and lets XLA
    data-parallelize the (replicated-weight) VAE forward."""
    mesh = get_mesh()
    if mesh_is_trivial(mesh):
        return fn(batch)
    n_dev = mesh.devices.size
    B = batch.shape[0]
    Bp = cdiv(B, n_dev) * n_dev
    if Bp != B:
        pad = jnp.broadcast_to(batch[:1], (Bp - B,) + batch.shape[1:])
        batch = jnp.concatenate([batch, pad], axis=0)
    batch = jax.device_put(batch, NamedSharding(mesh, P(_ALL_AXES)))
    out = fn(batch)
    return out[:B]
