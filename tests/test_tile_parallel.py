"""Tile-parallel VAE: sharded tile batch == single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.models.vae.model import VaeConfig, ViTVAE, init_vae_params
from magi_tpu.parallel import mesh as mesh_lib
from magi_tpu.parallel.tile import pmap_tile_batch, replicate_vae_params
from magi_tpu.pipeline.video_process import tiled_decode, tiled_encode


@pytest.fixture(autouse=True)
def _clean_mesh():
    yield
    mesh_lib.destroy_mesh()


def make_vae():
    cfg = VaeConfig(
        video_size=32, video_length=8, patch_size=8, patch_length=4,
        embed_dim=64, depth=1, num_heads=4, qkv_bias=True, use_final_proj=True,
    )
    return ViTVAE(cfg, init_vae_params(cfg, seed=0))


def test_tile_parallel_encode_decode_matches(eight_devices):
    vae = make_vae()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 24, 32, 32)), jnp.float32)

    z_ref = tiled_encode(vae, x, tile_frames=8)
    y_ref = tiled_decode(vae, z_ref, tile_frames=8)

    mesh_lib.initialize_mesh(dp=8, devices=eight_devices)
    vae.params = replicate_vae_params(vae.params)
    z_par = tiled_encode(vae, x, tile_frames=8)
    y_par = tiled_decode(vae, z_par, tile_frames=8)

    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_par), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_par), atol=1e-5, rtol=1e-5)


def test_pad_to_device_multiple(eight_devices):
    mesh_lib.initialize_mesh(dp=8, devices=eight_devices)
    calls = {}

    def fn(b):
        calls["B"] = b.shape[0]
        return b * 2

    x = jnp.ones((3, 4))
    out = pmap_tile_batch(fn, x)
    assert calls["B"] == 8 and out.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((3, 4)))


def test_remainder_tiles_match_single_device(eight_devices):
    """T not a multiple of tile_frames: the remainder tile takes the
    unbatched path while full tiles shard across the mesh — the seam must
    be invisible (same values as the single-device walk)."""
    vae = make_vae()
    # 20 frames / tile 8 -> two full tiles + one 4-frame remainder
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 20, 32, 32)), jnp.float32)
    z_ref = tiled_encode(vae, x, tile_frames=8)
    y_ref = tiled_decode(vae, z_ref, tile_frames=8)

    mesh_lib.initialize_mesh(dp=8, devices=eight_devices)
    vae.params = replicate_vae_params(vae.params)
    z_par = tiled_encode(vae, x, tile_frames=8)
    y_par = tiled_decode(vae, z_par, tile_frames=8)
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_par), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_par), atol=1e-5, rtol=1e-5)


def test_tile_batch_larger_than_mesh(eight_devices):
    """More tiles than devices: pmap_tile_batch pads to the next device
    multiple and drops the pad — every real tile's result intact."""
    mesh_lib.initialize_mesh(dp=4, devices=eight_devices[:4])
    x = jnp.arange(9 * 6, dtype=jnp.float32).reshape(9, 6)  # 9 tiles on 4 devices
    seen = {}

    def fn(b):
        seen["B"] = b.shape[0]
        return b + 1.0

    out = pmap_tile_batch(fn, x)
    assert seen["B"] == 12 and out.shape == (9, 6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) + 1.0)


def test_batched_tiles_equal_per_tile_forward(eight_devices):
    """The batched ViT forward over stacked tiles == per-tile forwards
    (the reference loops tiles through the model one by one,
    ref: tile_parallel.py:290-308; batching must not change values)."""
    vae = make_vae()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 3, 24, 32, 32)), jnp.float32)
    per_tile = jnp.concatenate(
        [vae.encode(x[:, :, a : a + 8]) for a in (0, 8, 16)], axis=2
    )
    batched = tiled_encode(vae, x, tile_frames=8)
    np.testing.assert_allclose(np.asarray(per_tile), np.asarray(batched), atol=1e-5, rtol=1e-5)
