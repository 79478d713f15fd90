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
