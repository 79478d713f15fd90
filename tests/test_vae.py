"""ViT-VAE: shape roundtrips, image special-case, posterior determinism,
pos-embed resize, and parity of the Conv3d-patchify reformulation against a
torch Conv3d on the same weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.models.vae.model import (
    VaeConfig,
    ViTVAE,
    gaussian_mode,
    init_vae_params,
    vae_rope,
)

CFG = VaeConfig(
    video_size=32,
    video_length=8,
    patch_size=8,
    patch_length=4,
    in_chans=3,
    z_chans=4,
    double_z=True,
    embed_dim=64,
    depth=2,
    num_heads=4,
    qkv_bias=True,
    with_cls_token=True,
    use_final_proj=True,  # tiny embed_dim < p*p*pt; non-proj path tested below
)
PARAMS = init_vae_params(CFG, seed=0)
VAE = ViTVAE(CFG, PARAMS)


def test_encode_decode_shapes():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 8, 32, 32)), jnp.float32)
    z = VAE.encode(x)
    assert z.shape == (2, 4, 2, 4, 4)  # 4x temporal, 8x spatial, z_chans
    y = VAE.decode(z)
    assert y.shape == (2, 3, 8, 32, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_single_image_special_case():
    # T==1 -> expand to 4 frames, keep 1 latent frame (ref: vae_model.py:270-279)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 1, 32, 32)), jnp.float32)
    z = VAE.encode(x)
    assert z.shape == (1, 4, 1, 4, 4)


def test_posterior_mode_deterministic():
    stats = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 2, 4, 4)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(gaussian_mode(stats)), np.asarray(stats[:, :4]))


def test_resolution_flexibility():
    # different H/W than training size -> trilinear pos-embed resize
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 3, 8, 64, 48)), jnp.float32)
    z = VAE.encode(x)
    assert z.shape == (1, 4, 2, 8, 6)
    y = VAE.decode(z)
    assert y.shape == (1, 3, 8, 64, 48)


def test_patchify_matches_torch_conv3d():
    """Our matmul patchify must equal Conv3d(stride=kernel) on identical
    weights (checkpoint-compat invariant)."""
    torch = pytest.importorskip("torch")
    from magi_tpu.models.vae.model import encoder_forward

    rng = np.random.default_rng(4)
    w = rng.normal(size=(CFG.embed_dim, 3, 4, 8, 8)).astype(np.float32)
    b = rng.normal(size=(CFG.embed_dim,)).astype(np.float32)
    x = rng.normal(size=(1, 3, 8, 32, 32)).astype(np.float32)

    conv = torch.nn.Conv3d(3, CFG.embed_dim, (4, 8, 8), stride=(4, 8, 8))
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
        want = conv(torch.from_numpy(x)).flatten(2).transpose(1, 2).numpy()  # [B, L, D]

    xp = jnp.asarray(x).reshape(1, 3, 2, 4, 4, 8, 4, 8)
    xp = xp.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(1, 2 * 4 * 4, 3 * 4 * 8 * 8)
    got = xp @ jnp.asarray(w.reshape(CFG.embed_dim, -1).T) + jnp.asarray(b)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_no_final_proj_decoder():
    # embed_dim >= p*p*pt so unpatch channels = embed//(p*p*pt) (ref: :646)
    cfg = VaeConfig(
        video_size=32, video_length=8, patch_size=4, patch_length=2,
        embed_dim=64, depth=1, num_heads=4, qkv_bias=True,
    )
    vae = ViTVAE(cfg, init_vae_params(cfg, seed=6))
    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 3, 8, 32, 32)), jnp.float32)
    y = vae.decode(vae.encode(x))
    assert y.shape == (1, 3, 8, 32, 32)


def test_rope_variant():
    cfg = VaeConfig(
        video_size=32, video_length=8, patch_size=8, patch_length=4,
        embed_dim=96, depth=1, num_heads=4, use_rope=True, ln_in_attn=True,
        qkv_bias=True, use_final_proj=True,
    )  # head_dim 24 divisible by 6 (3 axes x sin/cos), as use_rope requires
    vae = ViTVAE(cfg, init_vae_params(cfg, seed=5))
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 3, 8, 32, 32)), jnp.float32)
    z = vae.encode(x)
    assert np.isfinite(np.asarray(z)).all()
    sin, cos = vae_rope((2, 4, 4), 24)
    assert sin.shape == (32, 24)
