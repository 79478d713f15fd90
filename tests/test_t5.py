"""T5 encoder parity: our JAX encoder vs HF torch T5EncoderModel with the
SAME (random) weights — validates math and the weight converter."""

import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.models.t5.model import (
    T5Config,
    clean_caption,
    convert_hf_t5_state,
    init_t5_params,
    t5_encoder_forward,
    text_preprocessing,
)


def test_parity_with_hf_torch():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.T5Config(
        vocab_size=100,
        d_model=32,
        d_kv=8,
        num_heads=4,
        d_ff=64,
        num_layers=3,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
    )
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(hf_cfg).eval()

    ids = np.array([[5, 9, 13, 2, 0, 0], [7, 7, 7, 7, 7, 1]], np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int64)
    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    cfg = T5Config.from_hf_config(hf_cfg.to_dict())
    params = convert_hf_t5_state(dict(model.state_dict()), cfg, dtype=jnp.float32)
    got = np.asarray(
        t5_encoder_forward(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_random_init_forward():
    cfg = T5Config(
        vocab_size=50, d_model=16, d_kv=4, num_heads=4, d_ff=32, num_layers=2, rel_buckets=8, rel_max_distance=16
    )
    params = init_t5_params(cfg)
    ids = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0]], jnp.int32)
    out = t5_encoder_forward(params, cfg, ids, mask)
    assert out.shape == (1, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_clean_caption():
    assert clean_caption("Hello <person> visit https://example.com NOW!!") == "hello person visit now!"
    assert clean_caption("a   b  c") == "a b c"
    assert text_preprocessing("MiXeD CaSe", enabled=False) == "mixed case"
