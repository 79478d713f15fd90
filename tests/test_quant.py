"""Quantized matmul kernel (TPU-native N3 analog) tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magi_tpu.ops.quant import (
    act_quant_rowwise,
    quantize_int8,
    quantize_params_int8,
    quantized_matmul,
    quantized_matmul_i8,
    quantized_matmul_i8_reference,
    quantized_matmul_reference,
)

QMM = functools.partial(quantized_matmul, interpret=True, block_m=128, block_k=128, block_n=128)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    q, s = quantize_int8(w)
    deq = q.astype(jnp.float32) * s[None]
    # per-channel int8: relative error bounded by ~amax/127 per channel
    amax = np.abs(np.asarray(w)).max(0)
    assert (np.abs(np.asarray(deq - w)) <= amax / 127.0 + 1e-6).all()


def test_quantized_matmul_matches_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(130, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 200)), jnp.float32)
    q, s = quantize_int8(w)
    got = QMM(x, q, s)
    want = quantized_matmul_reference(x, q, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3)


def test_quantized_matmul_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(128, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)
    q, s = quantize_int8(w)
    got = QMM(x, q, s)
    want = quantized_matmul_reference(x, q, s)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=5e-2, rtol=5e-2
    )


def test_act_quant_rowwise():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 96)) * rng.uniform(0.1, 10, size=(64, 1)), jnp.float32)
    xq, rs = act_quant_rowwise(x)
    deq = xq.astype(np.float32) * np.asarray(rs)[:, None]
    amax = np.abs(np.asarray(x)).max(1, keepdims=True)
    assert (np.abs(deq - np.asarray(x)) <= amax / 127.0 + 1e-6).all()


def test_quantized_matmul_i8_matches_reference():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(130, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 200)), jnp.float32)
    wq, ws = quantize_int8(w)
    xq, rs = act_quant_rowwise(x)
    got = quantized_matmul_i8(
        xq, rs, wq, ws, out_dtype=jnp.float32, interpret=True,
        block_m=128, block_k=128, block_n=128,
    )
    want = quantized_matmul_i8_reference(xq, rs, wq, ws, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3)
    # and the int8 x int8 product approximates the fp matmul
    fp = np.asarray(x) @ np.asarray(w)
    rel = np.abs(np.asarray(want) - fp).max() / np.abs(fp).max()
    assert rel < 0.05, rel


def test_quantize_params_tree():
    from magi_tpu.models.dit.model import init_dit_params
    from tests.tiny import tiny_config

    cfg = tiny_config()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params_int8(params)
    fc1 = qp["blocks"]["mlp"]["linear_fc1"]
    assert "weight_q" in fc1 and fc1["weight_q"].dtype == jnp.int8
    assert fc1["weight_scale"].shape == (cfg.model_config.num_layers, cfg.model_config.ffn_hidden_size)
    # non-quantized leaves untouched
    assert "weight" in qp["blocks"]["ada_modulate_layer"]["proj"]["0"]


def test_quantized_edge_layers_stay_bf16():
    """First/last layers run FULL bf16 (weights and activations) on the
    quantized path (ref first/last-layer policy, dit_module.py:407): with a
    2-layer model every layer is an edge layer, so the quantized walk must
    be IDENTICAL to the bf16 walk."""
    import jax

    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.sampling.transport import ArdfSampler
    from tests.test_transport import make_input
    from tests.tiny import tiny_config

    cfg_a = tiny_config()
    cfg_a.model_config.num_layers = 2
    cfg_b = tiny_config()
    cfg_b.model_config.num_layers = 2
    params = init_dit_params(jax.random.PRNGKey(0), cfg_a)
    qp = quantize_params_int8(params)
    assert "blocks_edge" in qp
    assert qp["blocks_edge"]["first"]["mlp"]["linear_fc1"]["weight"].shape == (
        cfg_a.model_config.hidden_size,
        cfg_a.model_config.ffn_hidden_size,
    )
    ref = [c for _, c in ArdfSampler(cfg_a, params, make_input(cfg_a, 2), jax.random.PRNGKey(7)).walk()]
    got = [c for _, c in ArdfSampler(cfg_b, qp, make_input(cfg_b, 2), jax.random.PRNGKey(7)).walk()]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_model_forward_close_to_fp():
    """Full DiT walk with int8-quantized weights stays close to the fp
    walk (weight-only quantization error bound)."""
    import jax

    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.sampling.transport import ArdfSampler
    from tests.test_transport import make_input
    from tests.tiny import tiny_config

    cfg_a = tiny_config()
    cfg_b = tiny_config()  # separate object -> separate jit cache entry
    inp = make_input(cfg_a, 2)
    params = init_dit_params(jax.random.PRNGKey(0), cfg_a)
    ref = [c for _, c in ArdfSampler(cfg_a, params, inp, jax.random.PRNGKey(7)).walk()]
    qparams = quantize_params_int8(params)
    got = [c for _, c in ArdfSampler(cfg_b, qparams, make_input(cfg_b, 2), jax.random.PRNGKey(7)).walk()]
    for a, b in zip(ref, got):
        err = np.abs(a - b).max()
        assert np.isfinite(b).all()
        assert err < 0.6, err  # random-weight tiny model; loose sanity bound


def test_int4_pack_unpack_roundtrip():
    from magi_tpu.ops.quant import quantize_int4, unpack_int4

    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)
    packed, scale = quantize_int4(w)
    assert packed.dtype == jnp.uint8 and packed.shape == (32, 48)
    q = unpack_int4(packed)
    assert q.dtype == jnp.int8 and q.shape == (64, 48)
    assert int(jnp.abs(q).max()) <= 7
    deq = q.astype(np.float32) * np.asarray(scale)[None]
    amax = np.abs(np.asarray(w)).max(0)
    assert (np.abs(deq - np.asarray(w)) <= amax / 7.0 + 1e-6).all()
    # bf16 ride-through (pp layer-FSDP gathers int leaves as bf16) is exact
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(packed.astype(jnp.bfloat16))), np.asarray(q)
    )


def test_int4_model_walk_close_to_fp():
    """w4a8 walk (nibble-packed weights, int8 activations) stays close to
    the fp walk; edge layers bf16-exact."""
    import jax

    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.ops.quant import quantize_params_int4
    from magi_tpu.sampling.transport import ArdfSampler
    from tests.test_transport import make_input
    from tests.tiny import tiny_config

    cfg_a = tiny_config(model={"num_layers": 4})
    cfg_b = tiny_config(model={"num_layers": 4})
    params = init_dit_params(jax.random.PRNGKey(0), cfg_a)
    ref = [c for _, c in ArdfSampler(cfg_a, params, make_input(cfg_a, 2), jax.random.PRNGKey(7)).walk()]
    qp = quantize_params_int4(params)
    assert "weight_q4" in qp["blocks"]["mlp"]["linear_fc1"]
    got = [c for _, c in ArdfSampler(cfg_b, qp, make_input(cfg_b, 2), jax.random.PRNGKey(7)).walk()]
    for a, b in zip(ref, got):
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 1.0  # int4 random-weight sanity bound


def test_int4_direct_zero_init_runs():
    """quant_bits=4 init builds the quantized tree WITHOUT materializing
    bf16 weights, and the model runs on it (the single-chip 24B path)."""
    import jax

    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.sampling.transport import ArdfSampler
    from tests.test_transport import make_input
    from tests.tiny import tiny_config

    cfg = tiny_config()
    params = init_dit_params(jax.random.PRNGKey(0), cfg, zeros=True, quant_bits=4)
    assert "weight_q4" in params["blocks"]["mlp"]["linear_fc1"]
    assert "blocks_edge" in params
    out = [c for _, c in ArdfSampler(cfg, params, make_input(cfg, 2), jax.random.PRNGKey(7)).walk()]
    assert len(out) == 2 and all(np.isfinite(np.asarray(c)).all() for c in out)


def test_smooth_quant_beats_plain_int8_on_outliers():
    """The smooth-quant fold (act_smooth trees from fp8 checkpoints):
    y = (x/s) @ int8(s*W) must beat plain per-row int8 when activation
    channels carry outliers — the regime smooth-quant exists for
    (ref: PerChannelQuantizedFp8Linear, dit_module.py:462-487)."""
    from magi_tpu.models.dit.model import _linears_shared
    from magi_tpu.ops.quant import _quantize_stacked, _quantize_stacked_smooth

    rng = np.random.default_rng(11)
    L, k, n, m = 2, 256, 192, 64
    w = jnp.asarray(rng.normal(0, 0.02, (L, k, n)), jnp.float32)
    x = rng.normal(size=(m, k)).astype(np.float32)
    hot = rng.choice(k, size=8, replace=False)
    x[:, hot] *= rng.uniform(30, 80, size=8).astype(np.float32)
    # alpha=0.5 smooth-quant factors — act_amax^a / w_amax^(1-a), the
    # balance real calibrations ship (full alpha=1 over-shifts the outliers
    # into the weight's per-out-channel scales and loses)
    act_amax = np.abs(x).max(0) + 1e-12
    w_amax = np.abs(np.asarray(w[0])).max(1) + 1e-12
    s_np = np.sqrt(act_amax) / np.sqrt(w_amax)
    s_np /= np.median(s_np)
    x = jnp.asarray(x)
    s = jnp.maximum(jnp.asarray(s_np, jnp.float32), 1e-3)[None].repeat(L, 0)

    exact = np.asarray(x) @ np.asarray(w[0])

    qp, sc = _quantize_stacked(w)
    (y_plain,) = _linears_shared(x, [{"weight_q": qp[0], "weight_scale": sc[0]}], True)
    qs, scs = _quantize_stacked_smooth(w, s)
    (y_smooth,) = _linears_shared(
        x, [{"weight_q": qs[0], "weight_scale": scs[0], "act_smooth": s[0]}], True
    )

    def rel(y):
        return np.linalg.norm(np.asarray(y, np.float32) - exact) / np.linalg.norm(exact)

    assert rel(y_smooth) < rel(y_plain), (rel(y_smooth), rel(y_plain))
    assert rel(y_smooth) < 0.05


def test_smooth_quant_int4_fold():
    """int4 variant of the smooth fold (w4a8 on fp8 checkpoints)."""
    from magi_tpu.models.dit.model import _linears_shared
    from magi_tpu.ops.quant import _quantize_stacked4_smooth

    rng = np.random.default_rng(12)
    L, k, n, m = 2, 128, 64, 32
    w = jnp.asarray(rng.normal(0, 0.02, (L, k, n)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 2.0, (L, k)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    q4, sc = _quantize_stacked4_smooth(w, s)
    (y,) = _linears_shared(
        x, [{"weight_q4": q4[0], "weight_scale": sc[0], "act_smooth": s[0]}], True
    )
    exact = np.asarray(x) @ np.asarray(w[0])
    rel = np.linalg.norm(np.asarray(y, np.float32) - exact) / np.linalg.norm(exact)
    assert rel < 0.2  # int4 resolution


def test_fit_block_m_divides_aligned_rows():
    """128-aligned m gets a dividing block (no pad -> no padded-output +
    full-size-slice pair in HBM: the 24B-720p OOM, 2x5.3GB at fc1);
    non-aligned m keeps the padded path (program stability)."""
    from magi_tpu.ops.quant import _fit_block_m

    assert _fit_block_m(86400, 512) == 384      # 24B-720p w4 token count
    assert _fit_block_m(9216, 512) == 512       # already dividing: unchanged
    assert _fit_block_m(5400, 512) == 512       # 4.5B (8- not 128-aligned)
    assert _fit_block_m(128 * 7919, 512) == 128 # prime multiple: falls to 128
    assert _fit_block_m(64, 128) == 128         # post-min() sub-block m: kept


def test_quantized_matmul_aligned_rows_no_pad():
    """m=384 with the default block_m=512 takes the dividing-block path;
    result still matches the reference."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(384, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    wq, ws = quantize_int8(w)
    got = quantized_matmul(x, wq, ws, interpret=True, block_m=512,
                           block_k=128, block_n=128)
    want = quantized_matmul_reference(x, wq, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
