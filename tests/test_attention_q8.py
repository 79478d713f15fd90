"""Int8 segmented attention (ops/attention_q8) — interpret mode.

The q8 kernel is a beyond-parity option (the reference keeps attention
bf16, dit_module.py:431-487); tolerances here are int8-quantization
tolerances, not exact-math ones.  The kernel-vs-dequant-reference check
isolates the kernel's own approximation (p requantization) from the kv
quantization error.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.ops.attention import segmented_attention_two_source_reference
from magi_tpu.ops.attention_q8 import (
    quantize_kv_per_token,
    segmented_attention_two_source_q8,
    segmented_attention_two_source_q8_reference,
)


def run(rng, n_seg, seg_len, kv1_len, kv2_len, hq, hk, hd, r1, r2,
        block=128, q_prologue=None, q=None, scheme=None):
    S = n_seg * seg_len
    if q is None:
        q = jnp.asarray(rng.standard_normal((S, hq, hd)), jnp.bfloat16)
    kv1f = jnp.asarray(rng.standard_normal((2, hk, kv1_len, hd)), jnp.bfloat16)
    kv2f = jnp.asarray(rng.standard_normal((2, hk, kv2_len, hd)), jnp.bfloat16)
    kv1, sc1 = quantize_kv_per_token(kv1f)
    kv2, sc2 = quantize_kv_per_token(kv2f)
    r1s = jnp.asarray([a for a, _ in r1], jnp.int32)
    r1e = jnp.asarray([b for _, b in r1], jnp.int32)
    r2s = jnp.asarray([a for a, _ in r2], jnp.int32)
    r2e = jnp.asarray([b for _, b in r2], jnp.int32)
    got = segmented_attention_two_source_q8(
        q, kv1, sc1, kv2, sc2, r1s, r1e, r2s, r2e, seg_len=seg_len,
        interpret=True, block_q=block, block_k=block, q_prologue=q_prologue,
        scheme=scheme,
    )
    want = segmented_attention_two_source_q8_reference(
        q if q_prologue is None else _apply_prologue(q, q_prologue),
        kv1, sc1, kv2, sc2, r1s, r1e, r2s, r2e, seg_len=seg_len,
    )
    full = segmented_attention_two_source_reference(
        q if q_prologue is None else _apply_prologue(q, q_prologue),
        kv1f, kv2f, r1s, r1e, r2s, r2e, seg_len=seg_len,
    )
    return (np.asarray(got, np.float32), np.asarray(want, np.float32),
            np.asarray(full, np.float32))


def _apply_prologue(q, pro):
    """fp32 q-layernorm (+rotary) matching the kernel's fused prologue."""
    w, b, sin, cos, eps = pro
    qf = q.astype(jnp.float32)
    mean = jnp.mean(qf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(qf - mean), axis=-1, keepdims=True)
    qn = (qf - mean) * jnp.sqrt(1.0 / (var + eps))
    qn = qn * w[None, None, :] + b[None, None, :]
    if sin is not None:
        rot = sin.shape[-1]
        s_, c_ = sin[:, None, :], cos[:, None, :]
        x1, x2, tail = qn[..., :rot], qn[..., rot:2 * rot], qn[..., 2 * rot:]
        qn = jnp.concatenate([x1 * c_ - x2 * s_, x1 * s_ + x2 * c_, tail], -1)
    return qn.astype(q.dtype)


def check(got, want, full, tol=0.04):
    # kernel vs dequant reference: p-requant error only
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < tol, f"kernel-vs-dequant mean rel err {rel}"
    # vs full precision: + kv quant error (random data is worst case)
    rel_full = np.abs(got - full).mean() / (np.abs(full).mean() + 1e-9)
    assert rel_full < 2 * tol, f"vs-full mean rel err {rel_full}"


@pytest.mark.parametrize("scheme", ["sage", "qk8", "dq"])
def test_basic_two_source(rng, scheme):
    got, want, full = run(
        rng, 3, 128, 256, 384, 4, 2, 128,
        r1=[(0, 256), (0, 200), (100, 100)],   # incl. empty cache range
        r2=[(0, 128), (0, 256), (0, 384)], scheme=scheme,
    )
    check(got, want, full)


@pytest.mark.parametrize("scheme", ["sage", "qk8", "dq"])
def test_empty_ranges_mid_tile(rng, scheme):
    # fully-masked-tile regression (p must be zeroed, not uniform)
    got, want, full = run(
        rng, 2, 128, 256, 256, 4, 2, 128,
        r1=[(200, 200), (0, 256)], r2=[(0, 256), (70, 70)], scheme=scheme,
    )
    check(got, want, full)


@pytest.mark.parametrize("scheme", ["sage", "qk8", "dq"])
def test_gqa_fold(rng, scheme):
    got, want, full = run(
        rng, 2, 128, 256, 256, 8, 2, 128,
        r1=[(0, 256), (64, 192)], r2=[(0, 128), (0, 256)], scheme=scheme,
    )
    check(got, want, full)


@pytest.mark.parametrize("scheme", ["sage", "qk8", "dq"])
def test_fused_q_prologue(rng, scheme):
    hd, rot, S = 128, 32, 2 * 128
    w = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(hd) * 0.05, jnp.float32)
    ang = jnp.asarray(rng.standard_normal((S, rot)), jnp.float32)
    pro = (w, b, jnp.sin(ang), jnp.cos(ang), 1e-6)
    got, want, full = run(
        rng, 2, 128, 256, 256, 4, 2, hd,
        r1=[(0, 256), (0, 128)], r2=[(0, 128), (0, 256)],
        q_prologue=pro, scheme=scheme,
    )
    check(got, want, full)


def test_quantize_kv_roundtrip(rng):
    kv = jnp.asarray(rng.standard_normal((2, 3, 64, 32)) * 5.0, jnp.bfloat16)
    q8, sc = quantize_kv_per_token(kv)
    dq = np.asarray(q8, np.float32) * np.asarray(sc, np.float32)[..., None]
    err = np.abs(dq - np.asarray(kv, np.float32)).max(axis=-1)
    # per-token max error bounded by scale/2 (+ bf16 rounding slack)
    assert (err <= np.asarray(sc, np.float32) * 0.51 + 1e-3).all()


def test_zero_rows_quantize(rng):
    kv = jnp.zeros((2, 2, 32, 32), jnp.bfloat16)
    q8, sc = quantize_kv_per_token(kv)
    assert np.asarray(q8).max() == 0 and np.isfinite(np.asarray(sc)).all()


def test_attn_int8_walk_lockstep(monkeypatch):
    """MAGI_ATTN_INT8=1 walk tracks the bf16 walk within int8-attention
    noise on the tiny model (CPU carries the same kv quantization through
    the dequant reference path), and keys a separate jit-cache entry."""
    import jax

    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.sampling import transport
    from tests.test_transport import collect, make_input
    from tests.tiny import tiny_config

    cfg = tiny_config()
    chunks_ref, _ = collect(cfg, make_input(cfg, 2))

    monkeypatch.setenv("MAGI_ATTN_INT8", "1")
    cfg_q = tiny_config()
    key_q = transport._config_key(cfg_q)
    monkeypatch.delenv("MAGI_ATTN_INT8")
    assert transport._config_key(cfg_q) != key_q  # env participates in key
    monkeypatch.setenv("MAGI_ATTN_INT8", "1")

    chunks_q8, _ = collect(cfg_q, make_input(cfg_q, 2))
    assert len(chunks_q8) == len(chunks_ref) == 2
    for (ia, la), (ib, lb) in zip(chunks_ref, chunks_q8):
        assert ia == ib
        a, b = np.asarray(la, np.float32), np.asarray(lb, np.float32)
        assert np.isfinite(b).all()
        # int8 kv error accumulates over 8 denoise steps x 2 layers; the
        # walk must stay close, not bit-equal
        rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
        assert rel < 0.12, f"chunk {ia} diverged: mean rel {rel}"


def test_int8_stored_cache_equals_per_forward_quantize(monkeypatch):
    """The int8-STORED cache ({kv int8, scale f32}, quantized once at write)
    must walk BIT-IDENTICALLY to the bf16-cache-requantized-per-forward
    variant (MAGI_ATTN_INT8_STORE=0): quantization is deterministic on
    identical values, so storage is a pure memory/bandwidth optimization."""
    from magi_tpu.models.dit.model import init_kv_cache
    from tests.test_transport import collect, make_input
    from tests.tiny import tiny_config

    monkeypatch.setenv("MAGI_ATTN_INT8", "1")
    monkeypatch.setenv("MAGI_ATTN_INT8_STORE", "0")
    chunks_pf, s_pf = collect(tiny_config(), make_input(tiny_config(), 2))
    assert not isinstance(s_pf.cache, dict)

    monkeypatch.setenv("MAGI_ATTN_INT8_STORE", "1")
    chunks_st, s_st = collect(tiny_config(), make_input(tiny_config(), 2))
    assert isinstance(s_st.cache, dict)
    assert s_st.cache["kv"].dtype == jnp.int8
    assert s_st.cache["scale"].dtype == jnp.float32
    assert s_st.cache["kv"].shape[:-1] == s_st.cache["scale"].shape

    for (ia, la), (ib, lb) in zip(chunks_pf, chunks_st):
        assert ia == ib
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.parametrize("scheme", ["sage", "qk8", "dq"])
def test_norm_only_prologue(rng, scheme):
    """fused_norm WITHOUT rope (the cross-attention prologue shape)."""
    hd, S = 128, 2 * 128
    w = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(hd) * 0.05, jnp.float32)
    pro = (w, b, None, None, 1e-6)
    got, want, full = run(
        rng, 2, 128, 256, 256, 4, 2, hd,
        r1=[(0, 256), (0, 128)], r2=[(0, 128), (0, 256)],
        q_prologue=pro, scheme=scheme,
    )
    check(got, want, full)


def test_warm_step_variants_with_int8_store(monkeypatch):
    """bench.py warms every jit variant before the int8-attention walk;
    the warm chain must thread the DICT cache through donated step calls
    and rebuild pristine int8-stored state."""
    import jax

    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.sampling.transport import ArdfSampler
    from tests.test_transport import make_input
    from tests.tiny import tiny_config

    monkeypatch.setenv("MAGI_ATTN_INT8", "1")
    cfg = tiny_config()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    ref = [c for _, c in ArdfSampler(cfg, params, make_input(cfg, 2), jax.random.PRNGKey(7)).walk()]
    s = ArdfSampler(cfg, params, make_input(cfg, 2), jax.random.PRNGKey(7))
    n = s.warm_step_variants()
    assert n > 0 and isinstance(s.cache, dict)
    got = [c for _, c in s.walk()]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
