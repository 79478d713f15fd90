"""Fused producer + int8 row-quant kernel (ops/act_quant) vs the unfused
op chain it replaces — must match exactly (same op/rounding order)."""

import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.ops.act_quant import rowquant_fused, rowquant_fused_reference


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def check(x, mode, ln_w=None, ln_b=None, eps=1e-6):
    q, s = rowquant_fused(x, mode, ln_w, ln_b, eps=eps, interpret=True)
    q_ref, s_ref = rowquant_fused_reference(x, mode, ln_w, ln_b, eps=eps)
    assert q.shape == q_ref.shape and s.shape == s_ref.shape
    if mode == "swiglu":
        # interpret-mode caveat: XLA:CPU's excess-precision rules elide the
        # f32->bf16 rounding of the silu*up product even through the VMEM
        # scratch, so the kernel's row max (and hence scale) sits within one
        # bf16 ulp of the reference's.  On Mosaic the scratch store rounds
        # physically.  Compare within quant noise.
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=2 ** -8)
        dq = np.asarray(q, np.int32) - np.asarray(q_ref, np.int32)
        assert np.abs(dq).max() <= 1, np.abs(dq).max()
        deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
        deq_ref = np.asarray(q_ref, np.float32) * np.asarray(s_ref)[:, None]
        np.testing.assert_allclose(deq, deq_ref, atol=1.5 * float(np.max(s_ref)))
    else:
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
        # identical op order; XLA may fuse x/scale as x*(1/scale), so allow
        # ±1 quantum on round-half ties (observed 0.013% of elements)
        dq = np.asarray(q, np.int32) - np.asarray(q_ref, np.int32)
        assert np.abs(dq).max() <= 1, np.abs(dq).max()
        assert (dq != 0).mean() < 1e-3, (dq != 0).mean()


def test_plain(rng):
    x = jnp.asarray(rng.normal(size=(300, 256)) * 3, jnp.bfloat16)
    check(x, "plain")


def test_plain_zero_rows(rng):
    x = jnp.asarray(rng.normal(size=(256, 128)), jnp.bfloat16)
    x = x.at[7].set(0.0)  # all-zero row -> scale 1.0, q 0
    q, s = rowquant_fused(x, "plain", interpret=True)
    assert float(s[7]) == 1.0 and int(np.abs(np.asarray(q[7])).max()) == 0
    check(x, "plain")


def test_ln(rng):
    D = 256
    x = jnp.asarray(rng.normal(size=(300, D)) * 2, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(D,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    check(x, "ln", w, b)


def test_swiglu(rng):
    d = 2048
    x = jnp.asarray(rng.normal(size=(130, 2 * d)), jnp.bfloat16)
    check(x, "swiglu")


def test_swiglu_multi_chunk(rng):
    d = 4096  # two width chunks
    x = jnp.asarray(rng.normal(size=(64, 2 * d)), jnp.bfloat16)
    check(x, "swiglu")


def test_model_linears_shared_fused_equals_unfused(rng):
    """_linears_shared with pre= must give identical results whether the
    producer is fused (int8 + pallas interpret path not reachable on CPU —
    covered by the kernel tests above) or applied unfused: here we pin the
    CPU/XLA routing — bf16 weights, int8 weights, and the traced-act_ok
    legacy path all apply `pre` exactly once."""
    import jax

    from magi_tpu.models.dit.model import _apply_pre, _linears_shared, layer_norm
    from magi_tpu.ops.quant import quantize_int8

    D, N, S = 128, 64, 40
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(D, N)) * 0.1, jnp.bfloat16)
    lnp = {
        "weight": jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32),
        "bias": jnp.zeros((D,), jnp.float32),
    }
    pre = ("ln", lnp)
    # bf16 weights
    (got,) = _linears_shared(x, [{"weight": w}], False, pre=pre, eps=1e-6)
    want = layer_norm(x, lnp, 1e-6) @ w
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-2, rtol=1e-2
    )
    # int8 weights, static act_ok both ways
    q8, sc = quantize_int8(w)
    plist = [{"weight_q": q8, "weight_scale": sc}]
    for ok in (True, False):
        (got_i8,) = _linears_shared(x, plist, ok, pre=pre, eps=1e-6)
        assert got_i8.shape == want.shape
        rel = np.abs(np.asarray(got_i8, np.float32) - np.asarray(want, np.float32))
        assert rel.mean() / (np.abs(np.asarray(want, np.float32)).mean() + 1e-9) < 0.05
    # traced act_ok (legacy cond path)
    (got_tr,) = jax.jit(
        lambda xx, ok: _linears_shared(xx, plist, ok, pre=pre, eps=1e-6)
    )(x, jnp.bool_(True))
    rel = np.abs(np.asarray(got_tr, np.float32) - np.asarray(want, np.float32))
    assert rel.mean() / (np.abs(np.asarray(want, np.float32)).mean() + 1e-9) < 0.05
