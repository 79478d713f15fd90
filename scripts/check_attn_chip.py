"""On-chip numerical check of the Pallas kernels vs dense references —
small shapes, fast compile.  Validates Mosaic lowering (which interpret
mode cannot catch): the two segmented-attention kernels and the fused
gate-norm-residual epilogue kernel.

Usage: python scripts/check_attn_chip.py      (real TPU, ~3 min cold)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERP = os.environ.get("MAGI_CHECK_INTERPRET", "0") == "1"
if INTERP:  # CPU pre-flight: catches shape/trace errors without the relay
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

if INTERP:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")

from magi_tpu.ops.attention import (  # noqa: E402
    segmented_attention_two_source,
    segmented_attention_v2,
)


def dense_ref(q, k, v, kv_start, kv_end, seg_len):
    total_q, hq, hd = q.shape
    kv_len, hk, _ = k.shape
    rep = hq // hk
    kf = np.repeat(np.asarray(k, np.float32), rep, axis=1)
    vf = np.repeat(np.asarray(v, np.float32), rep, axis=1)
    qf = np.asarray(q, np.float32)
    out = np.zeros_like(qf)
    n_seg = total_q // seg_len
    for s in range(n_seg):
        lo, hi = int(kv_start[s]), int(kv_end[s])
        if hi <= lo:
            continue
        qs = qf[s * seg_len : (s + 1) * seg_len]  # [L, hq, hd]
        ks, vs = kf[lo:hi], vf[lo:hi]
        logits = np.einsum("lqd,mqd->qlm", qs, ks) * hd**-0.5
        w = np.exp(logits - logits.max(-1, keepdims=True))
        # the kernel computes p in bf16 before the pv matmul — mirror it
        w = np.asarray(jnp.asarray(w, jnp.bfloat16), np.float32)
        w /= w.sum(-1, keepdims=True)
        out[s * seg_len : (s + 1) * seg_len] = np.einsum(
            "qlm,mqd->lqd", w, vs
        )
    return out


def main():
    rng = np.random.default_rng(0)
    hq, hk, hd = 24, 8, 128
    seg_len = 512

    # --- v2 (single-source, e.g. cross-attn ranges incl. an EMPTY range) --
    n_seg, kv_len = 4, 1536
    q = jnp.asarray(rng.standard_normal((n_seg * seg_len, hq, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((kv_len, hk, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((kv_len, hk, hd)), jnp.bfloat16)
    kv_start = jnp.asarray([0, 384, 768, 0], jnp.int32)
    kv_end = jnp.asarray([300, 700, 768, 1536], jnp.int32)  # seg 2 EMPTY
    out = jax.jit(
        lambda *a: segmented_attention_v2(*a, seg_len=seg_len, interpret=INTERP)
    )(q, k, v, kv_start, kv_end)
    ref = dense_ref(q, k, v, np.asarray(kv_start), np.asarray(kv_end), seg_len)
    err = np.abs(np.asarray(out, np.float32) - ref).max()
    merr = np.abs(np.asarray(out, np.float32) - ref).mean()
    print(f"v2 max_err={err:.4f} mean_err={merr:.5f}")
    assert err < 0.1 and merr < 0.01, (err, merr)

    # --- two-source (cache + current, incl. empty cache range for seg 0) --
    kv1_len, kv2_len = 1024, 2048
    kv1 = jnp.asarray(
        rng.standard_normal((2, hk, kv1_len, hd)), jnp.bfloat16
    )
    kv2 = jnp.asarray(
        rng.standard_normal((2, hk, kv2_len, hd)), jnp.bfloat16
    )
    r1s = jnp.asarray([0, 0, 0, 512], jnp.int32)
    r1e = jnp.asarray([0, 1024, 512, 1024], jnp.int32)  # seg 0: EMPTY cache
    r2s = jnp.asarray([0, 0, 512, 0], jnp.int32)
    r2e = jnp.asarray([512, 1024, 1536, 2048], jnp.int32)
    out2 = jax.jit(
        lambda *a: segmented_attention_two_source(
            *a, seg_len=seg_len, interpret=INTERP
        )
    )(q, kv1, kv2, r1s, r1e, r2s, r2e)
    # dense ref over the concatenation [kv1 ; kv2]
    kcat = jnp.concatenate(
        [kv1[0].transpose(1, 0, 2), kv2[0].transpose(1, 0, 2)], axis=0
    )
    vcat = jnp.concatenate(
        [kv1[1].transpose(1, 0, 2), kv2[1].transpose(1, 0, 2)], axis=0
    )
    # per-seg two ranges -> emulate by two dense runs + online merge is
    # overkill at this size: ranges here are CONTIGUOUS in the concat
    # ([r1s,r1e) ⊕ [kv1_len+r2s, kv1_len+r2e)) only when r1e==kv1_len or
    # r1 empty; the chosen ranges satisfy neither for seg 2 — so build an
    # explicit mask reference instead.
    qf = np.asarray(q, np.float32)
    kf = np.repeat(np.asarray(kcat, np.float32), hq // hk, axis=1)
    vf = np.repeat(np.asarray(vcat, np.float32), hq // hk, axis=1)
    ref2 = np.zeros_like(qf)
    for s in range(4):
        qs = qf[s * seg_len : (s + 1) * seg_len]
        pos = np.arange(kv1_len + kv2_len)
        m1 = (pos >= int(r1s[s])) & (pos < int(r1e[s])) & (pos < kv1_len)
        p2 = pos - kv1_len
        m2 = (p2 >= int(r2s[s])) & (p2 < int(r2e[s])) & (pos >= kv1_len)
        mask = m1 | m2
        logits = np.einsum("lqd,mqd->qlm", qs, kf) * hd**-0.5
        logits = np.where(mask[None, None, :], logits, -1e30)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = np.asarray(jnp.asarray(w, jnp.bfloat16), np.float32)
        w /= w.sum(-1, keepdims=True)
        ref2[s * seg_len : (s + 1) * seg_len] = np.einsum("qlm,mqd->lqd", w, vf)
    d2 = np.abs(np.asarray(out2, np.float32) - ref2)
    print(f"two_source max_err={d2.max():.4f} mean_err={d2.mean():.5f}")
    assert d2.max() < 0.1 and d2.mean() < 0.01, (d2.max(), d2.mean())

    # --- fused gate-norm-residual epilogue (ops/fused_norm.py) -----------
    # second case at the 24B width (D=6144): the f32 row tile must scale
    # down to fit the 16MB Mosaic scoped-vmem cap (256x6144 measured 18MB)
    for n_seg, seg_len2, D in ((3, 450, 1536), (2, 300, 6144)):
        _check_fused_norm(rng, n_seg, seg_len2, D)

    print("OK: all kernels correct on", jax.default_backend())


def _check_fused_norm(rng, n_seg, seg_len2, D):
    from magi_tpu.ops.fused_norm import gate_norm_residual

    S = n_seg * seg_len2
    x = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)
    gate = jnp.asarray(rng.standard_normal((n_seg, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)
    for zc in (False, True):
        got = jax.jit(
            lambda x, res, gate, w, b, zc=zc: gate_norm_residual(
                x, res, gate, w, b, eps=1e-6, zero_centered=zc, n_seg=n_seg,
                interpret=INTERP,
            )
        )(x, res, gate, w, b)
        xf = np.asarray(x, np.float32).reshape(n_seg, seg_len2, D)
        xf = (xf * np.asarray(gate)[:, None, :]).reshape(S, D)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        wref = np.asarray(w) + (1.0 if zc else 0.0)
        want = (xf - mu) / np.sqrt(var + 1e-6) * wref + np.asarray(b)
        want = want + np.asarray(res, np.float32)
        dn = np.abs(np.asarray(got, np.float32) - want)
        # bf16 output: tolerance must scale with output magnitude (ulp at
        # |want|~10 is 0.0625; a fixed 0.1 fails at the 24B width).  Allow
        # 3 ulp of the largest output + a tight mean bound.
        tol = 3 * 2.0**-7 * np.abs(want).max()
        print(f"fused_norm D={D} zc={zc} max_err={dn.max():.4f} tol={tol:.4f}")
        assert dn.max() < tol and dn.mean() < 1e-2, (dn.max(), tol, dn.mean())


if __name__ == "__main__":
    main()
