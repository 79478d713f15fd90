"""fp8-emulation quality A/B (VERDICT r4 missing #3, CPU-only, no network).

The reference executes fp8 at runtime (div_clamp_to e4m3 + flashinfer
bmm_fp8, ref: dit_module.py:364-487).  The repo instead dequantizes `.fp8`
checkpoints to bf16 at load (checkpoint/loader._dequant_fp8) and executes
int8 w8a8 — the right design for v5e (no fp8 MXU), but its quality vs the
reference's own fp8 path had never been measured.  This script closes that
gap without network or a GPU:

1. Emulates BOTH reference fp8 linear classes in numpy/ml_dtypes, bit-true
   to the math of the torch code:
   * PerTensorQuantizedFp8Linear  (q/qx/k/v, ref :431-460):
       y = [e4m3(clamp(x / input_scale)) @ Wq^T] * input_scale * weight_scale
   * PerChannelQuantizedFp8Linear (proj/kv_xattn/fc1/fc2, ref :462-487,
     smooth-quant — stored weight is smooth-folded):
       y = [e4m3(clamp(x / smooth_scale)) @ Wq^T] * input_scale * weight_scale
2. Builds the exact checkpoint tensors those classes load, runs the repo's
   `_dequant_fp8` on them, and asserts the recovered weight equals the
   emulated forward's effective weight (catches scale-folding bugs).
3. Compares output error vs the fp32 ground truth (pre-quantization W):
   ref-fp8-exec  vs  repo dequant->bf16  vs  repo dequant->int8 w8a8
   vs  repo dequant->int4 w4a8, at the DiT hot shapes, on activation
   distributions with and without channel outliers (outliers are why
   smooth-quant exists; both regimes must be reported).

Run: python scripts/ab_fp8_quality.py   (pure numpy — safe alongside TPU jobs)
"""

import sys

import numpy as np
import ml_dtypes

E4M3 = ml_dtypes.float8_e4m3fn
FP8_MAX = 448.0


def e4m3(x: np.ndarray) -> np.ndarray:
    """div_clamp_to's cast: clamp to the e4m3 range, round via the dtype
    (ref: dit_module.py:364-384; the bf16 intermediate there is a memory
    optimization, not a semantic — e4m3 resolution is far below bf16's)."""
    return np.clip(x, -FP8_MAX, FP8_MAX).astype(E4M3).astype(np.float32)


def ref_per_tensor(x, w, x_calib):
    """PerTensorQuantizedFp8Linear emulation.  input_scale is calibrated so
    calib activations fill the e4m3 range; weight_scale per-tensor.
    Returns (y, checkpoint_dict)."""
    input_scale = np.abs(x_calib).max() / FP8_MAX
    weight_scale = np.abs(w).max() / FP8_MAX
    wq = e4m3(w / weight_scale)  # stored [out, in]
    xq = e4m3(x / input_scale)
    y = (xq @ wq.T) * input_scale * weight_scale
    ckpt = {
        "weight": (w / weight_scale).clip(-FP8_MAX, FP8_MAX).astype(E4M3)[None],
        "weight_scale": np.array([weight_scale], np.float32),
        "input_scale": np.full(w.shape[1], input_scale, np.float32),
    }
    return y, ckpt


def ref_per_channel(x, w, x_calib, alpha=0.5):
    """PerChannelQuantizedFp8Linear emulation (smooth-quant): per-in-channel
    smoothing s moves activation outliers into the weight, the folded weight
    s*W quantizes per-tensor.  Returns (y, checkpoint_dict)."""
    act_amax = np.abs(x_calib).max(axis=0) + 1e-12  # [in]
    w_amax = np.abs(w).max(axis=0) + 1e-12  # [in] (w here [out, in] -> axis 0 is out)
    s = act_amax**alpha / (np.abs(w).max(axis=0) + 1e-12) ** (1 - alpha)  # [in]
    del w_amax
    w_folded = w * s[None, :]  # [out, in]
    weight_scale = np.abs(w_folded).max() / FP8_MAX
    # smooth_scale both smooths AND ranges the activation into e4m3
    act_s_amax = np.abs(x_calib / s[None, :]).max() + 1e-12
    input_scale = act_s_amax / FP8_MAX
    smooth_scale = s * input_scale  # x / smooth = (x/s) / input_scale
    wq = e4m3(w_folded / weight_scale)
    xq = e4m3(x / smooth_scale[None, :])
    y = (xq @ wq.T) * input_scale * weight_scale
    ckpt = {
        "weight": (w_folded / weight_scale).clip(-FP8_MAX, FP8_MAX).astype(E4M3)[None],
        "weight_scale": np.array([weight_scale], np.float32),
        "input_scale": np.array([input_scale], np.float32),
        "smooth_scale": smooth_scale[None].astype(np.float32),
    }
    return y, ckpt


def repo_dequant(ckpt_dict, prefix="layer"):
    """Run the repo's actual loader dequant on the emulated checkpoint."""
    sys.path.insert(0, "/root/repo")
    from magi_tpu.checkpoint.loader import _dequant_fp8

    state = {f"{prefix}.{k}": v for k, v in ckpt_dict.items()}
    out = _dequant_fp8(state)
    return out[f"{prefix}.weight"]  # [out, in] f32


def bf16(x):
    return x.astype(ml_dtypes.bfloat16).astype(np.float32)


def repo_int8(x, w_deq):
    """The repo's w8a8 path (ops/quant.py math): per-out-channel weight
    scales, per-row dynamic act scales, int8 MXU dot."""
    amax_w = np.abs(w_deq).max(axis=1) + 1e-12  # [out] (w_deq [out, in])
    ws = amax_w / 127.0
    wq = np.clip(np.round(w_deq / ws[:, None]), -127, 127).astype(np.int8)
    amax_x = np.abs(x).max(axis=1) + 1e-12
    xs = amax_x / 127.0
    xq = np.clip(np.round(x / xs[:, None]), -127, 127).astype(np.int8)
    # float64 dot is exact for int8xint8 sums (<= 2^53) and BLAS-backed,
    # unlike numpy's un-BLASed integer matmul
    acc = xq.astype(np.float64) @ wq.T.astype(np.float64)
    return (acc * xs[:, None] * ws[None, :]).astype(np.float32)


def repo_int4(x, w_deq):
    """w4a8: int4 weights (per-out-channel), int8 activations."""
    amax_w = np.abs(w_deq).max(axis=1) + 1e-12
    ws = amax_w / 7.0
    wq = np.clip(np.round(w_deq / ws[:, None]), -7, 7).astype(np.int8)
    amax_x = np.abs(x).max(axis=1) + 1e-12
    xs = amax_x / 127.0
    xq = np.clip(np.round(x / xs[:, None]), -127, 127).astype(np.int8)
    acc = xq.astype(np.float64) @ wq.T.astype(np.float64)
    return (acc * xs[:, None] * ws[None, :]).astype(np.float32)


def repo_int8_smooth(x, w_deq, s):
    """The repo's smooth-folded w8a8 path for fp8 checkpoints (act_smooth
    plumbing: loader._dequant_fp8 -> quant._quantize_stacked_smooth ->
    model._linears_shared): y = quant8(x/s) @ quant8(s*W)."""
    return repo_int8(x / s[None, :], w_deq * s[None, :])


def repo_int4_smooth(x, w_deq, s):
    return repo_int4(x / s[None, :], w_deq * s[None, :])


def relerr(y, y_true):
    return float(np.linalg.norm(y - y_true) / (np.linalg.norm(y_true) + 1e-30))


def run_case(name, m, k, n, outliers, rng):
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02  # [out, in]
    x = rng.standard_normal((m, k)).astype(np.float32)
    x_calib = rng.standard_normal((m, k)).astype(np.float32)
    if outliers:
        # a few activation channels 30-80x hotter (the smooth-quant regime)
        idx = rng.choice(k, size=max(1, k // 256), replace=False)
        scale = rng.uniform(30, 80, size=idx.size).astype(np.float32)
        x[:, idx] *= scale
        x_calib[:, idx] *= scale
    y_true = x.astype(np.float64) @ w.T.astype(np.float64)
    y_true = y_true.astype(np.float32)

    rows = {}
    for cls, ref_fn in (("PT", ref_per_tensor), ("PC", ref_per_channel)):
        y_ref, ckpt = ref_fn(x, w, x_calib)
        w_deq = repo_dequant(ckpt)
        # effective weight of the emulated forward (what dequant must recover)
        if cls == "PT":
            w_eff = ckpt["weight"][0].astype(np.float32) * ckpt["weight_scale"][0]
        else:
            w_eff = (
                ckpt["weight"][0].astype(np.float32)
                * ckpt["weight_scale"][0]
                * ckpt["input_scale"][0]
                / ckpt["smooth_scale"][0][None, :]
            )
        deq_err = float(np.abs(w_deq - w_eff).max())
        assert deq_err < 1e-6 * max(1.0, np.abs(w_eff).max()), (
            f"{name}/{cls}: _dequant_fp8 does not invert the reference "
            f"forward (max weight err {deq_err})"
        )
        y_bf16 = bf16(bf16(x) @ bf16(w_deq).T)
        y_i8 = repo_int8(x, w_deq)
        y_i4 = repo_int4(x, w_deq)
        rows[cls] = dict(
            ref_fp8=relerr(y_ref, y_true),
            deq_bf16=relerr(y_bf16, y_true),
            deq_int8=relerr(y_i8, y_true),
            deq_int4=relerr(y_i4, y_true),
        )
        if cls == "PC":
            # the executed path for PC linears: act_smooth = smooth/input
            s = ckpt["smooth_scale"][0] / ckpt["input_scale"][0]
            rows[cls]["i8_smooth"] = relerr(repo_int8_smooth(x, w_deq, s), y_true)
            rows[cls]["i4_smooth"] = relerr(repo_int4_smooth(x, w_deq, s), y_true)
    return rows


def main():
    rng = np.random.default_rng(0)
    shapes = [
        # (name, m, k, n) — 4.5B hot shapes + one 24B
        ("4.5B qkv   (3072->3072)", 512, 3072, 3072),
        ("4.5B fc1   (3072->12288)", 512, 3072, 12288),
        ("4.5B fc2   (12288->3072)", 512, 12288, 3072),
        ("24B  fc1   (6144->16384)", 512, 6144, 16384),
    ]
    print(f"{'shape':26s} {'acts':9s} {'cls':3s} {'ref fp8':>9s} {'deq bf16':>9s} "
          f"{'deq int8':>9s} {'deq int4':>9s} {'i8+smooth':>9s} {'i4+smooth':>9s}")
    worst_ratio_i8 = 0.0  # executed path: plain int8 for PT, smooth for PC
    for name, m, k, n in shapes:
        for outliers in (False, True):
            rows = run_case(name, m, k, n, outliers, rng)
            for cls, r in rows.items():
                sm8 = f"{r['i8_smooth']:9.5f}" if "i8_smooth" in r else " " * 9
                sm4 = f"{r['i4_smooth']:9.5f}" if "i4_smooth" in r else " " * 9
                print(
                    f"{name:26s} {'outlier' if outliers else 'normal':9s} {cls:3s} "
                    f"{r['ref_fp8']:9.5f} {r['deq_bf16']:9.5f} "
                    f"{r['deq_int8']:9.5f} {r['deq_int4']:9.5f} {sm8} {sm4}"
                )
                executed = r.get("i8_smooth", r["deq_int8"])
                worst_ratio_i8 = max(worst_ratio_i8, executed / (r["ref_fp8"] + 1e-30))
    print(f"\nworst executed-int8/fp8 error ratio: {worst_ratio_i8:.3f} "
          f"({'int8 <= fp8 everywhere' if worst_ratio_i8 <= 1.0 else 'int8 worse somewhere'})")


if __name__ == "__main__":
    main()
