"""Single-chip 24B end-to-end ARDF walk + per-step latency (north-star #2).

The 24B model is ~23B params: bf16 (46GB) and even int8 (23GB) exceed a
16GB v5e HBM, so this runs the w4a8 path — nibble-packed int4 weights
(11.5GB) + int8 activations on the MXU (ops/quant.quantize_params_int4).
The sliding-window KV cache (noise2clean kv ranges from the released 24B
config) bounds cache HBM.  ada/norm/embedder params stay bf16/f32 and the
first/last-layer bf16 policy is optional here (MAGI_24B_EDGE_BF16=1):
2 edge layers cost 1.9GB of HBM that the default-resolution run needs.

Measures sec/denoise-step at one or more spatial sizes and projects the
reference-default 720x1280 per-chunk denoise latency (BASELINE.json
north-star #2) by linear-in-tokens scaling between the measured sizes
(matmul cost is linear in tokens; attention's quadratic term is small at
these window sizes — the projection methodology is printed alongside).

Usage: python scripts/bench_24b.py          (~20-40 min cold on the chip)
Env:   MAGI_24B_SIZES=384,480  MAGI_24B_STEPS=16  MAGI_24B_EDGE_BF16=0
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _attended_pairs(rc, kv_start, kv_end, n_den: int, ctn: int) -> int:
    """Self-attention token-pair count of one denoise step (model-level):
    every segment token attends its [kv_start, kv_end) range, in each of
    the two conditioned CFG forwards; the unconditional branch is
    self-only per denoising chunk.  Cross-attention pairs are tokens x
    caption_len — proportional to tokens, so they belong to the LINEAR
    regressor of the fit, not this one."""
    import numpy as np

    rng_sum = int(np.sum((np.asarray(kv_end, np.int64) - np.asarray(kv_start, np.int64))))
    cond_forwards = 2 if rc.cfg_number == 3 else 1
    pairs = cond_forwards * ctn * rng_sum
    if rc.cfg_number == 3:
        pairs += n_den * ctn * ctn  # uncond: each chunk attends itself
    return int(pairs)


def _attn_flops_per_pair() -> float:
    """Model-level FLOPs per attended token pair at 24B: 4 (two matmuls x
    2 FLOPs/MAC) x 6144 (hq*hd) x 48 layers."""
    return 4.0 * 6144.0 * 48.0


def _project_720p(rc, coeffs) -> dict:
    """Evaluate the fitted step-time model at the reference-default 24B
    720x1280 schedule (32 steps, window 4, ref:
    example/24B/24B_base_config.json:58-77): per-chunk denoise latency =
    the sum of one full stage's dpss=8 steps, each with the EXACT kv
    ranges the scheduler produces at steady state (mid-walk stage)."""
    import numpy as np

    import magi_tpu.sampling.schedule as sched
    from magi_tpu.sampling import kv_ranges as kvr

    a, b, c = coeffs
    ctn = 21600  # 6 * (720/8/2) * (1280/8/2)
    nsteps, window, cnum = 32, 4, 8
    dpss = nsteps // window
    cs_s, ce_s, ts_s, te_s = sched.generate_sequences(cnum, window, 0)
    stage = next(
        i for i in range(len(cs_s))
        if ce_s[i] - cs_s[i] == window and cs_s[i] >= 2
    )
    c_start, c_end = int(cs_s[stage]), int(ce_s[stage])
    t_start, t_end = ts_s[stage], te_s[stage]
    # The fitted per-pair coefficient carries the attention kernel's
    # efficiency at the SMALL measured shapes; at real 720p-w4 shapes the
    # kernel measured 151.5 TF/s (scripts/ab_attn_q8.py / README 24B-720p
    # row), i.e. ~7.8e-9 s/pair.  Report both: the fit value is the
    # conservative upper bound, the kernel-calibrated value assumes the
    # big-shape efficiency holds for the whole attention term.
    c_kernel = _attn_flops_per_pair() / 151.5e12
    total = {"fit": 0.0, "kernel_calibrated": 0.0}
    per_step = []
    for didx in range(dpss):
        n_den = c_end - c_start
        extra = bool(c_start > 0 and didx == 0)
        sp = c_start - int(extra)
        n_seg = n_den + int(extra)
        soc = sched.denoise_step_of_each_chunk(
            dpss, t_start, t_end, didx, num_steps=nsteps if extra else None
        )
        kv_s, kv_e = kvr.denoising_kvrange(rc, sp, n_seg, soc, nsteps, ctn)
        tokens = n_seg * ctn
        pairs = _attended_pairs(rc, kv_s, kv_e, n_den, ctn)
        t_fit = a + b * tokens + c * pairs
        t_cal = a + b * tokens + c_kernel * pairs
        per_step.append([round(float(t_fit), 1), round(float(t_cal), 1)])
        total["fit"] += t_fit
        total["kernel_calibrated"] += t_cal
    return {
        "sec_per_step_720p_w4_[fit,kernel_calibrated]": per_step,
        "per_chunk_denoise_latency_720p_est_s": {
            k: round(float(v), 1) for k, v in total.items()
        },
        "model_coeffs": {"overhead_s": round(float(a), 3),
                         "per_token_s": float(b), "per_attn_pair_s": float(c),
                         "per_attn_pair_s_kernel_at_720p_shape": float(c_kernel)},
    }


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from magi_tpu.core.config import MagiConfig
    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.sampling.transport import ArdfSampler, InferenceInput

    on_tpu = jax.default_backend() == "tpu"
    config = MagiConfig.from_json("example/24B/24B_base_config.json")
    mc, rc, ec = config.model_config, config.runtime_config, config.engine_config

    if not on_tpu:  # CPU smoke: tiny arch, same code path
        mc.num_layers, mc.hidden_size, mc.ffn_hidden_size = 2, 256, 512
        mc.num_attention_heads, mc.num_query_groups, mc.kv_channels = 4, 2, 64
        mc.caption_max_length = 64

    # each entry is "S" (square SxS) or "HxW" (e.g. "720x1280", the
    # reference-default 24B frame, 24B_base_config.json:60-61)
    def _parse_size(s: str):
        if "x" in s:
            h, w = s.split("x")
            return int(h), int(w)
        return int(s), int(s)

    sizes = [_parse_size(s) for s in os.environ.get(
        "MAGI_24B_SIZES", "384,480" if on_tpu else "64").split(",")]
    steps = int(os.environ.get("MAGI_24B_STEPS", "16" if on_tpu else "4"))
    edge_bf16 = os.environ.get("MAGI_24B_EDGE_BF16", "0") == "1"
    chunk_num = int(os.environ.get("MAGI_24B_CHUNKS", "2"))
    window = int(os.environ.get("MAGI_24B_WINDOW", "2"))
    # MAGI_24B_LAYERS: measure a reduced-layer-count model at shapes the
    # full 48-layer model cannot fit in one 16GB HBM (720x1280 window-4:
    # the int8 sliding cache alone is ~8.5GB at 48 layers).  Per-step time
    # is (non-layer overhead) + L * (per-layer cost); the overhead term is
    # sub-1% of a 720p step, so t_48 ~= t_L * 48/L — the attention kernels,
    # kv ranges, and matmul shapes are EXACT, only the scan trip count
    # shrinks (VERDICT r4 #3's sanctioned reduced-layer extrapolation).
    layers = int(os.environ.get("MAGI_24B_LAYERS", "0"))
    if layers and on_tpu:
        mc.num_layers = layers
    # MAGI_24B_STOP_AFTER_W4=K: end the walk K steps after it first reaches
    # a full-window step — a 720p w4 step is minutes; the ramp widths are
    # measured on the way up and the walk needn't finish the video.
    stop_after_w4 = int(os.environ.get("MAGI_24B_STOP_AFTER_W4", "0"))
    L = mc.caption_max_length

    t0 = time.time()
    params = init_dit_params(
        jax.random.PRNGKey(0), config, zeros=True, quant_bits=4, edge_bf16=edge_bf16
    )
    w_bytes = sum(
        l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(params)
    )
    print(f"built w4 zero tree: {w_bytes/2**30:.1f} GiB on device in {time.time()-t0:.0f}s",
          file=sys.stderr)

    results = []
    rng = np.random.default_rng(0)
    for size_h, size_w in sizes:
        size = f"{size_h}x{size_w}" if size_h != size_w else size_h
        rc.video_size_h, rc.video_size_w = size_h, size_w
        rc.num_steps, rc.window_size = steps, window
        H, W = size_h // 8, size_w // 8
        ctn = (rc.chunk_width // mc.t_patch_size) * (H // mc.patch_size) * (W // mc.patch_size)
        inp = InferenceInput(
            caption_embs=jnp.asarray(
                rng.normal(size=(chunk_num, L, mc.caption_channels)).astype(np.float32)),
            caption_lens=np.full(chunk_num, L, np.int32),
            null_emb=jnp.asarray(rng.normal(size=(L, mc.caption_channels)).astype(np.float32)),
            null_len=50,
            latent_size=(mc.in_channels // (2 if mc.half_channel_vae else 1),
                         chunk_num * rc.chunk_width, H, W),
            num_steps=steps,
            chunk_num=chunk_num,
            has_text=True,
        )
        sampler = ArdfSampler(config, params, inp, jax.random.PRNGKey(7))
        n_var = sampler.warm_step_variants()

        def sync():
            np.asarray(sampler.xs.ravel()[:1])

        sync()
        times = []
        tok_steps = []
        pair_steps = []
        emitted = 0
        n_w4 = 0
        for step in range(sampler.total_forward_steps()):
            p = sampler._plan(step)
            tok_steps.append(p["n_seg"] * ctn)
            pair_steps.append(_attended_pairs(rc, p["kv_start"], p["kv_end"],
                                              p["n_den"], ctn))
            t1 = time.perf_counter()
            if sampler.do_step(step) is not None:
                emitted += 1
            sync()
            times.append(time.perf_counter() - t1)
            print(json.dumps({"step": step, "n_den": p["n_den"],
                              "sec": round(times[-1], 3)}), file=sys.stderr)
            if stop_after_w4 and p["n_den"] >= min(window, chunk_num):
                n_w4 += 1
                if n_w4 >= stop_after_w4:
                    print(json.dumps({"early_stop": f"{n_w4} full-window steps"}),
                          file=sys.stderr)
                    break
        total = sum(times)
        # per-window-width medians: the projection fits PER-STEP
        # (tokens, sec) pairs, not walk averages — a walk mixes w1..w4
        # ramp steps, and the 720p north-star is a pure w4 step
        by_tok = {}
        for tk, tm in zip(tok_steps, times):
            by_tok.setdefault(tk, []).append(tm)
        per_width = {
            str(tk): [round(float(np.median(v)), 3), len(v)]
            for tk, v in sorted(by_tok.items())
        }
        results.append({
            "size": size, "num_layers": mc.num_layers,
            "tokens_per_chunk": ctn, "forward_steps": len(times),
            "chunks": emitted, "sec_per_step": round(total / len(times), 3),
            "avg_tokens_per_step": int(np.mean(tok_steps)),
            "per_width_median_sec": per_width,
            "step_points": [[int(tk), int(pr), round(float(tm), 3)]
                            for tk, pr, tm in zip(tok_steps, pair_steps, times)],
            "wall_s": round(total, 1), "variants_warmed": n_var,
        })
        print(json.dumps({k: v for k, v in results[-1].items() if k != "step_points"}),
              file=sys.stderr)
        del sampler

    # 720x1280 projection (north-star #2).  Reference default: 720x1280,
    # 32 steps, window 4 -> 21600 tokens/chunk, steady-state steps carry a
    # full 4-chunk window (86400 tokens/step) and one chunk completes
    # every num_steps/window = 8 steps.  Fit sec_per_step = a + b*tokens
    # over the measured points (matmul cost is linear in tokens at these
    # shapes; attention's quadratic term makes this a mild underestimate).
    # 720p projection: a PHYSICAL step-time model fit on per-step data —
    # time = overhead + b*(tokens) + c*(attended token pairs).  A plain
    # tokens-only fit from small sizes badly UNDERSTATES 720p: attention
    # pairs grow ~quadratically (4x21600-token window-4 steps are ~2.4e10
    # pairs ~ 24 PFLOP of attention at 24B), while at the measurable sizes
    # attention is a minor term — the earlier rounds' linear-fit numbers
    # (432-553 s/chunk) were artifacts of that, not achievable latencies.
    proj = None
    pts = [p for r in results for p in r["step_points"]]
    if len({(p[0], p[1]) for p in pts}) >= 3:
        A = np.array([[1.0, p[0], p[1]] for p in pts], np.float64)
        y = np.array([p[2] for p in pts], np.float64)
        # scale columns for conditioning
        col = A.max(axis=0)
        coeffs = np.linalg.lstsq(A / col, y, rcond=None)[0] / col
        resid = y - A @ coeffs
        proj = _project_720p(rc, coeffs)
        proj["n_step_points"] = len(pts)
        proj["fit_rms_resid_s"] = round(float(np.sqrt(np.mean(resid ** 2))), 3)
        proj["method"] = (
            "3-term LSQ (overhead + per-token + per-attended-pair) over "
            "per-step measurements, evaluated on the exact kv ranges of the "
            "reference-default 720p 32-step window-4 schedule (one full "
            "stage = 8 steps = one chunk)"
        )
        if coeffs[2] <= 0:
            proj["warning"] = "per-pair coefficient <= 0 (collinear fit) — projection unreliable"

    print(json.dumps({
        "metric": "24B w4a8 single-chip ARDF walk (int4 weights + sliding KV)",
        "backend": jax.default_backend(),
        "edge_bf16": edge_bf16,
        "weight_bytes_gib": round(w_bytes / 2**30, 1),
        "measured": results,
        "projection_720p": proj,
    }))


if __name__ == "__main__":
    main()
