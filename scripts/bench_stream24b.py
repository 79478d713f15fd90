"""BASELINE config #5 on chip: 24B quantized distill, LONG-HORIZON
streaming generation (16+ chunks) with the host-offloaded KV cache.

Default kv ranges (noise2clean_kvrange=None): every chunk attends ALL
previous chunks, so no sliding window bounds the cache — `kv_offload`
keeps the full-history cache in HOST RAM and streams one layer slab at a
time around each layer's jit (HostKVCache; the reference pins the cache
in CPU memory and `.cuda()`s it per layer, ref: dit_module.py:800-819).
w4a8 weights + int8 attention (int8-stored cache) halve both host RAM and
the host<->HBM streaming bytes.

Three walks measured / compared:
  A. streamed   — default ranges, kv_offload=True  (host cache, the mode
                  this script exists to demonstrate; per-step times)
  B. in-HBM     — default ranges, kv_offload=False (full cache on device;
                  fits at 256p/16 chunks thanks to the int8 cache) —
                  streamed-vs-HBM equality asserted on the final latents
                  + the step-time delta = the NON-hidden transfer cost
  C. sliding    — released noise2clean ranges, kv_offload=True (the
                  bounded-span regime, for the s/step comparison VERDICT
                  r3 #1 asks for)

Usage: MAGI_ATTN_INT8=1 timeout 7200 python -u scripts/bench_stream24b.py
Env:   MAGI_STREAM_SIZE=256  MAGI_STREAM_CHUNKS=16  MAGI_STREAM_MODES=A,B,C
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
os.environ.setdefault("MAGI_ATTN_INT8", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from magi_tpu.core.config import MagiConfig
    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.sampling.transport import ArdfSampler, InferenceInput

    on_tpu = jax.default_backend() == "tpu"
    config = MagiConfig.from_json("example/24B/24B_distill_quant_config.json")
    mc, rc, ec = config.model_config, config.runtime_config, config.engine_config
    ec.cp_size = ec.pp_size = 1  # single chip

    if not on_tpu:  # CPU smoke: tiny arch, same code paths
        mc.num_layers, mc.hidden_size, mc.ffn_hidden_size = 2, 256, 512
        mc.num_attention_heads, mc.num_query_groups, mc.kv_channels = 4, 2, 64
        mc.caption_max_length = 64

    # "256" (square) or "720x1280" (the 24B release default, VERDICT r4 #3)
    size_s = os.environ.get("MAGI_STREAM_SIZE", "256" if on_tpu else "64")
    if "x" in size_s:
        size_h, size_w = (int(v) for v in size_s.split("x"))
    else:
        size_h = size_w = int(size_s)
    size = f"{size_h}x{size_w}"
    chunk_num = int(os.environ.get("MAGI_STREAM_CHUNKS", "16" if on_tpu else "4"))
    modes = os.environ.get("MAGI_STREAM_MODES", "A,B,C").split(",")
    steps = rc.num_steps  # 16 (distill), cfg_number 1
    rc.video_size_h, rc.video_size_w = size_h, size_w
    H, W = size_h // 8, size_w // 8
    ctn = (rc.chunk_width // mc.t_patch_size) * (H // mc.patch_size) * (W // mc.patch_size)
    L = mc.caption_max_length

    t0 = time.time()
    # edge_bf16=False: the first/last-layer bf16 policy costs ~1.9GB of the
    # 16GB HBM — with 12.5GB of w4 weights + the 16-chunk cache it OOMs
    # (same trade bench_24b.py makes at default resolution)
    params = init_dit_params(jax.random.PRNGKey(0), config, zeros=True,
                             quant_bits=4 if on_tpu else 0, edge_bf16=False)
    print(f"built param tree in {time.time()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
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

    n2c_released = list(rc.noise2clean_kvrange or [5, 4, 3, 2])
    out = {"metric": "24B distill-quant long-horizon streaming (BASELINE config #5)",
           "backend": jax.default_backend(), "size": size, "chunks": chunk_num,
           "steps": steps, "tokens_per_chunk": ctn,
           "attn_int8": os.environ.get("MAGI_ATTN_INT8"), "runs": {}}

    def run(tag, n2c, offload):
        rc.noise2clean_kvrange = n2c
        ec.kv_offload = offload
        import dataclasses

        cfg = MagiConfig(model_config=mc,
                         runtime_config=dataclasses.replace(rc),
                         engine_config=dataclasses.replace(ec))
        s = ArdfSampler(cfg, params, inp, jax.random.PRNGKey(7))
        mode = "host-streamed" if s.host_mode else (
            "sliding-device" if (offload and n2c) else "in-HBM")
        n_var = s.warm_step_variants()

        def sync():
            np.asarray(s.xs.ravel()[:1])

        sync()
        times = []
        groups = {}  # window width (chunks denoised together) -> step times
        emitted = 0
        n_steps = s.total_forward_steps()
        for step in range(n_steps):
            _, _, c_start, c_end, _, _ = s._status(step)
            t1 = time.perf_counter()
            if s.do_step(step) is not None:
                emitted += 1
            sync()
            times.append(time.perf_counter() - t1)
            groups.setdefault(int(c_end - c_start), []).append(times[-1])
            if step % 16 == 0 or step == n_steps - 1:
                print(f"  [{tag}] step {step+1}/{n_steps} (w{c_end-c_start}): "
                      f"{times[-1]:.2f}s", file=sys.stderr)
        xs = np.asarray(s.xs)
        total = sum(times)
        # per-chunk-position medians show whether step time grows with
        # history length (default ranges: attended span grows per chunk)
        q = len(times) // 4 or 1
        quarters = [round(float(np.median(times[i * q:(i + 1) * q])), 3) for i in range(4)]
        # host mode compiles its per-layer jits INSIDE the first steps of
        # the walk (warm_step_variants is a no-op there), so the mean is
        # compile-polluted on a cold jit cache: steady stats use the
        # second half of the walk (all variants seen by then)
        steady = times[len(times) // 2:]
        rec = {
            "mode": mode, "forward_steps": len(times), "chunks_emitted": emitted,
            "wall_s": round(total, 1), "sec_per_step_mean": round(total / len(times), 3),
            "sec_per_step_steady_mean": round(float(np.mean(steady)), 3),
            "sec_per_step_steady_median": round(float(np.median(steady)), 3),
            "sec_per_step_median_by_quarter": quarters,
            "sec_per_step_first": round(times[0], 3),
            "sec_per_step_last": round(times[-1], 3),
            "variants_warmed": n_var,
            # per-window s/step (min/median/max/n; median of the LAST half
            # of each group excludes in-walk compiles) — the 720p-shaped
            # per-window latencies VERDICT r4 #3 asks to MEASURE
            "sec_per_step_by_window": {
                f"w{k}": [round(min(v), 3),
                          round(float(np.median(v[len(v) // 2:])), 3),
                          round(max(v), 3), len(v)]
                for k, v in sorted(groups.items())
            },
        }
        if s.host_mode:
            nbytes = sum(b.nbytes for b in jax.tree_util.tree_leaves(s.host_cache.buf))
            # per streamed forward the whole cache crosses the host link once
            rec["host_cache_gib"] = round(nbytes / 2**30, 2)
            rec["host_link_gib_per_step"] = round(nbytes / 2**30, 2)
            rec["host_link_gib_s_if_unhidden"] = round(
                nbytes / 2**30 / float(np.mean(steady)), 2)
        out["runs"][tag] = rec
        print(json.dumps({tag: rec}), file=sys.stderr)
        # persist final latents + the record: modes can then run in SEPARATE
        # invocations (the walk is deterministic: seeded inputs + PRNGKey(7))
        # and still be compared / merged — a 16-chunk mode at 24B can exceed
        # one process's timeout budget on cold compiles
        np.savez(f"/tmp/stream24b_{tag}_{size}.npz", xs=np.asarray(xs, np.float32),
                 rec=json.dumps(rec))
        del s
        return xs

    def safe(tag, *a):
        try:
            return run(tag, *a)
        except Exception as e:  # noqa: BLE001 — e.g. mode B OOM must not
            # take down the streamed-mode measurement
            import traceback

            out["runs"][tag] = {"error": repr(e)[:300]}
            print(json.dumps({tag: out["runs"][tag]}), file=sys.stderr)
            traceback.print_exc()  # full allocation detail for OOMs
            return None

    def _load_prior(tag):
        # a mode measured by a PREVIOUS invocation (same seeds): merge its
        # record and return its latents for the cross-mode comparison
        path = f"/tmp/stream24b_{tag}_{size}.npz"
        if os.path.exists(path):
            d = np.load(path, allow_pickle=True)
            out["runs"][tag] = json.loads(str(d["rec"]))
            out["runs"][tag]["from_prior_invocation"] = True
            return d["xs"]
        return None

    xs_a = xs_b = None
    if "A" in modes:
        xs_a = safe("A_streamed_default_ranges", None, True)
    else:
        xs_a = _load_prior("A_streamed_default_ranges")
    if "B" in modes:
        xs_b = safe("B_inHBM_default_ranges", None, False)
    else:
        xs_b = _load_prior("B_inHBM_default_ranges")
    if "C" in modes:
        safe("C_sliding_noise2clean", n2c_released, True)

    if xs_a is not None and xs_b is not None:
        err = float(np.abs(xs_a - xs_b).max())
        out["streamed_vs_inHBM_max_abs_err"] = err
        # different jit partitioning (per-layer jits vs one fused scan) —
        # bit-equality is not expected on TPU, agreement is
        out["streamed_vs_inHBM_ok"] = bool(err < 2e-2)
    if (xs_a is not None and xs_b is not None and "A" in out["runs"] and "B" in out["runs"]):
        da = out["runs"]["A_streamed_default_ranges"]["sec_per_step_steady_mean"]
        db = out["runs"]["B_inHBM_default_ranges"]["sec_per_step_steady_mean"]
        out["streaming_overhead_sec_per_step"] = round(da - db, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
