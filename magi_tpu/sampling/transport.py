"""ARDF sample transport: the chunk-wise autoregressive denoising walk
(ref: inference/pipeline/video_generate.py:251-754, SampleTransport).

TPU-native structure: the host loop does only scheduling arithmetic
(windows, timesteps, kv ranges, CFG scales — all tiny numpy); each denoise
step is ONE jitted device function per CFG branch-set that slices the
latent state, runs the DiT forwards, combines CFG branches, Euler-integrates
and writes the window back.  jit specializes on the handful of distinct
(n_denoise, extra-chunk) combinations; the sliding window itself is a
traced value (no recompilation as generation progresses).

The reference's duplicated latent state (`x = cat([x, x])`,
ref: video_generate.py:307-309) is vestigial — both halves stay identical —
and is dropped here.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from collections import Counter
from typing import Generator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magi_tpu.core.config import MagiConfig
from magi_tpu.core.dataclasses import ForwardMeta, SegmentAttnSpec
from magi_tpu.core.logger import print_rank_0
from magi_tpu.models.dit.model import (
    dit_epilogue,
    dit_forward,
    dit_layer_step,
    dit_prologue,
    init_kv_cache,
    kv_cache_shape,
)
from magi_tpu.sampling import kv_ranges as kvr
from magi_tpu.sampling import schedule as sched


@dataclasses.dataclass
class InferenceInput:
    """Pre-assembled conditioning for one generation request
    (ref: InferenceInput + extract_feature_for_inference,
    video_generate.py:33-136)."""

    caption_embs: jax.Array  # [n_chunks, L, caption_channels] text per chunk
    caption_lens: np.ndarray  # [n_chunks] valid caption tokens (prefix mask)
    null_emb: jax.Array  # [L, caption_channels] negative caption slab
    null_len: int  # valid tokens of the null slab (ref: 50)
    latent_size: Tuple[int, int, int, int]  # (C, T, H, W)
    num_steps: int
    chunk_num: int
    has_text: bool  # False -> even the text branch uses null captions
    prefix_video: Optional[jax.Array] = None  # [C, T_pre, H, W] latent
    prev_chunks_scale: float = 0.7  # distill nearly-clean blend (env override)


def _meta(
    n_seg: int,
    ctn: int,
    HP: int,
    WP: int,
    slice_point,
    kv_start,
    kv_end,
    y_lens,
    *,
    update: bool,
    use_cache: bool,
    extra: bool = False,
    distill_nearly: bool = False,
) -> ForwardMeta:
    return ForwardMeta(
        n_segments=n_seg,
        seg_len=ctn,
        H=HP,
        W=WP,
        T_total=0,  # informational only
        update_kv_cache=update,
        use_kv_cache=use_cache,
        distill_nearly_clean_chunk=distill_nearly,
        fwd_extra_1st_chunk=extra,
        slice_point=jnp.asarray(slice_point, jnp.int32),
        self_attn=SegmentAttnSpec(
            kv_start=jnp.asarray(kv_start, jnp.int32), kv_end=jnp.asarray(kv_end, jnp.int32)
        ),
        y_lens=jnp.asarray(y_lens, jnp.int32),
    )


_JIT_CACHE: dict = {}


def _config_key(config: MagiConfig) -> str:
    """Deterministic content key over all config fields.  Keying by
    id(config) would silently reuse stale closures if a collected config's
    id were recycled, and would needlessly recompile for equal-content
    configs (e.g. one per request in the service)."""
    import dataclasses

    return repr(
        (
            dataclasses.asdict(config.model_config),
            dataclasses.asdict(config.runtime_config),
            dataclasses.asdict(config.engine_config),
            # trace-time switches that change the compiled step but live
            # outside the config dataclasses — EVERY env var read during
            # tracing must appear here, or flipping it between samplers in
            # one process silently reuses a stale compiled step.
            os.environ.get("MAGI_ATTN_INT8", "0"),
            os.environ.get("MAGI_ATTN_INT8_STORE", "1"),
            os.environ.get("MAGI_ATTN_Q8_SCHEME", "qk8"),
            os.environ.get("MAGI_QMM_IMPL", "xla"),
            os.environ.get("MAGI_FUSED_ACT_QUANT", "0"),
            os.environ.get("MAGI_ATTN_UNIFIED_STREAM", "0"),
            os.environ.get("MAGI_ATTN_TILEOPT", "0"),
        )
    )


def _jitted_steps(config: MagiConfig):
    """jit closures cached by config content — creating a new sampler must
    not retrace/recompile (the reference's CUDA-graph reuse concern,
    solved here by jit-cache hygiene)."""
    key = _config_key(config)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = (
            jax.jit(
                functools.partial(_cfg3_step, config),
                static_argnames=("n_den", "extra", "use_prefix", "pack"),
                donate_argnums=(1, 2),
            ),
            jax.jit(
                functools.partial(_cfg1_step, config),
                static_argnames=("n_den", "extra", "use_prefix", "distill_nearly"),
                donate_argnums=(1, 2),
            ),
            jax.jit(
                functools.partial(_prefix_warmup_step, config),
                static_argnames=("n_chunks",),
                donate_argnums=(1,),
            ),
            # token axis is 3 for BOTH cache leaves: [L,2,G,tok,hd] and the
            # int8-stored cache's scale [L,2,G,tok]
            jax.jit(
                lambda c, s: jax.tree.map(lambda x: jnp.roll(x, -s, axis=3), c),
                donate_argnums=(0,),
            ),
        )
    return _JIT_CACHE[key]


class ArdfSampler:
    """Drives chunk-wise autoregressive denoising for one request
    (PP>1 multi-request pipelining is handled at the mesh level, not here)."""

    def __init__(self, config: MagiConfig, params, inp: InferenceInput, key: jax.Array):
        self.config = config
        self.params = params
        self.inp = inp
        mc, rc, ec = config.model_config, config.runtime_config, config.engine_config

        C, T, H, W = inp.latent_size
        self.cw = rc.chunk_width
        self.window = rc.window_size
        self.HP, self.WP = H // mc.patch_size, W // mc.patch_size
        self.chunk_patches = self.cw // mc.t_patch_size
        self.ctn = self.chunk_patches * self.HP * self.WP
        self.num_steps = inp.num_steps
        self.chunk_num = inp.chunk_num
        self.L = inp.caption_embs.shape[1]

        self.t_total = sched.init_t(inp.num_steps, shortcut_mode=ec.shortcut_mode)
        self.interval = sched.init_interval(inp.num_steps, shortcut_mode=ec.shortcut_mode)

        self.xs = jax.random.normal(key, inp.latent_size, dtype=jnp.float32)

        # KV memory policy (the reference offloads KV to pinned CPU memory,
        # ref: dit_module.py:800-819).  TPU-native, two regimes:
        #   * noise2clean kv-ranges: the attended span is bounded, so
        #     `kv_offload` becomes a SLIDING device cache window that rolls
        #     forward — O(1) HBM in video length with zero host traffic.
        #   * default kv-ranges (attend ALL previous): no window bounds the
        #     span, so `kv_offload` keeps the full cache in HOST RAM and
        #     streams one layer slab at a time (HostKVCache + the
        #     dit_layer_step loop) — unbounded length like the reference.
        offset_chunks = 0 if inp.prefix_video is None else inp.prefix_video.shape[1] // self.cw
        # capacity: just the chunk grid — current-window kv (incl. packed
        # uncond segments and the distill ride-along) never enters the
        # cache buffer (two-source attention reads cache and current
        # separately)
        full_chunks = self.chunk_num
        self.host_mode = bool(ec.kv_offload and not rc.noise2clean_kvrange)
        if self.host_mode:
            from magi_tpu.parallel.mesh import model_parallel_trivial

            if not model_parallel_trivial():
                # on a mesh the cache already shards 1/(cp*pp*tp) — HBM
                # scales with the slice, so host streaming buys nothing
                print_rank_0(
                    "kv_offload with default kv ranges ignored on a "
                    "model-parallel mesh (cache is sharded; host streaming "
                    "is the single-chip fallback)"
                )
                self.host_mode = False
        if ec.kv_offload and rc.noise2clean_kvrange:
            span = max(rc.noise2clean_kvrange)
            if rc.clean_chunk_kvrange != -1:
                span = max(span, rc.clean_chunk_kvrange)
            window_chunks = span + self.window + 1  # +1 extra clean chunk
            self.cache_chunks = min(full_chunks, max(window_chunks, offset_chunks))
        else:
            self.cache_chunks = full_chunks
        self.cache_base = 0  # chunk index of cache slot 0
        self.counts: Counter = Counter()
        # token capacity block-aligned (1024 = attention kernel block_k):
        # the kernel DMAs token tiles straight out of the cache buffer, and
        # alignment means its boundary tiles never read past the allocation
        # (the range mask discards the pad lanes; no per-call re-pad copy)
        from magi_tpu.core.utils import round_up

        cache_tokens = self._cache_tokens = round_up(self.cache_chunks * self.ctn, 1024)
        self._init_key = key
        if self.host_mode:
            self.cache = None
            self.host_cache = HostKVCache(config, cache_tokens)
            self._stream = _stream_jits(config)
        else:
            from magi_tpu.parallel.mesh import shard_kv_cache

            # mesh-aware placement (kv heads over cp×pp×tp); no-op single-device
            self.cache = shard_kv_cache(init_kv_cache(config, cache_tokens))

        self.chunk_offset = 0
        if inp.prefix_video is not None:
            self.chunk_offset = inp.prefix_video.shape[1] // self.cw
            pad_T = self.chunk_num * self.cw
            pv = inp.prefix_video.astype(jnp.float32)
            self.prefix_buf = jnp.pad(pv, ((0, 0), (0, pad_T - pv.shape[1]), (0, 0), (0, 0)))
            self.prefix_len = int(pv.shape[1])
        else:
            self.prefix_buf = jnp.zeros((C, self.cw, H, W), jnp.float32)  # dummy
            self.prefix_len = 0

        # jitted steps (specialize per static meta/shape combination),
        # cached per config object so new samplers reuse compiled code
        (self._jit_cfg3, self._jit_cfg1, self._jit_warmup, self._jit_roll) = _jitted_steps(config)

        # precompute per-run constants once (per-step eager ops are
        # dispatch round-trips on remote backends)
        if inp.has_text:
            self._text_embs = inp.caption_embs
        else:  # (ref: video_generate.py:110-115)
            self._text_embs = jnp.broadcast_to(
                inp.null_emb, inp.caption_embs.shape
            ) + jnp.zeros_like(inp.caption_embs)
        # effective caption lengths: null-slab length when the request has no
        # text (ref: caption mask swap, video_generate.py:110-115)
        cl = np.asarray(inp.caption_lens, np.int32)
        self._lens_eff = cl if inp.has_text else np.full_like(cl, inp.null_len)

    # ----- per-step host arithmetic -------------------------------------

    def _status(self, step: int):
        dpss = self.num_steps // self.window
        stage, didx = divmod(step, dpss)
        cs_s, ce_s, ts_s, te_s = sched.generate_sequences(self.chunk_num, self.window, self.chunk_offset)
        return dpss, didx, cs_s[stage], ce_s[stage], ts_s[stage], te_s[stage]

    def total_forward_steps(self) -> int:
        dpss = self.num_steps // self.window
        return dpss * (self.chunk_num + self.window - 1 - self.chunk_offset)

    def warm_step_variants(self) -> int:
        """Compile every jitted step variant of this walk ONCE on throwaway
        buffers (the step fns donate xs/cache, so real state is untouched).
        A timed walk afterwards measures pure steady state: without this,
        late-appearing variants (the extra-chunk didx==0 steps occur once
        per stage) would pay their jit compile inside the measurement.
        Returns the number of variants compiled."""
        if self.host_mode:
            return 0  # streamed mode: per-layer fns compile on first use
        rc, ec, inp = self.config.runtime_config, self.config.engine_config, self.inp
        # chain the warm calls through the sampler's OWN xs/cache buffers
        # (each call donates them and returns same-shaped outputs) — a
        # fresh cache per variant would hold several multi-GB buffers in
        # flight at once and OOM HBM; pristine state is rebuilt after.
        xs, cache = self.xs, self.cache
        self.xs = self.cache = None
        seen = set()
        for step in range(self.total_forward_steps()):
            p = self._plan(step)
            key = (p["n_den"], p["extra"], p["use_prefix"], p["distill_nearly"])
            if key in seen:
                continue
            seen.add(key)
            n_den, extra, n_seg = p["n_den"], p["extra"], p["n_seg"]
            # synthetic sp/ranges: only shapes + statics drive compilation,
            # values just have to stay inside the cache/current-kv buffers
            kv_s = np.zeros(n_seg, np.int32)
            kv_e = (np.arange(n_seg, dtype=np.int32) + 1) * self.ctn
            if rc.cfg_number == 3:
                ps, ts_ = self._cfg_scales(p["tvec_padded"][-n_den:])
                xs, cache = self._jit_cfg3(
                    self.params, xs, cache, jnp.int32(0), jnp.int32(0),
                    self._text_embs, jnp.asarray(p["y_lens_win"]), inp.null_emb,
                    jnp.int32(inp.null_len), jnp.asarray(p["tvec"]),
                    jnp.asarray(kv_s), jnp.asarray(kv_e), jnp.asarray(p["dt"]),
                    jnp.asarray(ps), jnp.asarray(ts_), self.prefix_buf,
                    jnp.int32(self.prefix_len), n_den=n_den, extra=extra,
                    use_prefix=p["use_prefix"], pack=ec.pack_uncond,
                )
            else:
                dfac = (
                    sched.distill_dt_factor(self.num_steps, float(self.interval[p["didx"]]))
                    if ec.distill else 0.0
                )
                xs, cache = self._jit_cfg1(
                    self.params, xs, cache, jnp.int32(0), jnp.int32(0),
                    self._text_embs, jnp.asarray(p["y_lens_win"]), inp.null_emb,
                    jnp.int32(inp.null_len), jnp.asarray(p["tvec"]),
                    jnp.asarray(kv_s), jnp.asarray(kv_e), jnp.asarray(p["dt"]),
                    jnp.float32(dfac), jnp.float32(inp.prev_chunks_scale),
                    self.prefix_buf, jnp.int32(self.prefix_len), n_den=n_den,
                    extra=extra, use_prefix=p["use_prefix"],
                    distill_nearly=p["distill_nearly"],
                )
        # rebuild pristine state (delete first: never two caches alive)
        del xs, cache
        from magi_tpu.parallel.mesh import shard_kv_cache

        self.cache = shard_kv_cache(init_kv_cache(self.config, self._cache_tokens))
        self.xs = jax.random.normal(self._init_key, inp.latent_size, dtype=jnp.float32)
        self._warmed = False  # prefix warmup state was part of the chain
        # Warm the emit path too: each chunk's static slice offsets are a
        # distinct jitted slice program, and the FIRST _emit additionally
        # initializes the large-D2H transfer path — unwarmed, the walk's
        # first emit step pays ~5s one-time (the round-4 "bf16 w4
        # 5.8-11.0s spread": per-step forensics showed every step tight
        # except exactly step 63, the first emit).  Read-only on xs.
        for ci in range(self.chunk_offset, inp.chunk_num):
            self._emit(ci)
        return len(seen)

    def _cfg_scales(self, cfg_t: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Per-chunk CFG scales via t-range lookup (ref: dit_model.py:496-499)."""
        rc = self.config.runtime_config
        rng = np.asarray(rc.cfg_t_range, np.float32) - 1e-7
        idx = np.searchsorted(rng, cfg_t) - 1
        assert idx.min() >= 0 and idx.max() < len(rc.prev_chunk_scales)
        return (
            np.asarray(rc.prev_chunk_scales, np.float32)[idx],
            np.asarray(rc.text_scales, np.float32)[idx],
        )

    # ----- the walk -------------------------------------------------------

    def walk(self) -> Generator[Tuple[int, np.ndarray], None, None]:
        """Yields (chunk_idx, clean latent [C, <=cw, H, W]) as chunks finish
        (ref: video_generate.py:721-754)."""
        self.prepare()
        for step in range(self.total_forward_steps()):
            emitted = self.do_step(step)
            if emitted is not None:
                yield emitted

    def prepare(self) -> None:
        if self.chunk_offset > 0 and not getattr(self, "_warmed", False):
            self._run_prefix_warmup()
            self._warmed = True

    def _plan(self, step: int) -> dict:
        """Pure host arithmetic for one step (schedule, ranges, flags) —
        shared by do_step and warm_step_variants; touches no device state."""
        rc, ec = self.config.runtime_config, self.config.engine_config
        dpss, didx, c_start, c_end, t_start, t_end = self._status(step)
        n_den = c_end - c_start
        extra = bool(c_start > self.chunk_offset and didx == 0)
        sp = c_start - int(extra)
        n_seg = n_den + int(extra)

        tvec = sched.get_timestep(
            self.t_total, dpss, t_start, t_end, didx, clean_t=rc.clean_t if extra else None
        )
        steps_of_chunks = sched.denoise_step_of_each_chunk(
            dpss, t_start, t_end, didx, num_steps=self.num_steps if extra else None
        )
        kv_start, kv_end = kvr.denoising_kvrange(
            rc, sp, n_seg, steps_of_chunks, self.num_steps, self.ctn
        )
        t_before = sched.get_timestep(self.t_total, dpss, t_start, t_end, didx)
        t_after = sched.get_timestep(self.t_total, dpss, t_start, t_end, didx + 1)
        dt = (t_after - t_before).astype(np.float32)

        # caption windows (host-side numpy lengths; device arrays sliced in-jit)
        # [..., window] — leading request axis when dp-batched
        y_lens_win = self._lens_eff[..., c_start:c_end]

        use_prefix = self.prefix_len > 0
        # mirror prefix padding's t override on host for flag decisions
        # (ref: flag computed AFTER try_pad, video_generate.py:646-655)
        tvec_padded = tvec.copy()
        if use_prefix:
            nclean = max(self.prefix_len - sp * self.cw, 0) // self.cw
            tvec_padded[:nclean] = 1.0

        distill_nearly = False
        if rc.cfg_number == 1:
            nearly_clean_t = float(tvec_padded[int(extra)])
            distill_nearly = bool(nearly_clean_t > ec.distill_nearly_clean_chunk_threshold)

        return dict(
            didx=didx, c_start=c_start, c_end=c_end, n_den=n_den, extra=extra,
            sp=sp, n_seg=n_seg, tvec=tvec, tvec_padded=tvec_padded,
            kv_start=kv_start, kv_end=kv_end, dt=dt, y_lens_win=y_lens_win,
            use_prefix=use_prefix, distill_nearly=distill_nearly,
        )

    def do_step(self, step: int) -> Optional[Tuple[int, np.ndarray]]:
        """Run ONE denoise step; returns (chunk_idx, latent) if a chunk
        finished (the WorkStatus unit of the reference's work queue,
        ref: video_generate.py:237-240)."""
        rc, ec = self.config.runtime_config, self.config.engine_config
        inp = self.inp
        p = self._plan(step)
        didx, c_start, c_end = p["didx"], p["c_start"], p["c_end"]
        n_den, extra, sp, n_seg = p["n_den"], p["extra"], p["sp"], p["n_seg"]
        tvec, tvec_padded = p["tvec"], p["tvec_padded"]
        kv_start, kv_end, dt = p["kv_start"], p["kv_end"], p["dt"]
        y_lens_win, use_prefix = p["y_lens_win"], p["use_prefix"]
        distill_nearly = p["distill_nearly"]

        # slide the cache window forward if this step would overflow it
        need_hi = sp + n_seg
        new_base = max(0, need_hi - self.cache_chunks)
        if new_base > self.cache_base:
            shift = new_base - self.cache_base
            self.cache = self._jit_roll(self.cache, jnp.int32(shift * self.ctn))
            self.cache_base = new_base
        kv_start_r = kv_start - self.cache_base * self.ctn
        kv_end_r = kv_end - self.cache_base * self.ctn
        assert kv_start_r.min() >= 0, (
            f"kv range {kv_start.min()} fell behind the sliding cache window "
            f"(base {self.cache_base}); widen cache_chunks"
        )
        cache_sp = sp - self.cache_base

        if self.host_mode:
            self._do_step_streamed(
                sp, y_lens_win, tvec, tvec_padded, kv_start_r, kv_end_r, dt, didx,
                n_den, extra, use_prefix, distill_nearly,
            )
        elif rc.cfg_number == 3:
            ps, ts_ = self._cfg_scales(tvec_padded[-n_den:])
            self.xs, self.cache = self._jit_cfg3(
                self.params,
                self.xs,
                self.cache,
                jnp.int32(sp),
                jnp.int32(cache_sp),
                self._text_embs,
                jnp.asarray(y_lens_win),
                inp.null_emb,
                jnp.int32(inp.null_len),
                jnp.asarray(tvec),
                jnp.asarray(kv_start_r),
                jnp.asarray(kv_end_r),
                jnp.asarray(dt),
                jnp.asarray(ps),
                jnp.asarray(ts_),
                self.prefix_buf,
                jnp.int32(self.prefix_len),
                n_den=n_den,
                extra=extra,
                use_prefix=use_prefix,
                pack=ec.pack_uncond,
            )
        elif rc.cfg_number == 1:
            dfac = (
                sched.distill_dt_factor(self.num_steps, float(self.interval[didx]))
                if ec.distill
                else 0.0
            )
            self.xs, self.cache = self._jit_cfg1(
                self.params,
                self.xs,
                self.cache,
                jnp.int32(sp),
                jnp.int32(cache_sp),
                self._text_embs,
                jnp.asarray(y_lens_win),
                inp.null_emb,
                jnp.int32(inp.null_len),
                jnp.asarray(tvec),
                jnp.asarray(kv_start_r),
                jnp.asarray(kv_end_r),
                jnp.asarray(dt),
                jnp.float32(dfac),
                jnp.float32(inp.prev_chunks_scale),
                self.prefix_buf,
                jnp.int32(self.prefix_len),
                n_den=n_den,
                extra=extra,
                use_prefix=use_prefix,
                distill_nearly=distill_nearly,
            )
        else:
            raise NotImplementedError(f"cfg_number={rc.cfg_number}")

        # bookkeeping + emission (ref: video_generate.py:693-719)
        for ci in range(c_start, c_end):
            self.counts[ci] += 1
        if self.counts[c_start] == self.num_steps:
            chunk = self._emit(c_start)
            if chunk is not None:
                return c_start - self.chunk_offset, chunk
        return None

    # ----- host-offloaded KV streaming (kv_offload + default kv ranges) --

    def _streamed_forward(self, x_in, t_in, y_in, dropout, meta, t_off, dfac=None):
        """dit_forward with the layer loop on host: per-layer cache slabs
        stream host<->HBM around dit_layer_step (see HostKVCache)."""
        sj = self._stream
        df = jnp.float32(0.0 if dfac is None else dfac)
        h, cond, yx, sin, cos = sj["prologue"](
            self.params, x_in, t_in, y_in, jnp.asarray(dropout), meta, t_off, df
        )
        hc = self.host_cache
        hc.prefetch(0)
        for l in range(hc.num_layers):
            cache_l = hc.fetch(l)
            h, new_cl = sj["layer"](
                self.params, jnp.int32(l), h, cache_l, cond, yx, sin, cos, meta
            )
            if meta.update_kv_cache:
                hc.store(l, new_cl)
        Tp = meta.n_segments * self.chunk_patches
        return sj["epilogue"](self.params, h, Tp, self.HP, self.WP)

    def _do_step_streamed(
        self, sp, y_lens_win, tvec, tvec_padded, kv_start_r, kv_end_r, dt, didx,
        n_den, extra, use_prefix, distill_nearly,
    ):
        """One denoise step in host-offload mode: same math as
        _cfg3_step/_cfg1_step, restructured as jitted assembly + N streamed
        layer applications + jitted combine (cache_base is always 0 here —
        the full-history cache lives on host)."""
        rc, ec, inp = self.config.runtime_config, self.config.engine_config, self.inp
        sj = self._stream
        n_seg = n_den + int(extra)
        ctn = self.ctn
        stat = dict(n_den=n_den, extra=extra, use_prefix=use_prefix)
        if rc.cfg_number == 3:
            ps, ts_ = self._cfg_scales(tvec_padded[-n_den:])
            (x_chunk, tvec2, y_text, lens_text, y_null, lens_null, t_off,
             x_den, t_den) = sj["pre3"](
                self.xs, jnp.int32(sp), self._text_embs, jnp.asarray(y_lens_win),
                inp.null_emb, jnp.int32(inp.null_len), jnp.asarray(tvec),
                self.prefix_buf, jnp.int32(self.prefix_len), **stat,
            )
            meta1 = _meta(n_seg, ctn, self.HP, self.WP, sp, kv_start_r, kv_end_r,
                          lens_text, update=False, use_cache=True, extra=extra)
            v1 = self._streamed_forward(x_chunk, tvec2, y_text, False, meta1, t_off)
            v3 = sj["uncond"](self.params, x_den, t_den, y_null, lens_null, n_den=n_den)
            meta2 = _meta(n_seg, ctn, self.HP, self.WP, sp, kv_start_r, kv_end_r,
                          lens_null, update=True, use_cache=True, extra=extra)
            v2 = self._streamed_forward(x_chunk, tvec2, y_null, True, meta2, t_off)
            self.xs = sj["combine3"](
                self.xs, x_chunk, v1, v2, v3, jnp.asarray(dt), jnp.asarray(ps),
                jnp.asarray(ts_), jnp.int32(sp), n_den=n_den, extra=extra,
            )
        elif rc.cfg_number == 1:
            dfac = (
                sched.distill_dt_factor(self.num_steps, float(self.interval[didx]))
                if ec.distill else None
            )
            pre = sj["pre1"](
                self.xs, jnp.int32(sp), self._text_embs, jnp.asarray(y_lens_win),
                inp.null_emb, jnp.int32(inp.null_len), jnp.asarray(tvec),
                self.prefix_buf, jnp.int32(self.prefix_len),
                distill_nearly=distill_nearly, **stat,
            )
            if distill_nearly:
                x_chunk, t_in, y_in, lens_in, t_off_in, x_in = pre
                vmax = (sp + n_seg) * ctn
                kv_s = np.concatenate([np.asarray(kv_start_r), [vmax]]).astype(np.int32)
                kv_e = np.concatenate([np.asarray(kv_end_r), [vmax + ctn]]).astype(np.int32)
                meta = _meta(n_seg + 1, ctn, self.HP, self.WP, sp, kv_s, kv_e, lens_in,
                             update=True, use_cache=True, extra=extra, distill_nearly=True)
            else:
                x_chunk, t_in, y_in, lens_in, t_off_in = pre
                x_in = x_chunk
                meta = _meta(n_seg, ctn, self.HP, self.WP, sp, kv_start_r, kv_end_r,
                             lens_in, update=True, use_cache=True, extra=extra)
            out = self._streamed_forward(x_in, t_in, y_in, False, meta, t_off_in, dfac=dfac)
            self.xs = sj["post1"](
                self.xs, x_chunk, out, jnp.asarray(dt),
                jnp.float32(inp.prev_chunks_scale), jnp.int32(sp),
                n_den=n_den, extra=extra, distill_nearly=distill_nearly,
            )
        else:
            raise NotImplementedError(f"cfg_number={rc.cfg_number}")

    # When True, _emit returns the chunk as a DEVICE array (an async-
    # dispatched slice into a fresh buffer — safe across the next step's
    # donation) instead of blocking the host on np.asarray until the whole
    # device queue drains.  walk_many sets this so one request's decode /
    # host transfer can overlap another's denoise dispatch.
    emit_device = False

    def _emit(self, chunk_idx: int) -> Optional[np.ndarray]:
        cw = self.cw
        to_host = (lambda a: a) if self.emit_device else np.asarray
        lo, hi = chunk_idx * cw, (chunk_idx + 1) * cw
        # `...` keeps this valid under the dp-batched subclass ([R, C, T, H, W])
        if self.prefix_len > 0:
            if hi <= self.prefix_len:
                return None
            real_start = max(lo, self.prefix_len)
            # Keep the first 4-frames only for I2V (ref: video_generate.py:708-710)
            if chunk_idx == 0 and self.prefix_len == 1:
                real_start = 0
            return to_host(self.xs[..., real_start:hi, :, :])
        return to_host(self.xs[..., lo:hi, :, :])

    def _run_prefix_warmup(self) -> None:
        """Write the prefix video's clean KV into the cache
        (ref: extract_prefix_video_feature, video_generate.py:389-433)."""
        print_rank_0(f"extract clean feature for prefix video, chunk_offset: {self.chunk_offset}")
        rc, ec = self.config.runtime_config, self.config.engine_config
        n = self.chunk_offset
        kv_s, kv_e = kvr.prefix_kvrange(rc, n, self.ctn)
        dfac = (
            sched.distill_dt_factor(self.num_steps, float(self.interval[0])) if ec.distill else 0.0
        )
        if self.host_mode:
            L = self.inp.null_emb.shape[0]
            y = jnp.broadcast_to(
                self.inp.null_emb[None], (n, L, self.inp.null_emb.shape[-1])
            )
            meta = _meta(
                n, self.ctn, self.HP, self.WP, 0, kv_s, kv_e,
                np.full((n,), self.inp.null_len, np.int32),
                update=True, use_cache=True,
            )
            t = jnp.full((n,), rc.clean_t, jnp.float32)
            t_off = jnp.arange(n, dtype=jnp.int32) * self.chunk_patches
            self._streamed_forward(
                self.prefix_buf[..., : n * self.cw, :, :], t, y, True, meta, t_off,
                dfac=dfac if ec.distill else None,
            )
            return
        self.cache = self._jit_warmup(
            self.params,
            self.cache,
            self.prefix_buf[..., : n * self.cw, :, :],
            self.inp.null_emb,
            jnp.int32(self.inp.null_len),
            jnp.asarray(kv_s),
            jnp.asarray(kv_e),
            jnp.float32(rc.clean_t),
            jnp.float32(dfac),
            n_chunks=n,
        )


# ---------------------------------------------------------------------------
# jitted device steps
# ---------------------------------------------------------------------------


def _slice_window(xs, sp, n_seg, cw):
    C, T, H, W = xs.shape
    return jax.lax.dynamic_slice(xs, (0, sp * cw, 0, 0), (C, n_seg * cw, H, W))


def _apply_prefix(x_chunk, tvec, prefix_buf, prefix_len, sp, cw, n_seg):
    """Paste prefix-video latents over the window and mark fully-covered
    chunks clean, t=1.0 (ref: try_pad_prefix_video, video_generate.py:435-452)."""
    C, Tw, H, W = x_chunk.shape
    start_f = sp * cw
    pwin = jax.lax.dynamic_slice(prefix_buf, (0, start_f, 0, 0), (C, Tw, H, W))
    fidx = start_f + jnp.arange(Tw)
    x_chunk = jnp.where((fidx < prefix_len)[None, :, None, None], pwin, x_chunk)
    nclean = jnp.maximum(prefix_len - start_f, 0) // cw
    tvec = jnp.where(jnp.arange(n_seg) < nclean, 1.0, tvec)
    return x_chunk, tvec


def _build_y(caption_embs, null_emb, null_len, y_lens_win, sp, extra, n_den, L):
    """Assemble per-segment captions: optional leading clean chunk gets the
    null caption (ref: video_generate.py:614-625)."""
    c_start = sp + (1 if extra else 0)
    y_win = jax.lax.dynamic_slice(
        caption_embs, (c_start, 0, 0), (n_den,) + caption_embs.shape[1:]
    )
    if extra:
        y = jnp.concatenate([null_emb[None], y_win], axis=0)
        lens = jnp.concatenate([jnp.asarray([null_len], jnp.int32), y_lens_win])
    else:
        y, lens = y_win, y_lens_win
    return y, lens


def _integrate_and_store(xs, x_chunk_den, velocity, dt, c_start, cw, n_den):
    """Per-chunk Euler step x += v*dt, written back into the latent state
    (ref: integrate, video_generate.py:529-549)."""
    C, Tw, H, W = x_chunk_den.shape
    v = velocity.reshape(C, n_den, cw, H, W)
    x = x_chunk_den.reshape(C, n_den, cw, H, W)
    x = x + v * dt[None, :, None, None, None]
    x = x.reshape(C, Tw, H, W)
    return jax.lax.dynamic_update_slice(xs, x, (0, c_start * cw, 0, 0))


def _cfg3_step(
    config,
    params,
    xs,
    cache,
    sp,
    cache_sp,
    caption_embs,
    y_lens_win,
    null_emb,
    null_len,
    tvec,
    kv_start,
    kv_end,
    dt,
    ps,
    ts_,
    prefix_buf,
    prefix_len,
    *,
    n_den: int,
    extra: bool,
    use_prefix: bool,
    pack: bool = True,
):
    """One denoise step with 3-branch CFG (ref: dit_model.py:400-537).
    pack=True fuses the uncond branch into the text forward (2 launches);
    pack=False mirrors the reference's 3 separate forwards (lower peak
    activation memory)."""
    mc, rc = config.model_config, config.runtime_config
    cw = rc.chunk_width
    n_seg = n_den + int(extra)
    HP = xs.shape[2] // mc.patch_size
    WP = xs.shape[3] // mc.patch_size
    chunk_patches = cw // mc.t_patch_size
    ctn = chunk_patches * HP * WP
    L = caption_embs.shape[1]

    x_chunk = _slice_window(xs, sp, n_seg, cw)
    if use_prefix:
        x_chunk, tvec = _apply_prefix(x_chunk, tvec, prefix_buf, prefix_len, sp, cw, n_seg)

    y_text, lens_text = _build_y(caption_embs, null_emb, null_len, y_lens_win, sp, extra, n_den, L)
    y_null = jnp.broadcast_to(null_emb[None], (n_seg, L, null_emb.shape[-1]))
    lens_null = jnp.full((n_seg,), null_len, jnp.int32)

    t_off = (sp + jnp.arange(n_seg, dtype=jnp.int32)) * chunk_patches
    dw = n_den * cw

    if pack:
        # --- forward A: text-conditioned + unconditional branches PACKED
        # into one forward (ref runs them separately: dit_model.py:413-423,
        # 447-492).  The uncond "chunks->batch" reshape is just n_den extra
        # segments with self-only kv-ranges, null captions, per-segment
        # caption dropout, and temporal offsets restarting at 0.  No cache
        # write.  cache addressing uses cache_sp (window-relative under the
        # sliding cache); rope offsets keep the absolute sp. ---
        x_cat = jnp.concatenate([x_chunk, x_chunk[:, -dw:]], axis=1)
        t_cat = jnp.concatenate([tvec, tvec[-n_den:]])
        y_cat = jnp.concatenate([y_text, y_null[:n_den]], axis=0)
        lens_cat = jnp.concatenate([lens_text, lens_null[:n_den]])
        # uncond segments' kv land in the view right after the window's
        u0 = (cache_sp + n_seg) * ctn
        u_start = u0 + jnp.arange(n_den, dtype=jnp.int32) * ctn
        kv_start_cat = jnp.concatenate([kv_start, u_start])
        kv_end_cat = jnp.concatenate([kv_end, u_start + ctn])
        t_off_cat = jnp.concatenate([t_off, jnp.zeros(n_den, jnp.int32)])
        dropout_cat = jnp.concatenate([jnp.zeros(n_seg, bool), jnp.ones(n_den, bool)])

        meta_a = _meta(
            n_seg + n_den, ctn, HP, WP, cache_sp, kv_start_cat, kv_end_cat, lens_cat,
            update=False, use_cache=True, extra=extra,
        )
        va, _ = dit_forward(params, config, x_cat, t_cat, y_cat, dropout_cat, cache, meta_a, t_off_cat)
        v1 = va[:, : n_seg * cw]
        v3 = va[:, n_seg * cw :]
    else:
        # branch 1: cond on prev + text (no cache write, ref: dit_model.py:413-423)
        meta1 = _meta(
            n_seg, ctn, HP, WP, cache_sp, kv_start, kv_end, lens_text,
            update=False, use_cache=True, extra=extra,
        )
        v1, _ = dit_forward(params, config, x_chunk, tvec, y_text, jnp.asarray(False), cache, meta1, t_off)

        # branch 3: unconditional — self-only ranges, fresh positions, no cache
        # (ref: dit_model.py:447-492; chunks->batch becomes just different ranges)
        u_start, u_end = kvr.self_only_kvrange(n_den, ctn)
        meta3 = _meta(
            n_den, ctn, HP, WP, 0, u_start, u_end, lens_null[:n_den],
            update=False, use_cache=False,
        )
        # zero-token cache (works for the int8-stored dict cache too: the
        # scale leaf [L,2,G,tok] truncates the same token axis)
        empty_cache = jax.tree.map(
            lambda c: jnp.zeros(c.shape[:3] + (0,) + c.shape[4:], c.dtype), cache
        )
        v3, _ = dit_forward(
            params, config, x_chunk[:, -dw:], tvec[-n_den:], y_null[:n_den], jnp.asarray(True),
            empty_cache, meta3,
            jnp.zeros(n_den, jnp.int32),
        )

    # --- forward B: cond on prev, null caption — writes the cache
    # (ref: dit_model.py:425-435) ---
    meta2 = _meta(n_seg, ctn, HP, WP, cache_sp, kv_start, kv_end, lens_null, update=True, use_cache=True, extra=extra)
    v2, cache = dit_forward(params, config, x_chunk, tvec, y_null, jnp.asarray(True), cache, meta2, t_off)

    # combine (ref: dit_model.py:520-533)
    def per_chunk(o):
        return o.reshape(o.shape[0], n_den, cw, *o.shape[2:])

    c1 = per_chunk(v1[:, -dw:])
    c2 = per_chunk(v2[:, -dw:])
    u = per_chunk(v3)
    scale_p = ps[None, :, None, None, None]
    scale_t = ts_[None, :, None, None, None]
    velocity = (1 - scale_p) * u + (scale_p - scale_t) * c2 + scale_t * c1
    velocity = velocity.reshape(velocity.shape[0], dw, *velocity.shape[3:])

    c_start = sp + int(extra)
    xs = _integrate_and_store(xs, x_chunk[:, -dw:], velocity, dt, jnp.int32(c_start), cw, n_den)
    return xs, cache


def _cfg1_step(
    config,
    params,
    xs,
    cache,
    sp,
    cache_sp,
    caption_embs,
    y_lens_win,
    null_emb,
    null_len,
    tvec,
    kv_start,
    kv_end,
    dt,
    distill_factor,
    prev_chunks_scale,
    prefix_buf,
    prefix_len,
    *,
    n_den: int,
    extra: bool,
    use_prefix: bool,
    distill_nearly: bool,
):
    """One denoise step, single-branch (distill/quant) CFG
    (ref: dit_model.py:538-595)."""
    mc, rc, ec = config.model_config, config.runtime_config, config.engine_config
    cw = rc.chunk_width
    n_seg = n_den + int(extra)
    HP = xs.shape[2] // mc.patch_size
    WP = xs.shape[3] // mc.patch_size
    chunk_patches = cw // mc.t_patch_size
    ctn = chunk_patches * HP * WP
    L = caption_embs.shape[1]

    x_chunk = _slice_window(xs, sp, n_seg, cw)
    if use_prefix:
        x_chunk, tvec = _apply_prefix(x_chunk, tvec, prefix_buf, prefix_len, sp, cw, n_seg)

    y_text, lens_text = _build_y(caption_embs, null_emb, null_len, y_lens_win, sp, extra, n_den, L)
    t_off = (sp + jnp.arange(n_seg, dtype=jnp.int32)) * chunk_patches
    dfac = distill_factor if ec.distill else None

    if distill_nearly:
        # ride-along copy of the nearly-clean chunk conditioned on text only
        # (ref: dit_model.py:544-577)
        ss = 1 if extra else 0
        x_nc = jax.lax.dynamic_slice(
            x_chunk, (0, ss * cw, 0, 0), (x_chunk.shape[0], cw) + x_chunk.shape[2:]
        )
        x_cat = jnp.concatenate([x_chunk, x_nc], axis=1)
        vmax = (cache_sp + n_seg) * ctn
        kv_start_cat = jnp.concatenate([kv_start, jnp.asarray([vmax], jnp.int32)])
        kv_end_cat = jnp.concatenate([kv_end, jnp.asarray([vmax + ctn], jnp.int32)])
        t_cat = jnp.concatenate([tvec, tvec[ss : ss + 1]])
        y_cat = jnp.concatenate([y_text, y_text[ss : ss + 1]], axis=0)
        lens_cat = jnp.concatenate([lens_text, lens_text[ss : ss + 1]])
        t_off_cat = jnp.concatenate([t_off, jnp.asarray([(sp + n_seg) * chunk_patches], jnp.int32)])

        meta = _meta(
            n_seg + 1, ctn, HP, WP, cache_sp, kv_start_cat, kv_end_cat, lens_cat,
            update=True, use_cache=True, extra=extra, distill_nearly=True,
        )
        out_cat, cache = dit_forward(
            params, config, x_cat, t_cat, y_cat, jnp.asarray(False), cache, meta, t_off_cat,
            distill_factor=dfac,
        )
        near_pre_text = out_cat[:, ss * cw : (ss + 1) * cw]
        near_text = out_cat[:, -cw:]
        blended = near_pre_text * prev_chunks_scale + near_text * (1 - prev_chunks_scale)
        out = out_cat[:, : n_seg * cw]
        out = jax.lax.dynamic_update_slice(out, blended, (0, ss * cw, 0, 0))
    else:
        meta = _meta(
            n_seg, ctn, HP, WP, cache_sp, kv_start, kv_end, lens_text,
            update=True, use_cache=True, extra=extra,
        )
        out, cache = dit_forward(
            params, config, x_chunk, tvec, y_text, jnp.asarray(False), cache, meta, t_off,
            distill_factor=dfac,
        )

    dw = n_den * cw
    velocity = out[:, -dw:]
    c_start = sp + int(extra)
    xs = _integrate_and_store(xs, x_chunk[:, -dw:], velocity, dt, jnp.int32(c_start), cw, n_den)
    return xs, cache


def _prefix_warmup_step(
    config,
    params,
    cache,
    prefix_latent,  # [C, n_chunks*cw, H, W]
    null_emb,
    null_len,
    kv_start,
    kv_end,
    clean_t,
    distill_factor,
    *,
    n_chunks: int,
):
    """Forward the clean prefix chunks once to populate the KV cache
    (ref: extract_prefix_video_feature, video_generate.py:389-433)."""
    mc, rc, ec = config.model_config, config.runtime_config, config.engine_config
    cw = rc.chunk_width
    HP = prefix_latent.shape[2] // mc.patch_size
    WP = prefix_latent.shape[3] // mc.patch_size
    chunk_patches = cw // mc.t_patch_size
    ctn = chunk_patches * HP * WP
    L = null_emb.shape[0]

    y = jnp.broadcast_to(null_emb[None], (n_chunks, L, null_emb.shape[-1]))
    lens = jnp.full((n_chunks,), null_len, jnp.int32)
    t = jnp.full((n_chunks,), clean_t, jnp.float32)
    t_off = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_patches
    meta = _meta(n_chunks, ctn, HP, WP, 0, kv_start, kv_end, lens, update=True, use_cache=True)
    dfac = distill_factor if ec.distill else None
    _, cache = dit_forward(
        params, config, prefix_latent, t, y, jnp.asarray(True), cache, meta, t_off,
        distill_factor=dfac,
    )
    return cache


# ---------------------------------------------------------------------------
# Host-offloaded KV cache (the reference's pinned-CPU kv_offload,
# ref: dit_module.py:800-819).  With DEFAULT kv ranges every chunk attends
# ALL previous chunks, so no sliding device window can bound HBM; instead
# the full cache lives in host RAM (video length bounded by host memory,
# not HBM) and each layer's slab streams host<->HBM just-in-time around a
# per-layer jit — a python loop replaces the lax.scan.  Single chip only
# (on a mesh the cache shards 1/(cp*pp*tp), which is the scaling answer).
# ---------------------------------------------------------------------------


class HostKVCache:
    """Host-RAM KV cache with per-layer double-buffered streaming: layer
    l+1's upload is dispatched before layer l's compute result is read, so
    the host->HBM copy rides behind the MXU work."""

    def __init__(self, config: MagiConfig, max_tokens: int):
        import ml_dtypes

        from magi_tpu.models.dit.model import _attn_int8_store

        shape = kv_cache_shape(config, max_tokens)  # [L, 2, hk, tok, hd]
        if _attn_int8_store():
            # int8 attention mode: host buffers hold the quantized cache —
            # half the host RAM AND half the host<->HBM streaming bytes
            # (the bottleneck of this mode); layer slabs are {kv, scale}
            # dicts, same structure as the in-HBM int8-stored cache
            self.buf = {
                "kv": np.zeros(shape, np.int8),
                "scale": np.zeros(shape[:-1], np.float32),
            }
        else:
            dt = config.model_config.params_dtype
            np_dt = ml_dtypes.bfloat16 if dt == jnp.bfloat16 else np.dtype(dt)
            self.buf = np.zeros(shape, np_dt)
        self._inflight: dict = {}

    @property
    def num_layers(self) -> int:
        return jax.tree_util.tree_leaves(self.buf)[0].shape[0]

    def prefetch(self, l: int) -> None:
        if 0 <= l < self.num_layers and l not in self._inflight:
            self._inflight[l] = jax.device_put(
                jax.tree.map(lambda b: b[l], self.buf)
            )

    def fetch(self, l: int):
        self.prefetch(l)
        self.prefetch(l + 1)  # overlap the next upload with this layer's compute
        return self._inflight.pop(l)

    def store(self, l: int, dev_slab) -> None:
        if isinstance(self.buf, dict):
            for k2 in self.buf:
                self.buf[k2][l] = np.asarray(dev_slab[k2])
        else:
            self.buf[l] = np.asarray(dev_slab)


def _s_pre3(config, xs, sp, caption_embs, y_lens_win, null_emb, null_len, tvec,
            prefix_buf, prefix_len, *, n_den, extra, use_prefix):
    """In-jit assembly prefix of the streamed 3-CFG step: window slice +
    prefix paste + caption assembly (mirrors _cfg3_step's head)."""
    mc, rc = config.model_config, config.runtime_config
    cw = rc.chunk_width
    n_seg = n_den + int(extra)
    L = caption_embs.shape[1]
    x_chunk = _slice_window(xs, sp, n_seg, cw)
    if use_prefix:
        x_chunk, tvec = _apply_prefix(x_chunk, tvec, prefix_buf, prefix_len, sp, cw, n_seg)
    y_text, lens_text = _build_y(caption_embs, null_emb, null_len, y_lens_win, sp, extra, n_den, L)
    y_null = jnp.broadcast_to(null_emb[None], (n_seg, L, null_emb.shape[-1]))
    lens_null = jnp.full((n_seg,), null_len, jnp.int32)
    chunk_patches = cw // mc.t_patch_size
    t_off = (sp + jnp.arange(n_seg, dtype=jnp.int32)) * chunk_patches
    dw = n_den * cw
    return (x_chunk, tvec, y_text, lens_text, y_null, lens_null, t_off,
            x_chunk[:, -dw:], tvec[-n_den:])


def _s_uncond(config, params, x_den, t_den, y_null, lens_null, *, n_den):
    """Unconditional CFG branch as ONE plain jit (it never touches the big
    cache — self-only ranges, fresh positions; ref: dit_model.py:447-492),
    so the streamed path only streams the two cache-touching forwards."""
    mc, rc = config.model_config, config.runtime_config
    cw = rc.chunk_width
    HP = x_den.shape[2] // mc.patch_size
    WP = x_den.shape[3] // mc.patch_size
    ctn = (cw // mc.t_patch_size) * HP * WP
    y_null_den, lens_null_den = y_null[:n_den], lens_null[:n_den]
    u_start, u_end = kvr.self_only_kvrange(n_den, ctn)
    meta3 = _meta(n_den, ctn, HP, WP, 0, u_start, u_end, lens_null_den,
                  update=False, use_cache=False)
    dummy = jnp.zeros(
        (mc.num_layers, 2, mc.num_query_groups, 0, mc.kv_channels), mc.params_dtype
    )
    v3, _ = dit_forward(params, config, x_den, t_den, y_null_den, jnp.asarray(True),
                        dummy, meta3, jnp.zeros(n_den, jnp.int32))
    return v3


def _s_combine3(config, xs, x_chunk, v1, v2, v3, dt, ps, ts_, sp, *, n_den, extra):
    """CFG combine + Euler integrate tail (mirrors _cfg3_step's tail)."""
    rc = config.runtime_config
    cw = rc.chunk_width
    dw = n_den * cw

    def per_chunk(o):
        return o.reshape(o.shape[0], n_den, cw, *o.shape[2:])

    c1 = per_chunk(v1[:, -dw:])
    c2 = per_chunk(v2[:, -dw:])
    u = per_chunk(v3)
    scale_p = ps[None, :, None, None, None]
    scale_t = ts_[None, :, None, None, None]
    velocity = (1 - scale_p) * u + (scale_p - scale_t) * c2 + scale_t * c1
    velocity = velocity.reshape(velocity.shape[0], dw, *velocity.shape[3:])
    c_start = sp + int(extra)
    return _integrate_and_store(xs, x_chunk[:, -dw:], velocity, dt, jnp.int32(c_start), cw, n_den)


def _s_pre1(config, xs, sp, caption_embs, y_lens_win, null_emb, null_len, tvec,
            prefix_buf, prefix_len, *, n_den, extra, use_prefix, distill_nearly):
    """Assembly prefix of the streamed 1-CFG step, incl. the distill
    nearly-clean ride-along concat (mirrors _cfg1_step's head)."""
    mc, rc = config.model_config, config.runtime_config
    cw = rc.chunk_width
    n_seg = n_den + int(extra)
    L = caption_embs.shape[1]
    x_chunk = _slice_window(xs, sp, n_seg, cw)
    if use_prefix:
        x_chunk, tvec = _apply_prefix(x_chunk, tvec, prefix_buf, prefix_len, sp, cw, n_seg)
    y_text, lens_text = _build_y(caption_embs, null_emb, null_len, y_lens_win, sp, extra, n_den, L)
    chunk_patches = cw // mc.t_patch_size
    t_off = (sp + jnp.arange(n_seg, dtype=jnp.int32)) * chunk_patches
    if not distill_nearly:
        return x_chunk, tvec, y_text, lens_text, t_off
    ss = 1 if extra else 0
    x_nc = jax.lax.dynamic_slice(
        x_chunk, (0, ss * cw, 0, 0), (x_chunk.shape[0], cw) + x_chunk.shape[2:]
    )
    x_cat = jnp.concatenate([x_chunk, x_nc], axis=1)
    t_cat = jnp.concatenate([tvec, tvec[ss : ss + 1]])
    y_cat = jnp.concatenate([y_text, y_text[ss : ss + 1]], axis=0)
    lens_cat = jnp.concatenate([lens_text, lens_text[ss : ss + 1]])
    t_off_cat = jnp.concatenate([t_off, jnp.asarray([0], jnp.int32) + (sp + n_seg) * chunk_patches])
    return x_chunk, t_cat, y_cat, lens_cat, t_off_cat, x_cat


def _s_post1(config, xs, x_chunk, out, dt, prev_scale, sp, *, n_den, extra, distill_nearly):
    """Nearly-clean blend + Euler integrate tail (mirrors _cfg1_step's tail)."""
    rc = config.runtime_config
    cw = rc.chunk_width
    n_seg = n_den + int(extra)
    if distill_nearly:
        ss = 1 if extra else 0
        near_pre_text = out[:, ss * cw : (ss + 1) * cw]
        near_text = out[:, -cw:]
        blended = near_pre_text * prev_scale + near_text * (1 - prev_scale)
        out = out[:, : n_seg * cw]
        out = jax.lax.dynamic_update_slice(out, blended, (0, ss * cw, 0, 0))
    dw = n_den * cw
    velocity = out[:, -dw:]
    c_start = sp + int(extra)
    return _integrate_and_store(xs, x_chunk[:, -dw:], velocity, dt, jnp.int32(c_start), cw, n_den)


_STREAM_JIT_CACHE: dict = {}


def _stream_jits(config: MagiConfig) -> dict:
    key = _config_key(config)
    if key not in _STREAM_JIT_CACHE:
        _STREAM_JIT_CACHE[key] = {
            "prologue": jax.jit(
                lambda p, x, t, y, d, m, to, df: dit_prologue(p, config, x, t, y, d, m, to, df)
            ),
            "layer": jax.jit(
                lambda p, i, h, c, cond, yx, s, co, m: dit_layer_step(
                    p, config, i, h, c, cond, yx, s, co, m
                )
            ),
            "epilogue": jax.jit(
                lambda p, h, Tp, Hp, Wp: dit_epilogue(p, config, h, Tp, Hp, Wp),
                static_argnums=(2, 3, 4),
            ),
            "pre3": jax.jit(
                functools.partial(_s_pre3, config),
                static_argnames=("n_den", "extra", "use_prefix"),
            ),
            "uncond": jax.jit(functools.partial(_s_uncond, config), static_argnames=("n_den",)),
            "combine3": jax.jit(
                functools.partial(_s_combine3, config),
                static_argnames=("n_den", "extra"), donate_argnums=(0,),
            ),
            "pre1": jax.jit(
                functools.partial(_s_pre1, config),
                static_argnames=("n_den", "extra", "use_prefix", "distill_nearly"),
            ),
            "post1": jax.jit(
                functools.partial(_s_post1, config),
                static_argnames=("n_den", "extra", "distill_nearly"), donate_argnums=(0,),
            ),
        }
    return _STREAM_JIT_CACHE[key]


def walk_many(samplers) -> Generator[Tuple[int, int, np.ndarray], None, None]:
    """Round-robin multiple requests through their denoise steps, yielding
    (request_idx, chunk_idx, latent-on-DEVICE) — the reference's
    multi-input work queue (ref: SampleTransport.walk,
    video_generate.py:721-754; there it exists to keep PP stages busy,
    here it interleaves requests so VAE decode of one request overlaps
    denoising of another).

    Chunks are emitted as device arrays (async-dispatched slices): the
    host loop never blocks on a transfer, so the consumer can hand the
    chunk to a decode worker thread while the next request's denoise step
    dispatches — see MagiPipeline.run_text_to_video_many."""
    from queue import Queue

    queue: "Queue[Tuple[int, int]]" = Queue()
    for idx, s in enumerate(samplers):
        s.emit_device = True
        s.prepare()
        queue.put((idx, 0))
    while not queue.empty():
        idx, step = queue.get()
        s = samplers[idx]
        emitted = s.do_step(step)
        if emitted is not None:
            yield (idx,) + emitted
        if step + 1 < s.total_forward_steps():
            queue.put((idx, step + 1))
