"""User-facing pipeline (ref: inference/pipeline/pipeline.py + entry.py).

Same public surface: MagiPipeline.run_{text,image,video}_to_video(config).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from magi_tpu.core.config import MagiConfig
from magi_tpu.core.logger import print_rank_0
from magi_tpu.core.profiler import log_memory, maybe_trace
from magi_tpu.core.timer import event_path_timer
from magi_tpu.core.utils import env_is_true, set_random_seed
from magi_tpu.parallel.mesh import initialize_mesh
from magi_tpu.pipeline.prompt_process import build_inference_input, get_txt_embeddings
from magi_tpu.pipeline.video_process import post_chunk_process, process_image, process_prefix_video, save_video_to_disk
from magi_tpu.sampling.transport import ArdfSampler


def get_dit(config: MagiConfig):
    """Build + load the DiT parameters (ref: get_dit, dit_model.py:641-673).
    SKIP_LOAD_MODEL=1 gives random weights (ref: dit_model.py:602).

    Quantized execution: `fp8_quant: true` in the config (the reference's
    fp8 engine switch, ref: dit_module.py:431-487) — or MAGI_INT8=1 for
    any model — re-quantizes the big linears to int8 + per-channel scales
    and the denoise step runs int8 x int8 -> int32 on the MXU (first/last
    layers bf16, ref: dit_module.py:407)."""
    from magi_tpu.models.dit.model import init_dit_params, init_dit_params_on_device

    if env_is_true("SKIP_LOAD_MODEL"):
        print_rank_0("SKIP_LOAD_MODEL set: using random weights")
        if jax.default_backend() == "tpu":
            # generate on device: no multi-GB host->device weight upload
            params = init_dit_params_on_device(jax.random.PRNGKey(config.runtime_config.seed), config)
        else:
            params = init_dit_params(jax.random.PRNGKey(config.runtime_config.seed), config)
    else:
        from magi_tpu.checkpoint.loader import load_dit_params

        params = load_dit_params(config)
        print_rank_0("Load checkpoint successfully")
    if config.engine_config.fp8_quant or env_is_true("MAGI_INT8") or env_is_true("MAGI_INT4"):
        from magi_tpu.ops.quant import quantize_params_int4, quantize_params_int8

        if config.engine_config.quant_bits == 4 or env_is_true("MAGI_INT4"):
            params = quantize_params_int4(params)
            print_rank_0("Quantized DiT linears to nibble-packed int4 (w4a8)")
        else:
            params = quantize_params_int8(params)
            print_rank_0("Quantized DiT linears to int8 (TPU analog of fp8 execution)")
    return params


class MagiPipeline:
    def __init__(self, config_path: str):
        self.config = MagiConfig.from_json(config_path)
        self.key = set_random_seed(self.config.runtime_config.seed)
        ec = self.config.engine_config
        if ec.attn_int8:
            # config-surface switch for int8 attention; the model layer
            # reads the env (which also keys the sampler jit cache), so
            # translate before any sampler/step is built
            os.environ["MAGI_ATTN_INT8"] = "1"
        if ec.world_size > 1:
            initialize_mesh(self.config)
        # persistent jit cache (CUDA-graph analog: compile once, reuse forever)
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        print_rank_0(self.config)

    def run_text_to_video(self, prompt: str, output_path: str) -> None:
        self._run(prompt, None, output_path)

    def run_image_to_video(self, prompt: str, image_path: str, output_path: str) -> None:
        prefix_video = process_image(image_path, self.config)
        self._run(prompt, prefix_video, output_path)

    def run_video_to_video(self, prompt: str, prefix_video_path: str, output_path: str) -> None:
        prefix_video = process_prefix_video(prefix_video_path, self.config)
        self._run(prompt, prefix_video, output_path)

    def run_text_to_video_batch(self, prompts, output_paths) -> None:
        """Generate several prompts in lockstep, batched over the `dp` mesh
        axis (the reference scales request throughput with per-rank engine
        replicas, ref: parallel_state.py dp groups; here the batch axis is
        sharded P('dp') and one jitted step serves the whole batch)."""
        from magi_tpu.sampling.batched import DpBatchedSampler

        assert len(prompts) == len(output_paths) and prompts
        t0 = time.perf_counter()
        params = get_dit(self.config)
        null_caption = np.asarray(params["y_embedder"]["null_caption_embedding"], np.float32)

        inps, keys = [], []
        for i, prompt in enumerate(prompts):
            caption_embs, emb_masks = get_txt_embeddings(prompt, self.config)
            inps.append(
                build_inference_input(self.config, null_caption, caption_embs, emb_masks, None)
            )
            keys.append(jax.random.fold_in(self.key, i))

        try:
            sampler = DpBatchedSampler(self.config, params, inps, keys)
        except (AssertionError, ValueError) as e:
            # lockstep dp batching needs identical schedules/latent shapes;
            # mixed-shape batches degrade to round-robin interleaving (a
            # serving layer wanting true mixed-shape batching should bucket
            # requests by shape in front of this)
            print_rank_0(f"dp batch shapes mismatch ({e}); falling back to interleaved mode")
            return self.run_text_to_video_many(prompts, output_paths)
        total = inps[0].chunk_num - sampler.chunk_offset
        segments = [[] for _ in prompts]
        with maybe_trace("walk_batch"):
            for chunk_idx, chunks in sampler.walk():  # chunks: [R, C, <=cw, H, W]
                for r in range(len(prompts)):
                    segments[r].append(post_chunk_process(chunks[r], self.config))
                print_rank_0(f"chunk {chunk_idx + 1}/{total} done (batch of {len(prompts)})")
        for r, path in enumerate(output_paths):
            video = np.concatenate(segments[r], axis=0)
            save_video_to_disk(video, path, fps=self.config.runtime_config.fps)
        print_rank_0(
            f"Finish batched MagiPipeline: {len(prompts)} videos in {time.perf_counter() - t0:.1f}s"
        )

    def run_text_to_video_many(self, prompts, output_paths) -> None:
        """Interleave several requests on ONE engine: round-robin denoise
        steps (`walk_many`) with VAE decode + host transfer pushed to a
        worker thread, so one request's decode overlaps another's denoise
        — the single-chip analog of the reference's PP multi-request
        overlap (ref: video_generate.py:721-754).  Unlike
        run_text_to_video_batch (lockstep dp batching), requests here may
        have different schedules, and memory scales with the number of
        in-flight KV caches — pair with int8 weights for 2 requests on a
        16GB chip."""
        from concurrent.futures import ThreadPoolExecutor

        from magi_tpu.sampling.transport import walk_many

        assert len(prompts) == len(output_paths) and prompts
        t0 = time.perf_counter()
        params = get_dit(self.config)
        null_caption = np.asarray(params["y_embedder"]["null_caption_embedding"], np.float32)

        samplers = []
        for i, prompt in enumerate(prompts):
            caption_embs, emb_masks = get_txt_embeddings(prompt, self.config)
            inp = build_inference_input(self.config, null_caption, caption_embs, emb_masks, None)
            samplers.append(
                ArdfSampler(self.config, params, inp, jax.random.fold_in(self.key, i))
            )

        segments = [[] for _ in prompts]

        def _decode(ridx, chunk_idx, chunk):
            out = post_chunk_process(chunk, self.config)
            print_rank_0(f"request {ridx}: chunk {chunk_idx + 1} done")
            return out

        with maybe_trace("walk_many"), ThreadPoolExecutor(max_workers=1) as pool:
            pending = []
            for ridx, chunk_idx, chunk in walk_many(samplers):
                # decode on the worker: its blocking device->host reads ride
                # behind the denoise steps this loop keeps dispatching
                pending.append((ridx, pool.submit(_decode, ridx, chunk_idx, chunk)))
                # drain finished decodes as the walk progresses so emitted
                # device chunks are released incrementally (an unbounded
                # futures list would pin every chunk of every request in HBM
                # if decode lagged denoise); single worker -> FIFO completion
                while pending and pending[0][1].done():
                    r, fut = pending.pop(0)
                    segments[r].append(fut.result())
            for r, fut in pending:
                segments[r].append(fut.result())
        for r, path in enumerate(output_paths):
            video = np.concatenate(segments[r], axis=0)
            save_video_to_disk(video, path, fps=self.config.runtime_config.fps)
        print_rank_0(
            f"Finish interleaved MagiPipeline: {len(prompts)} videos in "
            f"{time.perf_counter() - t0:.1f}s"
        )

    def _run(self, prompt: str, prefix_video, output_path: str) -> None:
        t0 = time.perf_counter()
        caption_embs, emb_masks = get_txt_embeddings(prompt, self.config)
        params = get_dit(self.config)

        null_caption = np.asarray(params["y_embedder"]["null_caption_embedding"], np.float32)
        inp = build_inference_input(self.config, null_caption, caption_embs, emb_masks, prefix_video)

        sampler = ArdfSampler(self.config, params, inp, self.key)
        event_path_timer().synced_record("begin_walk")
        segments = []
        total = inp.chunk_num - sampler.chunk_offset
        with maybe_trace("walk"):
            for chunk_idx, chunk in sampler.walk():
                # VAE-decode each chunk as it becomes clean (streams with the walk)
                segments.append(post_chunk_process(chunk, self.config))
                print_rank_0(f"chunk {chunk_idx + 1}/{total} done")
        event_path_timer().synced_record("end_walk")
        log_memory("after walk")
        video = np.concatenate(segments, axis=0)
        save_video_to_disk(video, output_path, fps=self.config.runtime_config.fps)
        print_rank_0(
            f"Finish MagiPipeline: {video.shape[0]} frames -> {output_path} "
            f"in {time.perf_counter() - t0:.1f}s"
        )
