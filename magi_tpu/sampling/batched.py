"""dp-axis request batching: denoise N same-shape requests in lockstep,
sharded over the mesh's `dp` axis.

The reference scales request throughput by replicating the whole engine per
DP rank and scattering requests across ranks (ref: parallel_state.py data
parallel groups + one SampleTransport per rank).  TPU-native equivalent:
requests become a leading batch axis on the latent state / KV cache /
captions; the per-step device functions run under `shard_map` over the dp
mesh axis with an inner `lax.map` over each group's local requests — every
device group executes its own UNBATCHED step program with zero
cross-request communication, while the host loop stays a single scheduler.
(Not `jax.vmap`: the streaming-DMA attention kernels hold kv in the ANY
memory space, which Pallas cannot auto-batch on real TPUs; the map keeps
kernel shapes unbatched, and with one request per dp group nothing
serializes.)

Constraints (checked at construction): all requests must share latent
geometry, step count, chunk count and prefix length — the lockstep schedule
is what makes one jitted program serve the whole batch.  Mixed text/no-text
is fine (per-request caption slabs + lengths).

Memory: each request carries its own KV cache and activation set, so
batch-per-chip is HBM-bound — 4.5B bf16 at 480p does NOT fit two requests
on a 16GB v5e (measured RESOURCE_EXHAUSTED); size dp groups so each holds
one request, or pair batching with int8 weights.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from magi_tpu.core.config import MagiConfig
from magi_tpu.parallel import mesh as mesh_lib
from magi_tpu.sampling.transport import (
    ArdfSampler,
    InferenceInput,
    _cfg1_step,
    _cfg3_step,
    _prefix_warmup_step,
)

_BATCH_JIT_CACHE: dict = {}

# in_axes over the positional args of each step fn (after the bound config):
# 0 = per-request (stacked), None = shared across the batch.
_CFG3_AXES = (None, 0, 0, None, None, 0, 0, None, None, None, None, None, None, None, None, 0, None)
_CFG1_AXES = (None, 0, 0, None, None, 0, 0, None, None, None, None, None, None, None, None, 0, None)
_WARMUP_AXES = (None, 0, 0, None, None, None, None, None, None)


def _map_requests(f, in_axes):
    """lax.map `f` over axis 0 of the in_axes==0 args (shared args closed
    over).  NOT jax.vmap: the streaming-DMA attention kernels keep their kv
    buffers in the ANY memory space (whole-array refs + manual DMA), which
    Pallas cannot auto-batch on real TPU hardware — mapping keeps every
    kernel call at its unbatched shape, and on a dp mesh the map runs once
    per device group (local batch 1) so nothing actually serializes."""

    def mapped(*args):
        batched = tuple(a for a, ax in zip(args, in_axes) if ax == 0)

        def one(ms):
            it = iter(ms)
            full = [next(it) if ax == 0 else a for a, ax in zip(args, in_axes)]
            return f(*full)

        return jax.lax.map(one, batched)

    return mapped


def _maybe_dp_shard(mapped, in_axes, n_out):
    """On a dp mesh, wrap the request map in shard_map over the dp axis:
    each device group runs its own unbatched step program on its local
    requests — the TPU-native form of the reference's per-rank engine
    replication (ref: parallel_state.py dp groups).  XLA never sees a
    batched kernel and no cross-request collectives exist.

    Manual over `dp` ONLY (axis_names): cp/tp/pp stay auto-sharded, so each
    dp group's step program still runs the model-parallel path (sharding
    constraints + the cp/tp-manual attention shard_map nest inside) — the
    composition of dp request batching with model parallelism that the
    reference gets from dp groups coexisting with cp/pp
    (ref: parallel_state.py:332)."""
    mesh = mesh_lib.get_mesh()
    if mesh is None or mesh.shape[mesh_lib.AXIS_DP] == 1:
        return mapped
    from jax.sharding import PartitionSpec as P

    def wrapper(*args):
        specs = tuple(
            P(mesh_lib.AXIS_DP) if ax == 0 else jax.tree_util.tree_map(lambda _: P(), a)
            for a, ax in zip(args, in_axes)
        )
        fn = jax.shard_map(
            mapped,
            mesh=mesh,
            in_specs=specs,
            out_specs=tuple([P(mesh_lib.AXIS_DP)] * n_out) if n_out > 1 else P(mesh_lib.AXIS_DP),
            axis_names={mesh_lib.AXIS_DP},
            check_vma=False,
        )
        return fn(*args)

    return wrapper


def _batched_steps(config: MagiConfig):
    from magi_tpu.sampling.transport import _config_key

    key = (_config_key(config), "dp_batch", id(mesh_lib.get_mesh()))
    if key not in _BATCH_JIT_CACHE:

        def cfg3(params, xs, cache, *rest, n_den, extra, use_prefix, pack):
            f = lambda *a: _cfg3_step(
                config, *a, n_den=n_den, extra=extra, use_prefix=use_prefix, pack=pack
            )
            g = _maybe_dp_shard(_map_requests(f, _CFG3_AXES), _CFG3_AXES, 2)
            return g(params, xs, cache, *rest)

        def cfg1(params, xs, cache, *rest, n_den, extra, use_prefix, distill_nearly):
            f = lambda *a: _cfg1_step(
                config, *a, n_den=n_den, extra=extra, use_prefix=use_prefix,
                distill_nearly=distill_nearly,
            )
            g = _maybe_dp_shard(_map_requests(f, _CFG1_AXES), _CFG1_AXES, 2)
            return g(params, xs, cache, *rest)

        def warmup(params, cache, *rest, n_chunks):
            f = lambda *a: _prefix_warmup_step(config, *a, n_chunks=n_chunks)
            g = _maybe_dp_shard(_map_requests(f, _WARMUP_AXES), _WARMUP_AXES, 1)
            return g(params, cache, *rest)

        _BATCH_JIT_CACHE[key] = (
            jax.jit(cfg3, static_argnames=("n_den", "extra", "use_prefix", "pack"),
                    donate_argnums=(1, 2)),
            jax.jit(cfg1, static_argnames=("n_den", "extra", "use_prefix", "distill_nearly"),
                    donate_argnums=(1, 2)),
            jax.jit(warmup, static_argnames=("n_chunks",), donate_argnums=(1,)),
            # batched cache [R, L, 2, hk, tok, hd]: token axis is 4 (for the
            # int8-stored scale leaf [R, L, 2, hk, tok] too)
            jax.jit(
                lambda c, s: jax.tree.map(lambda x: jnp.roll(x, -s, axis=4), c),
                donate_argnums=(0,),
            ),
        )
    return _BATCH_JIT_CACHE[key]


class DpBatchedSampler(ArdfSampler):
    """ArdfSampler over a stack of requests: identical host scheduling, but
    every per-request array carries a leading batch axis sharded `P('dp')`.

    `walk()` yields `(chunk_idx, latents[R, C, <=cw, H, W])` — one decode
    batch per finished chunk position, covering all R requests.

    Requests must share schedule + latent shape (lockstep SPMD walk).  A
    serving layer that mixes shapes should bucket requests by
    (latent_size, num_steps, chunk_num, prefix length) and run one
    DpBatchedSampler per bucket — see `check_lockstep`, which reports the
    first mismatch so a scheduler can route on it."""

    @staticmethod
    def check_lockstep(base: InferenceInput, inp: InferenceInput) -> str | None:
        """Return a human-readable mismatch description, or None if `inp`
        can join a batch led by `base` (the bucketing key for servers)."""
        checks = [
            ("latent_size", base.latent_size, inp.latent_size),
            ("num_steps", base.num_steps, inp.num_steps),
            ("chunk_num", base.chunk_num, inp.chunk_num),
            ("prev_chunks_scale", base.prev_chunks_scale, inp.prev_chunks_scale),
            (
                "prefix length",
                0 if base.prefix_video is None else base.prefix_video.shape[1],
                0 if inp.prefix_video is None else inp.prefix_video.shape[1],
            ),
            # the null caption slab is model-derived (one empty-prompt T5
            # embed per model) — the batch shares the base request's copy
            ("null_len", base.null_len, inp.null_len),
        ]
        for name, a, b in checks:
            if a != b:
                return f"{name} differs ({a} vs {b})"
        return None

    def __init__(
        self,
        config: MagiConfig,
        params,
        inps: Sequence[InferenceInput],
        keys: Sequence[jax.Array],
    ):
        assert len(inps) >= 1 and len(inps) == len(keys)
        base = inps[0]
        for i, inp in enumerate(inps[1:], start=1):
            why = self.check_lockstep(base, inp)
            if why is not None:
                raise ValueError(
                    f"dp batch requires lockstep requests, but request {i} "
                    f"vs 0: {why}.  Bucket mixed-shape requests by "
                    "(latent_size, num_steps, chunk_num, prefix length) and "
                    "run one DpBatchedSampler per bucket."
                )

        super().__init__(config, params, base, keys[0])
        self.R = R = len(inps)

        mesh = mesh_lib.get_mesh()
        if mesh is not None and mesh.shape[mesh_lib.AXIS_DP] > 1:
            dp = mesh.shape[mesh_lib.AXIS_DP]
            assert R % dp == 0, f"batch size {R} must divide over dp={dp}"

        # ---- stack per-request state [R, ...] --------------------------------
        self.xs = jax.vmap(
            lambda k: jax.random.normal(k, base.latent_size, dtype=jnp.float32)
        )(jnp.stack(list(keys)))
        self.cache = jax.tree.map(
            lambda c: jnp.broadcast_to(c, (R,) + c.shape)
            + jnp.zeros((R,) + (1,) * c.ndim, c.dtype),
            self.cache,
        )

        embs, lens = [], []
        for inp in inps:
            if inp.has_text:
                embs.append(jnp.asarray(inp.caption_embs))
                lens.append(np.asarray(inp.caption_lens, np.int32))
            else:
                embs.append(
                    jnp.broadcast_to(inp.null_emb, inp.caption_embs.shape)
                    + jnp.zeros_like(inp.caption_embs)
                )
                lens.append(np.full(inp.caption_lens.shape, inp.null_len, np.int32))
        self._text_embs = jnp.stack(embs)  # [R, n_chunks, L, C]
        self._lens_eff = np.stack(lens)  # [R, n_chunks]

        if base.prefix_video is not None:
            bufs = []
            pad_T = self.chunk_num * self.cw
            for inp in inps:
                pv = inp.prefix_video.astype(jnp.float32)
                bufs.append(jnp.pad(pv, ((0, 0), (0, pad_T - pv.shape[1]), (0, 0), (0, 0))))
            self.prefix_buf = jnp.stack(bufs)
        else:
            self.prefix_buf = jnp.broadcast_to(
                self.prefix_buf, (R,) + self.prefix_buf.shape
            ) + jnp.zeros((R,) + (1,) * self.prefix_buf.ndim, self.prefix_buf.dtype)

        # place batched state on the dp axis before the first step so the
        # donated buffers keep that layout for the whole walk; the KV cache
        # additionally keeps its model-parallel layout within each dp group
        if mesh is not None and not mesh_lib.mesh_is_trivial(mesh):
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(mesh, P(mesh_lib.AXIS_DP))
            self.xs = jax.device_put(self.xs, s)
            self.cache = jax.tree.map(
                lambda c: jax.device_put(
                    c,
                    NamedSharding(
                        mesh,
                        P(mesh_lib.AXIS_DP, *tuple(mesh_lib.kv_cache_spec())[: c.ndim - 1]),
                    ),
                ),
                self.cache,
            )
            self.prefix_buf = jax.device_put(self.prefix_buf, s)
            self._text_embs = jax.device_put(self._text_embs, s)

        (self._jit_cfg3, self._jit_cfg1, self._jit_warmup, self._jit_roll) = _batched_steps(
            config
        )

    def warm_step_variants(self) -> int:
        # the base warm chain rebuilds SINGLE-request state; the batched
        # sampler's xs/cache carry a leading request axis — skip (the
        # lockstep walk compiles its variants on first occurrence)
        return 0
