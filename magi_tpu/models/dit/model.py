"""VideoDiT — TPU-native functional rebuild of the reference DiT
(ref: inference/model/dit/{dit_model.py,dit_module.py}).

Design (TPU-first, not a port):
  * Parameters are a plain pytree with torch-compatible key structure
    (checkpoint mapping is a rename+transpose, see checkpoint/loader.py).
  * The token axis packs batch into segments: every forward is
    `n_segments` equal chunks of `seg_len` tokens (the reference's packed
    q/kv-range scheme, generalized).  The unconditional CFG branch's
    chunks->batch reshape (ref: dit_model.py:437-445) disappears: it is
    just different kv ranges.
  * Layers are stacked and driven by `lax.scan` -> one traced layer,
    O(seconds) compiles even at 48 layers; the KV cache rides through the
    scan as per-layer state (functional analog of
    InferenceParams.key_value_memory_dict, ref: dataclass.py:62-83).
  * fp32 islands preserved for numerical parity: embedders, QK layernorms,
    gating/post-norms, final layernorm/linear (ref: dit_model.py:621-638);
    everything else bf16 with fp32 MXU accumulation.
  * Attention is the segmented Pallas flash kernel (ops/attention.py); the
    KV view is a fixed-size buffer updated with dynamic_update_slice, so
    the sliding ARDF window never changes compiled shapes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from magi_tpu.core.config import MagiConfig, ModelConfig
from magi_tpu.core.dataclasses import ForwardMeta
from magi_tpu.models.dit.embedders import (
    ada_modulate_forward,
    final_linear_forward,
    init_embedder_params,
    softcap,
    t_embedder_forward,
    y_embedder_forward,
)
from magi_tpu.models.dit.rope import apply_rotary, default_bands, rope_3d_segments
from magi_tpu.ops.attention import (
    segmented_attention_reference,
    segmented_attention_two_source,
    segmented_attention_two_source_reference,
    segmented_attention_v2,
)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _attn_int8() -> bool:
    """BEYOND-PARITY option (`MAGI_ATTN_INT8=1`): int8-quantized attention
    (ops/attention_q8) — kv stored int8 with per-token scales (cache HBM
    and kv DMA bytes halve), consumed by one of three in-kernel schemes
    selected by `MAGI_ATTN_Q8_SCHEME` (default "qk8"; see
    ops/attention_q8 + docs/perf_notes.md for the chip A/B).  The
    reference keeps attention bf16 (dit_module.py:431-487)."""
    return os.environ.get("MAGI_ATTN_INT8", "0") == "1"


def _attn_int8_store() -> bool:
    """int8 attention + int8-STORED KV cache (the default when
    MAGI_ATTN_INT8 is on): the cache holds {kv int8, scale f32}, halving
    cache HBM, and is quantized once at write time instead of every
    forward.  MAGI_ATTN_INT8_STORE=0 keeps a bf16 cache quantized per
    forward — mathematically identical (quantization is deterministic on
    identical values; equality-tested), for A/B and as the host-offload
    fallback."""
    return _attn_int8() and os.environ.get("MAGI_ATTN_INT8_STORE", "1") == "1"


def _use_pallas_qmm() -> bool:
    """The int8 qmm Pallas kernels are opaque to the SPMD partitioner (a
    sharded operand would replicate the whole call); under a model-parallel
    mesh the quantized path uses XLA-native int8 dots instead, which
    partition like any dot and fuse their dequant epilogues."""
    from magi_tpu.parallel.mesh import model_parallel_trivial

    return _use_pallas() and model_parallel_trivial()


def _attention(q, k, v, kv_start, kv_end, *, seg_len, q_pro=None):
    """Dispatch: Pallas kernel on TPU, dense jnp elsewhere; head-sharded
    shard_map under a non-trivial mesh (Ulysses — the seq<->head reshard at
    this boundary is the all_to_all of ref: context_parallel.py:381-423,
    emitted by XLA from the sharding specs).  `q_pro` (Pallas only): the
    kernel's fused q-norm(+rope) prologue inputs — q arrives RAW."""
    from jax.sharding import PartitionSpec as P

    from magi_tpu.parallel import mesh as mesh_lib

    if _use_pallas():
        # block_q/block_k resolve via auto_blocks (measured-optimal)
        impl = functools.partial(segmented_attention_v2, q_prologue=q_pro)
    else:
        assert q_pro is None  # reference path normalizes/ropes outside
        impl = segmented_attention_reference

    mesh = mesh_lib.get_mesh()
    n_shards = mesh_lib.head_shards(mesh)

    # int8 cross-attention (MAGI_ATTN_INT8, beyond parity): ride the
    # two-source q8 kernel with an EMPTY second source — k/v pack into the
    # kernel layout (tiny: caption kv), quantize per-token, and the fused
    # norm-only q prologue runs in-kernel.  The Pallas kernel needs a
    # lane-aligned head_dim (DiT's is 128; the VAE has its own _attention
    # and is unaffected by this flag); the CPU reference path has no such
    # constraint, so tiny-model tests exercise this branch too.
    if _attn_int8() and (q.shape[2] % 128 == 0 or not _use_pallas()):
        from magi_tpu.ops.attention_q8 import (
            quantize_kv_per_token,
            segmented_attention_two_source_q8,
            segmented_attention_two_source_q8_reference,
        )

        kv_pack = jnp.stack([k.transpose(1, 0, 2), v.transpose(1, 0, 2)])
        kv8, sc = quantize_kv_per_token(kv_pack.astype(q.dtype))
        hk_ = kv8.shape[1]
        hd_ = kv8.shape[3]
        empty = jnp.zeros((2, hk_, 0, hd_), jnp.int8)
        esc = jnp.zeros((2, hk_, 0), jnp.float32)
        z = jnp.zeros_like(kv_start)
        if mesh_lib.mesh_is_trivial(mesh) or n_shards == 1:
            f = (segmented_attention_two_source_q8 if _use_pallas()
                 else segmented_attention_two_source_q8_reference)
            kw = dict(q_prologue=q_pro) if _use_pallas() else {}
            return f(q, kv8, sc, empty, esc, kv_start, kv_end, z, z,
                     seg_len=seg_len, **kw)
        heads_ = mesh_lib.HEAD_AXES
        qspec = P(None, heads_, None)
        kvspec = P(None, heads_, None, None)
        scspec = P(None, heads_, None)
        if q_pro is None:
            def sharded_x8(qq, k8, s8, e8, es8, a, b):
                zz = jnp.zeros_like(a)
                f = (segmented_attention_two_source_q8 if _use_pallas()
                     else segmented_attention_two_source_q8_reference)
                return f(qq, k8, s8, e8, es8, a, b, zz, zz, seg_len=seg_len)

            fn = jax.shard_map(
                sharded_x8,
                mesh=mesh_lib.shard_map_mesh(),
                in_specs=(qspec, kvspec, scspec, kvspec, scspec, P(), P()),
                out_specs=qspec,
                axis_names=set(mesh_lib.HEAD_AXES),
            )
            return _reshard_heads_to_tokens(
                fn(q, kv8, sc, empty, esc, kv_start, kv_end)
            )
        qwx, qbx, _, _, ln_eps_x = q_pro

        def sharded_x8_pro(qq, k8, s8, e8, es8, a, b, w_, b_):
            zz = jnp.zeros_like(a)
            return segmented_attention_two_source_q8(
                qq, k8, s8, e8, es8, a, b, zz, zz, seg_len=seg_len,
                q_prologue=(w_, b_, None, None, ln_eps_x),
            )

        fn = jax.shard_map(
            sharded_x8_pro,
            mesh=mesh_lib.shard_map_mesh(),
            in_specs=(qspec, kvspec, scspec, kvspec, scspec, P(), P(), P(), P()),
            out_specs=qspec,
            axis_names=set(mesh_lib.HEAD_AXES),
        )
        return _reshard_heads_to_tokens(
            fn(q, kv8, sc, empty, esc, kv_start, kv_end, qwx, qbx)
        )

    if mesh_lib.mesh_is_trivial(mesh) or n_shards == 1:
        return impl(q, k, v, kv_start, kv_end, seg_len=seg_len)

    hq, hk = q.shape[1], k.shape[1]
    assert hq % n_shards == 0 and hk % n_shards == 0, (
        f"heads ({hq}q/{hk}kv) must divide cp*pp*tp={n_shards}; when "
        f"n_shards > kv heads the caller replicates kv heads first "
        f"(mesh.kv_replication — the reference's cp>kv_heads replication, "
        f"context_parallel.py:393-394)"
    )
    heads = mesh_lib.HEAD_AXES
    spec = P(None, heads, None)
    # manual over cp/pp/tp: dp (request batching) stays auto, so this nests
    # inside DpBatchedSampler's dp-manual shard_map (ref dp groups
    # coexisting with cp/pp, parallel_state.py:332)
    if q_pro is None:
        fn = jax.shard_map(
            functools.partial(impl, seg_len=seg_len),
            mesh=mesh_lib.shard_map_mesh(),
            in_specs=(spec, spec, spec, P(), P()),
            out_specs=spec,
            axis_names=set(heads),
        )
        return _reshard_heads_to_tokens(fn(q, k, v, kv_start, kv_end))

    qw, qb, sin, cos, ln_eps = q_pro
    has_rope = sin is not None
    extra = (qw, qb, sin, cos) if has_rope else (qw, qb)

    def sharded(qq, kk, vv, a, b, *pro):
        if has_rope:
            w_, b_, s_, c_ = pro
        else:
            (w_, b_), s_, c_ = pro, None, None
        return segmented_attention_v2(
            qq, kk, vv, a, b, seg_len=seg_len,
            q_prologue=(w_, b_, s_, c_, ln_eps),
        )

    fn = jax.shard_map(
        sharded,
        mesh=mesh_lib.shard_map_mesh(),
        in_specs=(spec, spec, spec, P(), P()) + tuple(P() for _ in extra),
        out_specs=spec,
        axis_names=set(heads),
    )
    return _reshard_heads_to_tokens(fn(q, k, v, kv_start, kv_end, *extra))


def _attention_cached(q, cache_l, kv_cur, r1s, r1e, r2s, r2e, *, seg_len, q_pro=None):
    """Two-source attention: read-only cache + current kv, two ranges per
    segment — the cache⊕current concat (ref: dit_module.py:931) without
    materializing a view copy per layer.  `q_pro` (Pallas path only)
    carries the q-side QK-norm params + rotary tables for the kernel's
    fused prologue — q arrives RAW from the projection."""
    from jax.sharding import PartitionSpec as P

    from magi_tpu.parallel import mesh as mesh_lib

    if _use_pallas():
        # block_q/block_k resolve via auto_blocks (measured-optimal)
        impl = functools.partial(segmented_attention_two_source, q_prologue=q_pro)
    else:
        assert q_pro is None  # reference path normalizes/ropes outside
        impl = segmented_attention_two_source_reference

    mesh = mesh_lib.get_mesh()
    n_shards = mesh_lib.head_shards(mesh)
    if mesh_lib.mesh_is_trivial(mesh) or n_shards == 1:
        if _attn_int8():
            # int8 attention (see _attn_int8): kv quantized per-token here
            # (one extra kv read+write; the kernel then reads each attended
            # range at HALF the bytes and runs both matmuls on the int8 MXU).
            # Off-TPU the dequant reference path carries the same kv
            # quantization so CPU walks exercise the integration end-to-end.
            from magi_tpu.ops.attention_q8 import (
                quantize_kv_per_token,
                segmented_attention_two_source_q8,
                segmented_attention_two_source_q8_reference,
            )

            if isinstance(cache_l, dict):  # int8-STORED cache (_attn_int8_store)
                kv1_8, sc1 = cache_l["kv"], cache_l["scale"]
            else:
                kv1_8, sc1 = quantize_kv_per_token(cache_l)
            if isinstance(kv_cur, dict):  # pre-quantized by the fused pack
                kv2_8, sc2 = kv_cur["kv"], kv_cur["scale"]
            else:
                kv2_8, sc2 = quantize_kv_per_token(kv_cur)
            if _use_pallas():
                return segmented_attention_two_source_q8(
                    q, kv1_8, sc1, kv2_8, sc2, r1s, r1e, r2s, r2e,
                    seg_len=seg_len, q_prologue=q_pro,
                )
            return segmented_attention_two_source_q8_reference(
                q, kv1_8, sc1, kv2_8, sc2, r1s, r1e, r2s, r2e, seg_len=seg_len,
            )
        return impl(q, cache_l, kv_cur, r1s, r1e, r2s, r2e, seg_len=seg_len)

    heads = mesh_lib.HEAD_AXES
    qspec = P(None, heads, None)
    kvspec = P(None, heads, None, None)  # [2, hk, len, hd] kernel layout
    if _attn_int8():
        # head-sharded int8 attention: quantize before the shard_map (the
        # per-token amax has no cross-head deps, so XLA partitions it);
        # per-token scales [2, hk, len] shard on the head axis like kv
        from magi_tpu.ops.attention_q8 import (
            quantize_kv_per_token,
            segmented_attention_two_source_q8,
            segmented_attention_two_source_q8_reference,
        )

        if isinstance(cache_l, dict):  # int8-STORED cache (_attn_int8_store)
            kv1_8, sc1 = cache_l["kv"], cache_l["scale"]
        else:
            kv1_8, sc1 = quantize_kv_per_token(cache_l)
        if isinstance(kv_cur, dict):  # pre-quantized by the fused pack
            kv2_8, sc2 = kv_cur["kv"], kv_cur["scale"]
        else:
            kv2_8, sc2 = quantize_kv_per_token(kv_cur)
        scspec = P(None, heads, None)
        if q_pro is None:
            def sharded_q8(qq, c1, s1, c2, s2, a, b, cc, d):
                f = (segmented_attention_two_source_q8 if _use_pallas()
                     else segmented_attention_two_source_q8_reference)
                return f(qq, c1, s1, c2, s2, a, b, cc, d, seg_len=seg_len)

            fn = jax.shard_map(
                sharded_q8,
                mesh=mesh_lib.shard_map_mesh(),
                in_specs=(qspec, kvspec, scspec, kvspec, scspec,
                          P(), P(), P(), P()),
                out_specs=qspec,
                axis_names=set(heads),
            )
            return _reshard_heads_to_tokens(
                fn(q, kv1_8, sc1, kv2_8, sc2, r1s, r1e, r2s, r2e)
            )
        qw8, qb8, sin8, cos8, ln_eps8 = q_pro

        def sharded_q8_pro(qq, c1, s1, c2, s2, a, b, cc, d, w_, b_, s_, co_):
            return segmented_attention_two_source_q8(
                qq, c1, s1, c2, s2, a, b, cc, d, seg_len=seg_len,
                q_prologue=(w_, b_, s_, co_, ln_eps8),
            )

        fn = jax.shard_map(
            sharded_q8_pro,
            mesh=mesh_lib.shard_map_mesh(),
            in_specs=(qspec, kvspec, scspec, kvspec, scspec,
                      P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=qspec,
            axis_names=set(heads),
        )
        return _reshard_heads_to_tokens(
            fn(q, kv1_8, sc1, kv2_8, sc2, r1s, r1e, r2s, r2e,
               qw8, qb8, sin8, cos8)
        )
    if q_pro is None:
        fn = jax.shard_map(
            functools.partial(impl, seg_len=seg_len),
            mesh=mesh_lib.shard_map_mesh(),
            in_specs=(qspec, kvspec, kvspec, P(), P(), P(), P()),
            out_specs=qspec,
            axis_names=set(heads),
        )
        return _reshard_heads_to_tokens(fn(q, cache_l, kv_cur, r1s, r1e, r2s, r2e))

    qw, qb, sin, cos, ln_eps = q_pro

    def sharded(qq, c1, c2, a, b, cc, d, w_, b_, s_, co_):
        return segmented_attention_two_source(
            qq, c1, c2, a, b, cc, d, seg_len=seg_len,
            q_prologue=(w_, b_, s_, co_, ln_eps),
        )

    fn = jax.shard_map(
        sharded,
        mesh=mesh_lib.shard_map_mesh(),
        in_specs=(qspec, kvspec, kvspec, P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=qspec,
        axis_names=set(heads),
    )
    return _reshard_heads_to_tokens(
        fn(q, cache_l, kv_cur, r1s, r1e, r2s, r2e, qw, qb, sin, cos)
    )


def _reshard_heads_to_tokens(out):
    """Reshard the attention output [S, hq, hd] from head-sharded
    P(None, (cp,tp), None) back to Megatron layout P(cp, tp, None) while the
    token/head dims are still separate ranks.  Done here it is an
    all-to-all over cp (the Ulysses back-transform); left to the 2D
    `reshape(S, hq*hd)` downstream, the merged feature dim mixes the
    sharded head axis and XLA falls back to involuntary full
    rematerialization (replicate + repartition, spmd_partitioner.cc:652)."""
    from magi_tpu.parallel import mesh as mesh_lib

    return mesh_lib.constraint(out, mesh_lib.SEQ_AXES, mesh_lib.AXIS_TP, None)


def layer_norm(x, params, eps: float, zero_centered: bool = False, compute_dtype=None):
    """LayerNorm with optional zero-centered gamma (ref: dit_module.py:323-357).
    Statistics always in fp32."""
    orig_dtype = x.dtype if compute_dtype is None else compute_dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * lax.rsqrt(var + eps)
    w = params["weight"].astype(jnp.float32)
    if zero_centered:
        w = w + 1.0
    out = xn * w + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def _dot(x, w, high_precision: bool = False):
    """bf16 matmul with fp32 MXU accumulation; optionally exact-fp32
    (the reference's fp32-autocast islands, ref: dit_module.py:1343-1344)."""
    if high_precision:
        return jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32), preferred_element_type=jnp.float32)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _apply_pre(x, pre, eps):
    """The unfused producer op for a linear group's input: None, an
    ("ln", params) shared pre-layernorm, or ("swiglu",) on an fc1 output."""
    if pre is None:
        return x
    if pre[0] == "ln":
        return layer_norm(x, pre[1], eps)
    assert pre[0] == "swiglu"
    d = x.shape[-1] // 2
    return jax.nn.silu(x[..., :d].astype(jnp.float32)).astype(x.dtype) * x[..., d:]


def _linears_shared(x, plist, act_ok, high_precision: bool = False, kind: str = "col",
                    pre=None, eps: float = 1e-6):
    """Apply several linears to one shared input — the single dispatch path
    for every DiT linear: bf16 `weight`, or int8 `weight_q` + per-channel
    `weight_scale` (the quantized execution path — TPU-native analog of the
    reference's fp8 linears, ref: dit_module.py:431-487).

    When params carry int8 weights and `act_ok` is true, `x` is dynamically quantized ONCE (per-row
    scales, amortized over all matmuls in plist) and each matmul runs
    int8 x int8 -> int32 on the MXU — the TPU analog of the reference's fp8
    activation quantization (div_clamp_to + bmm_fp8, ref:
    dit_module.py:364-384, 431-460).  Layers 0 and L-1 run fully bf16
    (weights AND activations, via the blocks_edge side tree — see
    quantize_params_int8), mirroring the reference's first/last-layer
    policy (ref: dit_module.py:407).  `act_ok` may be a static Python bool
    (dit_forward's lax.cond routing makes it static per branch) or a traced
    bool (legacy trees without blocks_edge).

    `kind` ("col"/"row") is the Megatron role under a model-parallel mesh.
    Both keep int8 activation execution there via a manual shard_map
    (matching the reference's fp8 coverage of ALL eight linears,
    ref: dit_module.py:481-487, 535-551):
      * col: x seq-sharded/tp-replicated, weights column-sharded — NO
        collectives; outputs stay feature-sharded.
      * row: x tp-feature-sharded, weights row-sharded — the act-quant
        rowmax takes a pmax over tp first, each shard runs a local int8
        dot, and the f32-SCALED partial sums psum over tp (an int32
        all-reduce inside the layer-scan while-loop crashes XLA's
        all-reduce code-motion pass — f32 partials sidestep it and carry
        the scales anyway).
    The shard_map goes manual over cp/pp too whenever the token count
    divides (otherwise the opaque-to-SPMD Pallas qmm would force
    replication of the seq-sharded activations).

    `weight_q4` params (nibble-packed int4, quantize_params_int4) unpack
    one layer to int8 in-scan and then ride the same int8 path — the
    unpack is an XLA-fused shift/mask whose traffic is negligible next to
    the matmul's.

    `pre` (None | ("ln", params) | ("swiglu",)) is the producer op of this
    group's input.  Passing it here (instead of applying it at the call
    site) lets the single-chip int8 path fuse producer + row-max + int8
    cast into ONE Pallas pass (`ops/act_quant.rowquant_fused`) — in plain
    XLA the act-quant row-max is a reduce that cannot fuse with its
    consumer, so the intermediate activation round-trips HBM (~10% of an
    int8 step at the 12288-wide SwiGLU site, docs/perf_notes.md).  Every
    other path applies `pre` unfused — identical math."""
    if "weight_q4" in plist[0]:
        from magi_tpu.ops.quant import unpack_int4

        plist = [
            {
                "weight_q": unpack_int4(pp["weight_q4"]),
                "weight_scale": pp["weight_scale"],
                **({"act_smooth": pp["act_smooth"]} if "act_smooth" in pp else {}),
            }
            for pp in plist
        ]
    if "weight_q" not in plist[0]:
        x = _apply_pre(x, pre, eps)
        return tuple(_dot(x, pp["weight"], high_precision) for pp in plist)

    # smooth-quant (fp8 checkpoints): the quantized weight is smooth-FOLDED
    # (s·W, quantize_params_* on an act_smooth-carrying tree), so the
    # activation divides by s here — y = (x/s) @ (s·W).  Moves activation
    # channel outliers into the weight exactly as the reference's fp8 path
    # (div_clamp_to by smooth_scale, ref: dit_module.py:462-487) and
    # measures BETTER than fp8 on the outlier regime (ab_fp8_quality.py).
    # XLA fuses the divide into the act-quant pass.  Applies to BOTH the
    # int8 and the dequant branch (both see the folded weight).
    smooth = plist[0].get("act_smooth")
    if smooth is not None:
        assert len(plist) == 1, "smooth-quant linears are singleton groups"
        x = _apply_pre(x, pre, eps)
        pre = None
        x = (x.astype(jnp.float32) * (1.0 / smooth.astype(jnp.float32))).astype(x.dtype)

    from magi_tpu.ops.quant import (
        act_quant_rowwise,
        quantized_matmul,
        quantized_matmul_i8,
        quantized_matmul_i8_reference,
        quantized_matmul_reference,
    )

    use_pallas = _use_pallas_qmm()
    # int8 x int8: the XLA-native dot beats the Pallas qmm on v5e (301.8 vs
    # 269 int8-TOPS at MAGI shapes, scripts/profile_qmm_scan.py round 3) —
    # XLA fuses the f32 scale epilogue and partitions under SPMD; the
    # Pallas kernel remains available via MAGI_QMM_IMPL=pallas
    import os as _os

    _prefer_pallas_i8 = _os.environ.get("MAGI_QMM_IMPL", "xla") == "pallas"
    qmm_i8 = quantized_matmul_i8 if (use_pallas and _prefer_pallas_i8) else quantized_matmul_i8_reference
    qmm_deq = quantized_matmul if use_pallas else quantized_matmul_reference

    def deq_branch(xx):
        return tuple(
            qmm_deq(xx, pp["weight_q"], pp["weight_scale"]).astype(xx.dtype) for pp in plist
        )

    from magi_tpu.parallel import mesh as mesh_lib

    if not mesh_lib.model_parallel_trivial():
        # mesh paths keep the unfused producer (a Pallas call is opaque to
        # the SPMD partitioner — same gating as the epilogue kernel)
        x = _apply_pre(x, pre, eps)
        pre = None
        mesh = mesh_lib.get_mesh()
        from jax.sharding import PartitionSpec as P

        tp_size = mesh.shape[mesh_lib.AXIS_TP]
        seq_size = mesh_lib.seq_shards(mesh)
        S = x.shape[0]
        seq_manual = seq_size > 1 and S % seq_size == 0
        xrow = mesh_lib.SEQ_AXES if seq_manual else None
        manual_axes = set(mesh_lib.HEAD_AXES) if seq_manual else {mesh_lib.AXIS_TP}

        eligible = (tp_size > 1 or seq_manual) and (
            kind == "col" or x.shape[1] % max(tp_size, 1) == 0
        )
        if not eligible:
            return deq_branch(x)

        # Inside the manual region operands are local, so either impl works;
        # the XLA dot wins on TPU (see above).  Under pp the gathered
        # weight_q rides as bf16 (exact ints) and is recast to int8.
        qmm_i8_s = (
            quantized_matmul_i8
            if (_use_pallas() and _prefer_pallas_i8)
            else quantized_matmul_i8_reference
        )
        wqs = [pp["weight_q"] for pp in plist]
        scs = [pp["weight_scale"] for pp in plist]

        def inner_col(xx, wq_list, sc_list):
            xq, rs = act_quant_rowwise(xx)
            out = []
            for wq, sc in zip(wq_list, sc_list):
                if wq.dtype != jnp.int8:
                    wq = wq.astype(jnp.int8)
                out.append(qmm_i8_s(xq, rs, wq, sc, out_dtype=xx.dtype))
            return tuple(out)

        def inner_row(xx, wq_list, sc_list):
            xf = xx.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=1)
            if tp_size > 1:
                amax = lax.pmax(amax, mesh_lib.AXIS_TP)  # global rowmax over the split K
            scale = jnp.where(amax == 0, 1.0, amax / 127.0)
            xq = jnp.clip(jnp.round(xf / scale[:, None]), -127, 127).astype(jnp.int8)
            out = []
            for wq, sc in zip(wq_list, sc_list):
                if wq.dtype != jnp.int8:
                    wq = wq.astype(jnp.int8)
                part = qmm_i8_s(xq, scale, wq, sc, out_dtype=jnp.float32)
                if tp_size > 1:
                    part = lax.psum(part, mesh_lib.AXIS_TP)  # f32-scaled partials
                out.append(part.astype(xx.dtype))
            return tuple(out)

        if kind == "col":
            inner = inner_col
            in_specs = (
                P(xrow, None),
                [P(None, mesh_lib.AXIS_TP)] * len(plist),
                [P(mesh_lib.AXIS_TP)] * len(plist),
            )
            out_specs = tuple([P(xrow, mesh_lib.AXIS_TP)] * len(plist))
        else:
            inner = inner_row
            in_specs = (
                P(xrow, mesh_lib.AXIS_TP),
                [P(mesh_lib.AXIS_TP, None)] * len(plist),
                [P()] * len(plist),
            )
            out_specs = tuple([P(xrow, None)] * len(plist))

        def i8_mesh_branch(xx):
            fn = jax.shard_map(
                inner,
                mesh=mesh_lib.shard_map_mesh(),
                in_specs=in_specs,
                out_specs=out_specs,
                axis_names=manual_axes,
                check_vma=False,
            )
            return fn(xx, wqs, scs)

        if isinstance(act_ok, bool):
            return i8_mesh_branch(x) if act_ok else deq_branch(x)
        return lax.cond(act_ok, i8_mesh_branch, deq_branch, x)

    # fused producer + row-quant (single chip, static act_ok only: the
    # fused and unfused branches of a traced lax.cond would need operands
    # of the same shape, and pre changes the input's width for swiglu).
    # OFF by default: chip-measured SLOWER than the unfused XLA chain at
    # every site (0.58-0.71x, scripts/check_act_quant_chip.py) — the 16MB
    # kernel-stack cap forces small row blocks and XLA's reduce+quant
    # fusions are already near the traffic floor.  Kept as an opt-in
    # experiment (docs/perf_notes.md "fused act-quant: tried, DROPPED").
    import os as _os2

    fuse_pre = (
        _os2.environ.get("MAGI_FUSED_ACT_QUANT", "0") == "1"
        and use_pallas
        and isinstance(act_ok, bool)
        and (
            pre is None and x.shape[1] % 128 == 0
            or pre is not None and pre[0] == "ln" and x.shape[1] % 128 == 0
            or pre is not None and pre[0] == "swiglu" and (x.shape[1] // 2) % 2048 == 0
        )
    )

    def i8_branch(xx):
        if fuse_pre:
            from magi_tpu.ops.act_quant import rowquant_fused

            mode = pre[0] if pre is not None else "plain"
            lnp = pre[1] if mode == "ln" else None
            xq, rs = rowquant_fused(
                xx, mode,
                None if lnp is None else lnp["weight"],
                None if lnp is None else lnp["bias"],
                eps=eps,
            )
        else:
            xq, rs = act_quant_rowwise(_apply_pre(xx, pre, eps))
        return tuple(
            qmm_i8(xq, rs, pp["weight_q"], pp["weight_scale"], out_dtype=xx.dtype)
            for pp in plist
        )

    if isinstance(act_ok, bool):
        return i8_branch(x) if act_ok else deq_branch(_apply_pre(x, pre, eps))
    x = _apply_pre(x, pre, eps)
    pre = None
    return lax.cond(act_ok, i8_branch, deq_branch, x)


def _merge_edge(blk: dict, edge: dict) -> dict:
    """Substitute a quantized layer tree's {weight_q, weight_scale} nodes
    with the bf16 {weight} from the blocks_edge side tree (the reference's
    full-bf16 first/last-layer policy, ref: dit_module.py:407)."""
    out = {}
    for k, v in blk.items():
        if isinstance(v, dict):
            if "weight_q" in v or "weight_q4" in v:
                out[k] = {"weight": edge[k]["weight"]}
            else:
                out[k] = _merge_edge(v, edge.get(k, {}))
        else:
            out[k] = v
    return out


def _bias_modulate_add(x, residual, gate, post_norm_params, eps, zero_centered, n_seg):
    """fp32(gate[seg] * x) -> post_norm -> +residual (ref: dit_module.py:292-307).
    The reference's Triton range_mod gather (N4) reduces to a per-segment
    broadcast because segments are equal-length.

    On TPU this runs as ONE Pallas pass (ops/fused_norm.py): expressed in
    plain JAX, XLA splits the chain into a stats fusion and an apply fusion
    with the gated f32 [S, D] activation materialized in HBM between them
    (~12% of a denoise step across the call sites, docs/perf_notes.md) —
    the fused Triton/Apex kernels the reference uses never pay that
    round-trip.  Under a seq-sharded mesh a seq-manual shard_map slices the
    per-segment gate by shard (gate_norm_residual_sharded); on a tp-only
    mesh the unfused XLA chain stays (it row-partitions over tp, which
    beats a tp-replicated kernel pass)."""
    S, D = x.shape
    if _use_pallas():
        from magi_tpu.parallel import mesh as mesh_lib
        from magi_tpu.ops.fused_norm import gate_norm_residual, gate_norm_residual_sharded

        w = post_norm_params["weight"]
        b = post_norm_params["bias"]
        if mesh_lib.model_parallel_trivial():
            return gate_norm_residual(
                x, residual, gate, w, b, eps=eps, zero_centered=zero_centered,
                n_seg=n_seg,
            )
        if mesh_lib.seq_shards(mesh_lib.get_mesh()) > 1:
            out = gate_norm_residual_sharded(
                x, residual, gate, w, b, eps=eps, zero_centered=zero_centered,
                n_seg=n_seg,
            )
            if out is not None:
                return out
    xf = x.astype(jnp.float32).reshape(n_seg, S // n_seg, D)
    xf = xf * gate.astype(jnp.float32)[:, None, :]
    xf = xf.reshape(S, D)
    xf = layer_norm(xf, post_norm_params, eps, zero_centered, compute_dtype=jnp.float32)
    return (xf + residual.astype(jnp.float32)).astype(residual.dtype)


def attention_forward(
    p: dict,
    cfg: ModelConfig,
    x: jnp.ndarray,  # [S, D] bf16
    y_xattn: jnp.ndarray,  # [n_seg, L, xattn_hidden] (fp32 from embedder)
    sin: jnp.ndarray,
    cos: jnp.ndarray,
    cache_l: jnp.ndarray,  # [2, hk*rep, max_tok, hd] — kernel layout
    meta: ForwardMeta,
    high_precision: bool,
    act_quant_ok=False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FullyParallelAttention (ref: dit_module.py:851-1246).
    Returns (core_attn_out [S, hq*hd], xattn_out [S, hq*hd], new_cache_l)."""
    S, D = x.shape
    hd = cfg.kv_channels
    hq = cfg.num_attention_heads
    hk = cfg.num_query_groups
    eps = cfg.layernorm_epsilon
    zc = cfg.apply_layernorm_1p
    n_seg, ctn = meta.n_segments, meta.seg_len

    # q/qx/k/v share the pre-LN output: one activation quantization covers
    # all four; the LN rides into the group as `pre` so the int8 path can
    # fuse LN + row-max + int8 cast into one Pallas pass
    q, qx, k, v = _linears_shared(
        x,
        [p["linear_qkv"]["q"], p["linear_qkv"]["qx"], p["linear_qkv"]["k"], p["linear_qkv"]["v"]],
        act_quant_ok,
        pre=("ln", p["linear_qkv"]["layer_norm"]), eps=eps,
    )

    # --- self-attn q/k/v with fp32 QK-norm + rope (ref: dit_module.py:953-1003) ---
    q = q.reshape(S, hq, hd)
    # On the Pallas paths the fp32 q-norm + rotary run INSIDE the kernel
    # prologue (saves the f32 materialization + layout copies — ~14% of a
    # step, docs/perf_notes.md); elsewhere they run here.
    fuse_q = _use_pallas() and hd % 128 == 0
    if fuse_q:
        qw = p["q_layernorm"]["weight"].astype(jnp.float32) + (1.0 if zc else 0.0)
        qb = p["q_layernorm"]["bias"].astype(jnp.float32)
        q_pro = (qw, qb, sin, cos, eps)
        q = q.astype(x.dtype)
    else:
        q_pro = None
        q = layer_norm(q, p["q_layernorm"], eps, zc, compute_dtype=jnp.float32)
        q = apply_rotary(q, sin, cos).astype(x.dtype)

    v = v.reshape(S, hk, hd)
    k = k.reshape(S, hk, hd)

    # --- fused k-side epilogue: fp32 k-layernorm + rotary + bf16 cast +
    # pack into the kernel/cache layout [2, hk*rep, S, hd], with GQA
    # head replication (lifts the 8-way Ulysses cap when head shards >
    # kv heads, ref: context_parallel.py:393-394) done by the output
    # grid.  The Pallas version removes the fp32 k materialization, its
    # relayout copies, the stack copy AND (cache stored in this layout)
    # the per-layer cache transpose (docs/perf_notes.md k-side item). ---
    from magi_tpu.ops.attention import kv_norm_rope_pack, kv_norm_rope_pack_reference
    from magi_tpu.parallel import mesh as mesh_lib

    rep = mesh_lib.kv_replication(hq, hk)
    kw = p["k_layernorm"]["weight"].astype(jnp.float32) + (1.0 if zc else 0.0)
    kb = p["k_layernorm"]["bias"].astype(jnp.float32)
    if _use_pallas() and hd % 128 == 0 and mesh_lib.model_parallel_trivial():
        if _attn_int8_store():
            # fused per-token int8 quantization (VERDICT r3 #7): the pack
            # kernel emits {kv int8, scales} directly — the separate
            # quantize pass's full kv read+write disappears from the step
            kv8_f, sc_f = kv_norm_rope_pack(
                k, v, kw, kb, sin, cos, eps=eps, rep=rep, quantize=True
            )
            kv = {"kv": kv8_f, "scale": sc_f}
        else:
            kv = kv_norm_rope_pack(k, v, kw, kb, sin, cos, eps=eps, rep=rep, out_dtype=x.dtype)
    else:
        # XLA path (CPU / meshes — a Pallas call is opaque to the SPMD
        # partitioner and would replicate sharded operands)
        kv = kv_norm_rope_pack_reference(k, v, kw, kb, sin, cos, eps=eps, rep=rep, out_dtype=x.dtype)

    # --- KV cache (ref: dit_module.py:891-946) ---
    # The global ranges [s, e) span cache tokens [0, C0) followed by the
    # current window; split them into per-source ranges so the cache stays
    # a read-only buffer (no per-layer cache⊕current copy).
    gs = meta.self_attn.kv_start
    ge = meta.self_attn.kv_end
    if meta.use_kv_cache:
        start_tok = meta.slice_point * ctn
        if meta.update_kv_cache:
            # write-all-on-update; the distill ride-along chunk is excluded
            # (ref: dit_module.py:918-929)
            clip = S - ctn if meta.distill_nearly_clean_chunk else S
            if isinstance(cache_l, dict):
                # int8-STORED cache: the written slice is already quantized
                # when the fused pack kernel ran (kv is a dict); otherwise
                # quantize it once here instead of requantizing the whole
                # buffer every forward
                if isinstance(kv, dict):
                    kv8_w = kv["kv"][:, :, :clip]
                    sc_w = kv["scale"][:, :, :clip]
                else:
                    from magi_tpu.ops.attention_q8 import quantize_kv_per_token

                    kv8_w, sc_w = quantize_kv_per_token(kv[:, :, :clip])
                new_cache_l = {
                    "kv": lax.dynamic_update_slice(
                        cache_l["kv"], kv8_w, (0, 0, start_tok, 0)
                    ),
                    "scale": lax.dynamic_update_slice(
                        cache_l["scale"], sc_w, (0, 0, start_tok)
                    ),
                }
            else:
                new_cache_l = lax.dynamic_update_slice(
                    cache_l, kv[:, :, :clip].astype(cache_l.dtype), (0, 0, start_tok, 0)
                )
        else:
            new_cache_l = cache_l
        r1s = jnp.minimum(gs, start_tok)
        r1e = jnp.minimum(ge, start_tok)
        r2s = jnp.maximum(gs - start_tok, 0)
        r2e = jnp.maximum(ge - start_tok, 0)
        cache_in = cache_l if isinstance(cache_l, dict) else cache_l.astype(x.dtype)
        core = _attention_cached(
            q, cache_in, kv, r1s, r1e, r2s, r2e, seg_len=ctn,
            q_pro=q_pro,
        )
    else:
        # no-cache forwards (the uncond CFG branch) ride the same
        # two-source kernel with an EMPTY first source — the packed kv is
        # already in kernel layout, so no relayout back to [S, hk, hd]
        new_cache_l = cache_l
        hk_kv = (kv["kv"] if isinstance(kv, dict) else kv).shape[1]
        if isinstance(kv, dict):
            zero_kv = {
                "kv": jnp.zeros((2, hk_kv, 0, hd), jnp.int8),
                "scale": jnp.zeros((2, hk_kv, 0), jnp.float32),
            }
        else:
            zero_kv = jnp.zeros((2, hk_kv, 0, hd), kv.dtype)
        z = jnp.zeros_like(gs)
        core = _attention_cached(
            q, zero_kv, kv, z, z, gs, ge, seg_len=ctn, q_pro=q_pro,
        )
    core = core.reshape(S, hq * hd)

    # --- cross-attn (ref: dit_module.py:1005-1021, 1098-1136) ---
    qx = qx.reshape(S, hq, hd)
    if fuse_q:
        # norm-only fused prologue (the caption cross-attention has no rope,
        # ref: dit_module.py:1005-1021)
        qxw = p["q_layernorm_xattn"]["weight"].astype(jnp.float32) + (1.0 if zc else 0.0)
        qxb = p["q_layernorm_xattn"]["bias"].astype(jnp.float32)
        qx_pro = (qxw, qxb, None, None, eps)
        qx = qx.astype(x.dtype)
    else:
        qx_pro = None
        qx = layer_norm(qx, p["q_layernorm_xattn"], eps, zc)

    L = y_xattn.shape[1]
    y_flat = y_xattn.reshape(n_seg * L, -1).astype(x.dtype)
    (kv_x,) = _linears_shared(y_flat, [p["linear_kv_xattn"]], act_quant_ok)
    kv_x = kv_x.reshape(n_seg * L, hk, 2 * hd)
    if rep > 1:
        kv_x = jnp.repeat(kv_x, rep, axis=1)
    k_x = layer_norm(kv_x[..., :hd], p["k_layernorm_xattn"], eps, zc)
    v_x = kv_x[..., hd:]

    x_starts = jnp.arange(n_seg, dtype=jnp.int32) * L
    x_ends = x_starts + meta.y_lens.astype(jnp.int32)
    xattn = _attention(qx, k_x, v_x, x_starts, x_ends, seg_len=ctn, q_pro=qx_pro)
    xattn = xattn.reshape(S, hq * hd)

    return core, xattn, new_cache_l


def layer_forward(
    p: dict,
    cfg: ModelConfig,
    x: jnp.ndarray,  # [S, D]
    condition: jnp.ndarray,  # [n_seg, cond_hidden] fp32
    y_xattn: jnp.ndarray,
    sin: jnp.ndarray,
    cos: jnp.ndarray,
    cache_l: jnp.ndarray,
    meta: ForwardMeta,
    high_precision: bool,
    act_quant_ok=False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One parallel-attention transformer layer (ref: dit_module.py:1252-1367)."""
    from magi_tpu.parallel.mesh import SEQ_AXES, constraint

    eps = cfg.layernorm_epsilon
    zc = cfg.apply_layernorm_1p
    x = constraint(x, SEQ_AXES, None)  # sequence-sharded between attentions
    residual = x

    core, xattn, new_cache_l = attention_forward(
        p["self_attention"], cfg, x, y_xattn, sin, cos, cache_l, meta, high_precision,
        act_quant_ok,
    )

    # concat only — the reference's TP8-legacy head interleave
    # (ref: dit_module.py:1332-1338) is folded into linear_proj's weight
    # rows at load time (checkpoint/loader._fold_tp8_interleave), so no
    # runtime relayout copy happens here
    attn_out = jnp.concatenate([core, xattn], axis=-1)  # [S, 2*hq*hd]
    (attn_out,) = _linears_shared(
        attn_out, [p["self_attention"]["linear_proj"]], act_quant_ok,
        high_precision=high_precision, kind="row",
    )
    attn_out = attn_out.astype(x.dtype)

    # gating (ref: dit_module.py:1348-1367)
    gate = ada_modulate_forward(p["ada_modulate_layer"], condition)
    gate = softcap(gate, 1.0)
    gate_msa, gate_mlp = jnp.split(gate, 2, axis=-1)

    x = _bias_modulate_add(attn_out, residual, gate_msa, p["self_attn_post_norm"], eps, zc, meta.n_segments)

    residual = x
    # LN and SwiGLU ride into their consumer linears as `pre` (fused with
    # the int8 act-quant on the single-chip quantized path)
    (h,) = _linears_shared(
        x, [p["mlp"]["linear_fc1"]], act_quant_ok,
        pre=("ln", p["mlp"]["layer_norm"]), eps=eps,
    )
    if cfg.gated_linear_unit:
        (h,) = _linears_shared(
            h, [p["mlp"]["linear_fc2"]], act_quant_ok, kind="row",
            pre=("swiglu",), eps=eps,
        )
    else:
        h = jax.nn.gelu(h, approximate=False)
        (h,) = _linears_shared(h, [p["mlp"]["linear_fc2"]], act_quant_ok, kind="row")
    x = _bias_modulate_add(h, residual, gate_mlp, p["mlp_post_norm"], eps, zc, meta.n_segments)
    x = constraint(x, SEQ_AXES, None)
    return x, new_cache_l


def patchify(x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """[C, T, H, W] -> [T' * H' * W', C * tp * p * p] matching the Conv3d
    stride=kernel patch embed (ref: dit_model.py:67-73) + the
    '(T H W) N C' token order (ref: dit_model.py:295)."""
    C, T, H, W = x.shape
    tp, p = cfg.t_patch_size, cfg.patch_size
    x = x.reshape(C, T // tp, tp, H // p, p, W // p, p)
    # token (t,h,w); feature (C, tp, ph, pw) — conv weight layout [D, C, tp, p, p]
    x = x.transpose(1, 3, 5, 0, 2, 4, 6)
    return x.reshape((T // tp) * (H // p) * (W // p), C * tp * p * p)


def unpatchify(x: jnp.ndarray, cfg: ModelConfig, T_patch: int, H: int, W: int) -> jnp.ndarray:
    """[S, tp*p*p*C_out] -> [C_out, T, H*p, W*p] (ref: dit_model.py:103-112,
    feature order '(pT pH pW C)')."""
    tp, p = cfg.t_patch_size, cfg.patch_size
    C = cfg.out_channels
    x = x.reshape(T_patch, H, W, tp, p, p, C)
    x = x.transpose(6, 0, 3, 1, 4, 2, 5)  # C, T', tp, H, p, W, p
    return x.reshape(C, T_patch * tp, H * p, W * p)


def dit_prologue(
    params: dict,
    config: MagiConfig,
    x: jnp.ndarray,  # [C, T, H, W] latent (fp32 or bf16)
    t: jnp.ndarray,  # [n_seg] timesteps
    y: jnp.ndarray,  # [n_seg, L, caption_channels]
    caption_dropout: jnp.ndarray,  # scalar bool
    meta: ForwardMeta,
    t_offsets: jnp.ndarray,  # int32 [n_seg] temporal patch-grid offsets
    distill_factor: Optional[jnp.ndarray] = None,
):
    """Embedding + meta stage, fp32 island (ref: dit_model.py:114-339).
    Returns (h [S, D], condition, y_xattn, sin, cos)."""
    mc = config.model_config
    ec = config.engine_config

    x = x.astype(jnp.float32) * mc.x_rescale_factor
    if mc.half_channel_vae:
        x = jnp.concatenate([x, x], axis=0)  # (ref: dit_model.py:271-274)
    C, T, H, W = x.shape
    Hp, Wp = H // mc.patch_size, W // mc.patch_size
    Tp = T // mc.t_patch_size
    tokens = patchify(x, mc) @ params["x_embedder"]["weight"].astype(jnp.float32)  # [S, D]

    chunk_patches = Tp // meta.n_segments
    sin, cos = rope_3d_segments(params["rope"]["bands"], t_offsets, chunk_patches, Hp, Wp)

    t_emb = t_embedder_forward(params["t_embedder"], t)
    if ec.distill:
        assert distill_factor is not None, "distill mode requires distill_factor"
        dt = jnp.broadcast_to(jnp.asarray(distill_factor, jnp.float32), t.shape)
        t_emb = t_emb + t_embedder_forward(params["t_embedder"], dt)

    from magi_tpu.parallel.mesh import replicated

    y = replicated(y)
    y_xattn, y_adaln = y_embedder_forward(params["y_embedder"], y, caption_dropout)
    if y_adaln.ndim == 1:
        y_adaln = y_adaln[None, :]
    condition = (t_emb + y_adaln).astype(jnp.float32)  # [n_seg, ch]
    # Anchor the small condition tensors as replicated: they feed tp
    # column-parallel matmuls / head-sharded attention in every layer, and
    # letting XLA back-propagate those shardings into the embedder reshapes
    # triggers involuntary full rematerialization (replicate+repartition
    # all-gathers per layer at scale).
    condition = replicated(condition)
    y_xattn = replicated(y_xattn)

    h = tokens.astype(mc.params_dtype)
    return h, condition, y_xattn, sin, cos


def dit_epilogue(params: dict, config: MagiConfig, h: jnp.ndarray, Tp: int, Hp: int, Wp: int):
    """Final fused LN + fp32 final linear + unpatchify
    (ref: dit_model.py:341-360)."""
    mc = config.model_config
    h = layer_norm(h.astype(jnp.float32), params["final_layernorm"], mc.layernorm_epsilon, mc.apply_layernorm_1p)
    out = final_linear_forward(params["final_linear"], h)
    out = unpatchify(out, mc, Tp, Hp, Wp)
    if mc.half_channel_vae:
        out = out[: mc.out_channels // 2]  # (ref: dit_model.py:354-356, 32->16)
    return out / mc.x_rescale_factor


def _apply_layer_routed(blk, edge, config, hh, cache_l, idx, condition, y_xattn, sin, cos, meta):
    """One transformer layer with the quantized-tree routing: middle
    layers run int8 weights + int8 activation quant; layers 0 / L-1 run
    FULL bf16 via the blocks_edge side tree (ref: dit_module.py:407).
    Shared by the in-jit lax.scan (dit_forward) and the host-streamed
    per-layer loop (dit_layer_step)."""
    mc = config.model_config
    ec = config.engine_config
    kw = dict(high_precision=ec.high_precision_matmul)
    if edge is None:
        act_ok = jnp.logical_and(idx > 0, idx < mc.num_layers - 1)
        return layer_forward(
            blk, mc, hh, condition, y_xattn, sin, cos, cache_l, meta,
            act_quant_ok=act_ok, **kw,
        )
    is_edge = jnp.logical_or(idx == 0, idx == mc.num_layers - 1)

    def quant_branch(ops):
        hh_, cl = ops
        return layer_forward(
            blk, mc, hh_, condition, y_xattn, sin, cos, cl, meta,
            act_quant_ok=True, **kw,
        )

    def edge_branch(ops):
        hh_, cl = ops
        ew = jax.tree_util.tree_map(
            lambda a, b: jnp.where(idx == 0, a, b), edge["first"], edge["last"]
        )
        return layer_forward(
            _merge_edge(blk, ew), mc, hh_, condition, y_xattn, sin, cos, cl, meta,
            act_quant_ok=False, **kw,
        )

    return lax.cond(is_edge, edge_branch, quant_branch, (hh, cache_l))


def dit_layer_step(
    params: dict,
    config: MagiConfig,
    idx: jnp.ndarray,  # int32 scalar layer index
    h: jnp.ndarray,
    cache_l: jnp.ndarray,  # [2, hk, max_tok, hd] — THIS layer's cache slab
    condition: jnp.ndarray,
    y_xattn: jnp.ndarray,
    sin: jnp.ndarray,
    cos: jnp.ndarray,
    meta: ForwardMeta,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ONE layer applied by index from the stacked tree — the unit of the
    host-offloaded KV path (transport.HostKVCache): a python loop replaces
    the lax.scan and each layer's cache slab streams host<->HBM around
    this call (the reference's pinned-CPU kv_offload,
    ref: dit_module.py:800-819).  Single-chip only."""
    blk = jax.tree_util.tree_map(
        lambda a: lax.dynamic_index_in_dim(a, idx, 0, keepdims=False), params["blocks"]
    )
    return _apply_layer_routed(
        blk, params.get("blocks_edge"), config, h, cache_l, idx,
        condition, y_xattn, sin, cos, meta,
    )


def dit_forward(
    params: dict,
    config: MagiConfig,
    x: jnp.ndarray,  # [C, T, H, W] latent (fp32 or bf16)
    t: jnp.ndarray,  # [n_seg] timesteps
    y: jnp.ndarray,  # [n_seg, L, caption_channels]
    caption_dropout: jnp.ndarray,  # scalar bool
    kv_cache: jnp.ndarray,  # [num_layers, 2, hk, max_tok, hd] (kernel layout)
    meta: ForwardMeta,
    t_offsets: jnp.ndarray,  # int32 [n_seg] temporal patch-grid offsets
    distill_factor: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full DiT forward (ref: dit_model.py:114-398).
    Returns (velocity [C_out(base), T, H, W], new_kv_cache)."""
    mc = config.model_config
    ec = config.engine_config

    C, T, H, W = x.shape
    Hp, Wp = H // mc.patch_size, W // mc.patch_size
    Tp = T // mc.t_patch_size
    h, condition, y_xattn, sin, cos = dit_prologue(
        params, config, x, t, y, caption_dropout, meta, t_offsets, distill_factor
    )

    # --- transformer blocks via scan (ref: dit_module.py:1373-1441) ---
    layer_idx = jnp.arange(mc.num_layers, dtype=jnp.int32)
    edge = params.get("blocks_edge")

    def run_layer(blk, hh, cache_l, idx):
        return _apply_layer_routed(
            blk, edge, config, hh, cache_l, idx, condition, y_xattn, sin, cos, meta
        )

    from magi_tpu.parallel import mesh as mesh_lib

    if mesh_lib.pp_num_shards() > 1:
        # layer-FSDP over pp: the stacked weights stay sharded 1/pp on the
        # layer dim; each scan step materializes one layer via a masked
        # psum inside a pp-manual shard_map, double-buffered so the gather
        # of layer i+1 overlaps layer i's compute.  (A plain scan over the
        # pp-sharded stack hoists a FULL-stack all-gather out of the loop
        # — measured, docs/pp_scaling.md.)
        blocks = params["blocks"]
        blk0 = mesh_lib.pp_gather_layer(blocks, jnp.int32(0))

        def body_pp(carry, xs):
            hh, blk = carry
            cache_l, idx = xs
            out, new_cache_l = run_layer(blk, hh, cache_l, idx)
            nxt = mesh_lib.pp_gather_layer(
                blocks, jnp.minimum(idx + 1, mc.num_layers - 1)
            )
            return (out, nxt), new_cache_l

        (h, _), new_cache = lax.scan(body_pp, (h, blk0), (kv_cache, layer_idx))
    else:
        def body(carry, xs):
            blk_params, cache_l, idx = xs
            return run_layer(blk_params, carry, cache_l, idx)

        h, new_cache = lax.scan(body, h, (params["blocks"], kv_cache, layer_idx))

    return dit_epilogue(params, config, h, Tp, Hp, Wp), new_cache


# ---------------------------------------------------------------------------
# Parameter init (SKIP_LOAD_MODEL analog, ref: dit_model.py:600-618)
# ---------------------------------------------------------------------------


def init_dit_params(
    key: jax.Array, config: MagiConfig, zeros: bool = False, quant_bits: int = 0,
    edge_bf16: bool = True,
) -> dict:
    """Random-weight init — the SKIP_LOAD_MODEL analog (ref: dit_model.py:602).
    Uses numpy RNG for speed; real weights come from checkpoint/loader.py.
    `zeros=True` gives an instant all-zeros tree for benchmarks/compile checks.

    `quant_bits` (4 or 8) builds the tree DIRECTLY in quantized form (zeros)
    without ever materializing the bf16 weights — required for 24B on one
    chip, where the bf16 tree (46GB) cannot exist in HBM even transiently.
    `edge_bf16=False` additionally drops the first/last-layer bf16 side tree
    when HBM is the binding constraint."""
    import numpy as np

    mc = config.model_config
    D = mc.hidden_size
    hd = mc.kv_channels
    hq = mc.num_attention_heads
    hk = mc.num_query_groups
    ch = mc.cond_hidden_size
    xh = mc.xattn_cond_hidden_size
    gh = mc.gate_hidden_size
    L = mc.num_layers
    dtype = mc.params_dtype
    ffn = mc.ffn_hidden_size
    fc1_out = 2 * ffn if mc.gated_linear_unit else ffn

    # derive a host seed without eager device compute (remote backends
    # pay a compile per eager op)
    seed = int(np.asarray(jax.random.key_data(key)).sum()) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)

    def _w(shape, std, dt):
        if zeros:
            # fast benchmarking/compile-check init: TPU matmul latency is
            # data-independent, so zeros time identically to real weights
            return jnp.zeros(shape, dt)
        # uniform with matched variance (Gaussian ziggurat is ~5x slower and
        # the distribution is irrelevant for random-weight debug runs);
        # dtype cast on the host — an eager device cast would cost a
        # compile per shape on remote backends
        bound = std * 1.7320508
        arr = rng.uniform(-bound, bound, shape).astype(np.float32)
        if dt == jnp.bfloat16:
            from magi_tpu.runtime_native import f32_to_bf16

            arr = f32_to_bf16(arr)
        return jnp.asarray(arr, dt)

    def lin(i, o, dt=dtype, std=0.02, stacked=True, bias=False):
        shape = (L, i, o) if stacked else (i, o)
        p = {"weight": _w(shape, std, dt)}
        if bias:
            p["bias"] = jnp.zeros(shape[:-2] + (o,), dt)
        return p

    def qlin(i, o):
        """Directly-quantized zero leaf (timing init; 0x88 nibbles == 0)."""
        if not quant_bits:
            return lin(i, o)
        assert zeros, "quant_bits init is zeros-only (benchmark/compile use)"
        if quant_bits == 4:
            return {
                "weight_q4": jnp.full((L, i // 2, o), 0x88, jnp.uint8),
                "weight_scale": jnp.full((L, o), 0.02, jnp.float32),
            }
        return {
            "weight_q": jnp.zeros((L, i, o), jnp.int8),
            "weight_scale": jnp.full((L, o), 0.02, jnp.float32),
        }

    def norm(n, dt, stacked=True):
        shape = (L, n) if stacked else (n,)
        w = jnp.zeros(shape, dt) if mc.apply_layernorm_1p else jnp.ones(shape, dt)
        return {"weight": w, "bias": jnp.zeros(shape, dt)}

    def plain_norm(n, dt, stacked=True):
        shape = (L, n) if stacked else (n,)
        return {"weight": jnp.ones(shape, dt), "bias": jnp.zeros(shape, dt)}

    blocks = {
        "ada_modulate_layer": {"proj": {"0": lin(ch, 2 * gh, bias=True)}},
        "self_attention": {
            "linear_qkv": {
                "layer_norm": plain_norm(D, dtype),
                "q": qlin(D, hq * hd),
                "qx": qlin(D, hq * hd),
                "k": qlin(D, hk * hd),
                "v": qlin(D, hk * hd),
            },
            "q_layernorm": norm(hd, jnp.float32),
            "k_layernorm": norm(hd, jnp.float32),
            "q_layernorm_xattn": norm(hd, dtype),
            "k_layernorm_xattn": norm(hd, dtype),
            "linear_kv_xattn": qlin(xh, 2 * hk * hd),
            "linear_proj": qlin(2 * hq * hd, D),
        },
        "self_attn_post_norm": norm(D, jnp.float32),
        "mlp": {
            "layer_norm": plain_norm(D, dtype),
            "linear_fc1": qlin(D, fc1_out),
            "linear_fc2": qlin(ffn, D),
        },
        "mlp_post_norm": norm(D, jnp.float32),
    }

    in_feat = mc.in_channels * mc.t_patch_size * mc.patch_size**2
    params = {
        "x_embedder": {"weight": _w((in_feat, D), 0.02, jnp.float32)},
        "rope": {"bands": default_bands(D // hq)},
        "blocks": blocks,
        "final_layernorm": norm(D, jnp.float32, stacked=False),
    }
    if quant_bits and edge_bf16:
        def z(i, o):
            return {"weight": jnp.zeros((i, o), dtype)}

        def edge_tree():
            return {
                "self_attention": {
                    "linear_qkv": {"q": z(D, hq * hd), "qx": z(D, hq * hd),
                                   "k": z(D, hk * hd), "v": z(D, hk * hd)},
                    "linear_kv_xattn": z(xh, 2 * hk * hd),
                    "linear_proj": z(2 * hq * hd, D),
                },
                "mlp": {"linear_fc1": z(D, fc1_out), "linear_fc2": z(ffn, D)},
            }

        params["blocks_edge"] = {"first": edge_tree(), "last": edge_tree()}
    params.update(init_embedder_params(rng, mc, zeros=zeros))
    return params


def init_dit_params_on_device(key: jax.Array, config: MagiConfig) -> dict:
    """Random init generated ON DEVICE in one jitted program — no multi-GB
    host->device weight transfer (SKIP_LOAD debug path on slow links).

    The zeros/ones skeleton is built on host CPU (no device memory); only
    the small non-random leaves (norms, biases, rope bands) are shipped,
    and every matmul weight is drawn on device in its target dtype."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        skeleton = init_dit_params(key, config, zeros=True)
    flat, treedef = jax.tree_util.tree_flatten_with_path(skeleton)

    randomized = []
    for path, leaf in flat:
        path_str = "/".join(str(getattr(kk, "key", kk)) for kk in path)
        is_matmul = path_str.endswith("weight") and leaf.ndim >= 2 and not any(
            n in path_str for n in ("layer_norm", "layernorm", "post_norm")
        )
        randomized.append(is_matmul or "null_caption_embedding" in path_str)

    shapes = [(leaf.shape, leaf.dtype) for _, leaf in flat]
    small = [leaf for (_, leaf), r in zip(flat, randomized) if not r]

    def build(k, small_leaves):
        out = []
        bound = 0.02 * (3.0 ** 0.5)
        it = iter(small_leaves)
        for i, ((shape, dt), do_rand) in enumerate(zip(shapes, randomized)):
            if do_rand:
                out.append(jax.random.uniform(jax.random.fold_in(k, i), shape, dt, -bound, bound))
            else:
                out.append(next(it))
        return jax.tree_util.tree_unflatten(treedef, out)

    # under a mesh, generate each leaf directly INTO its shard layout
    # (pp layer-FSDP / tp column-row; no post-hoc reshard pass)
    from magi_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_mesh()
    if not mesh_lib.mesh_is_trivial(mesh):
        from jax.sharding import NamedSharding

        specs = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), mesh_lib.dit_param_specs(skeleton)
        )
        return jax.jit(build, out_shardings=specs)(key, small)
    return jax.jit(build)(key, small)


def kv_cache_shape(config: MagiConfig, max_tokens: int) -> tuple:
    # [layers, k|v, kv_heads, tokens, head_dim] — the attention KERNEL's
    # layout, so cache reads need zero relayout (the two-source kernel
    # DMAs [head, token-slice, :] directly from this buffer); kv heads
    # carry the GQA replication factor under wide head-sharded meshes
    # (mesh.kv_replication)
    from magi_tpu.parallel.mesh import kv_replication

    mc = config.model_config
    rep = kv_replication(mc.num_attention_heads, mc.num_query_groups)
    return (mc.num_layers, 2, mc.num_query_groups * rep, max_tokens, mc.kv_channels)


def init_kv_cache(config: MagiConfig, max_tokens: int, dtype=None, int8=None):
    """KV cache buffer.  In int8-attention mode (see `_attn_int8_store`) the
    cache is STORED quantized — {'kv': int8 [L,2,G,tok,hd], 'scale': f32
    [L,2,G,tok]} — halving cache HBM and skipping the per-forward cache
    requantization (quantization is deterministic, so quantize-at-write
    equals quantize-every-forward exactly; tested).  Otherwise a plain
    [L,2,G,tok,hd] array in params_dtype."""
    shape = kv_cache_shape(config, max_tokens)
    if int8 is None:
        int8 = _attn_int8_store()
    if int8:
        return {
            "kv": jnp.zeros(shape, jnp.int8),
            "scale": jnp.zeros(shape[:-1], jnp.float32),
        }
    dtype = dtype or config.model_config.params_dtype
    return jnp.zeros(shape, dtype)
