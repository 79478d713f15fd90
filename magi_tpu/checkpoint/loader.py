"""DiT checkpoint loading: sharded safetensors (+zstd) -> our parameter
pytree (ref: inference/infra/checkpoint/checkpointing.py).

Differences from the reference:
  * PP layer-slicing / re-keying (ref: :116-137) is unnecessary — layers
    are stacked and sharded onto the mesh by `dit_param_specs`.
  * zstd decompression uses python-zstandard in-process instead of an
    external `zstd` subprocess (ref: :40-51).
  * fp8 variants are dequantized to bf16 at load (native fp8 matmul path
    is engine-gated; weights are exact under dequant).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict

import jax.numpy as jnp
import numpy as np

from magi_tpu.core.config import MagiConfig
from magi_tpu.core.logger import print_rank_0


def _read_shard(path: str) -> Dict[str, np.ndarray]:
    """Load one safetensors shard, transparently handling `.zst`
    (ref: _load_shard, checkpointing.py:35-65; the reference shells out to
    a zstd subprocess — ours is in-process, native when available)."""
    from safetensors.numpy import load as st_load

    from magi_tpu.runtime_native import read_files

    return st_load(read_files([path])[0])


def load_state_dict(load_dir: str, fp8_quant: bool = False, distill: bool = False) -> Dict[str, np.ndarray]:
    """Resolve the weight variant subdir and load all shards in parallel
    (ref: load_state_dict + parallel loader, checkpointing.py:68-155)."""
    subdir = "inference_weight"
    if fp8_quant:
        subdir += ".fp8"
    if distill:
        subdir += ".distill"
    weight_dir = os.path.join(load_dir, subdir)
    assert os.path.isdir(weight_dir), f"weight dir not found: {weight_dir}"

    index_path = os.path.join(weight_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shard_files = sorted(set(index["weight_map"].values()))
    else:
        shard_files = sorted(
            f for f in os.listdir(weight_dir) if f.endswith(".safetensors") or f.endswith(".safetensors.zst")
        )
    assert shard_files, f"no safetensors shards under {weight_dir}"

    from magi_tpu.runtime_native import available, read_files

    state: Dict[str, np.ndarray] = {}
    if available():
        # native threaded read + zstd, then parse headers on the host
        from safetensors.numpy import load as st_load

        for blob in read_files([os.path.join(weight_dir, s) for s in shard_files]):
            state.update(st_load(blob))
    else:
        with ThreadPoolExecutor(max_workers=min(8, len(shard_files))) as ex:
            for shard in ex.map(lambda s: _read_shard(os.path.join(weight_dir, s)), shard_files):
                state.update(shard)
    print_rank_0(f"loaded {len(state)} tensors from {weight_dir}")
    return state


def _dequant_fp8(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Exactly invert the reference's fp8 execution math to recover the
    effective bf16 weight (ref: PerTensor/PerChannelQuantizedFp8Linear,
    dit_module.py:431-487).  The two classes store DIFFERENT things:

    * PerTensor (q/qx/k/v, ref :407): forward is
      ``[e4m3(x / input_scale) @ Wq^T] * input_scale * weight_scale`` —
      input_scale cancels (it only sets the activation's fp8 range), so
      the effective weight is ``Wq * weight_scale``.
    * PerChannel / smooth-quant (proj, kv_xattn, fc1, fc2, ref :462-487):
      forward is ``[e4m3(x / smooth_scale) @ Wq^T] * input_scale *
      weight_scale`` — the stored Wq is SMOOTH-FOLDED, so the effective
      weight is ``Wq * weight_scale * input_scale / smooth_scale[in]``.
      Folding only weight_scale would reconstruct ``smooth ⊙ W`` and
      silently corrupt every per-channel linear.

    Validated against a numpy emulation of the reference forward in
    scripts/ab_fp8_quality.py + tests/test_checkpoint.py."""
    out = dict(state)
    for k in list(state.keys()):
        if k.endswith(".weight_scale"):
            base = k[: -len(".weight_scale")]
            w = state.get(base + ".weight")
            if w is None:
                continue
            # stored layout is [1, out, in] (ref: dit_module.py:441,472)
            wf = w.astype(np.float32).reshape(w.shape[-2:]) if w.ndim == 3 else w.astype(np.float32)
            wf = wf * state[k].astype(np.float32).reshape(-1)[0]
            smooth = state.get(base + ".smooth_scale")
            if smooth is not None:
                inp = state.get(base + ".input_scale")
                i_s = inp.astype(np.float32).reshape(-1)[0] if inp is not None else 1.0
                wf = wf * i_s
                wf = wf / smooth.astype(np.float32).reshape(-1)[None, :]
                # the PURE smoothing factor s (x/s has the activation's own
                # scale): kept so the int8 execution path can re-fold it —
                # y = (x/s) @ (s·W) moves activation channel outliers into
                # the weight exactly as the reference's fp8 path does, and
                # measures BETTER than fp8 (scripts/ab_fp8_quality.py)
                out[base + ".act_smooth"] = (
                    smooth.astype(np.float32).reshape(-1) / i_s
                ).astype(np.float32)
            out[base + ".weight"] = wf.astype(np.float32)
            for aux in (".weight_scale", ".smooth_scale", ".input_scale"):
                out.pop(base + aux, None)
    return out


def _fold_tp8_interleave(arr: np.ndarray) -> np.ndarray:
    """Fold the reference's runtime TP8-legacy head interleave into
    linear_proj's input rows.  The reference permutes concat(core, xattn)
    as reshape(S, 2, 8, 2D/16) -> transpose(0, 2, 1, 3) before the fused
    projection (training-TP8 legacy, ref: dit_module.py:1332-1338);
    permuting the weight's input rows once at load time is mathematically
    identical and deletes a [S, 2D] relayout copy per layer per forward.
    arr: [..., in=2*hq*hd, out] (post-transpose layout)."""
    two_d = arr.shape[-2]
    assert two_d % 16 == 0, two_d
    # perm[i] = row of the reference weight that our un-permuted activation
    # column i multiplies: inverse of the runtime interleave permutation
    perm = np.arange(two_d).reshape(8, 2, two_d // 16).transpose(1, 0, 2).reshape(-1)
    return arr[..., perm, :]


def convert_dit_state(state: Dict[str, np.ndarray], config: MagiConfig) -> dict:
    """torch key names -> our pytree.  Linear weights transpose to [in,out];
    Conv3d patch embed flattens to a matmul; per-layer tensors stack on a
    leading layer axis for `lax.scan`; linear_proj input rows absorb the
    TP8-legacy head interleave (`_fold_tp8_interleave`)."""
    mc = config.model_config
    L = mc.num_layers
    dtype = mc.params_dtype

    def g(name: str) -> np.ndarray:
        return np.asarray(state[name], np.float32)

    def _host_cast(arr: np.ndarray, dt) -> jnp.ndarray:
        # dtype cast on host (native runtime when available): eager device
        # casts compile per-shape on remote backends
        if dt == jnp.bfloat16:
            from magi_tpu.runtime_native import f32_to_bf16

            arr = f32_to_bf16(arr)
        return jnp.asarray(arr, dt)

    def lin_T(name: str, dt) -> jnp.ndarray:
        return _host_cast(g(name).T, dt)

    def stacked(fmt: str, transpose: bool, dt, transform=None) -> jnp.ndarray:
        mats = [np.asarray(state[fmt.format(i)], np.float32) for i in range(L)]
        arr = np.stack([m.T if transpose else m for m in mats])
        if transform is not None:
            arr = transform(arr)
        return _host_cast(arr, dt)

    def stacked_norm(fmt: str, dt=jnp.float32) -> dict:
        return {
            "weight": stacked(fmt + ".weight", False, dt),
            "bias": stacked(fmt + ".bias", False, dt),
        }

    def stacked_smooth(fmt: str, transform=None):
        """Stack per-layer act_smooth vectors emitted by _dequant_fp8 for
        the smooth-quant (PerChannel) linears.  The reference's fp8 engine
        skips layers 0 and L-1 (ref: dit_module.py:407) — those layers ship
        plain bf16 weights with no scales, so they smooth by 1."""
        present = [i for i in range(L) if fmt.format(i) in state]
        if not present:
            return None
        dim = np.asarray(state[fmt.format(present[0])]).reshape(-1).shape[0]
        mats = [
            np.asarray(state[fmt.format(i)], np.float32).reshape(-1)
            if fmt.format(i) in state
            else np.ones(dim, np.float32)
            for i in range(L)
        ]
        arr = np.stack(mats)
        if transform is not None:
            # the smooth vector indexes the linear's INPUT rows — permute it
            # exactly as the weight's rows are permuted at load
            arr = transform(arr[..., None])[..., 0]
        return jnp.asarray(arr, jnp.float32)

    blk = "videodit_blocks.layers.{}."
    att = blk + "self_attention."
    blocks = {
        "ada_modulate_layer": {
            "proj": {
                "0": {
                    "weight": stacked(blk + "ada_modulate_layer.proj.0.weight", True, dtype),
                    "bias": stacked(blk + "ada_modulate_layer.proj.0.bias", False, dtype),
                }
            }
        },
        "self_attention": {
            "linear_qkv": {
                "layer_norm": stacked_norm(att + "linear_qkv.layer_norm", dtype),
                "q": {"weight": stacked(att + "linear_qkv.q.weight", True, dtype)},
                "qx": {"weight": stacked(att + "linear_qkv.qx.weight", True, dtype)},
                "k": {"weight": stacked(att + "linear_qkv.k.weight", True, dtype)},
                "v": {"weight": stacked(att + "linear_qkv.v.weight", True, dtype)},
            },
            # fp32 islands (ref: _high_precision_promoter, dit_model.py:621-638)
            "q_layernorm": stacked_norm(att + "q_layernorm"),
            "k_layernorm": stacked_norm(att + "k_layernorm"),
            "q_layernorm_xattn": stacked_norm(att + "q_layernorm_xattn", dtype),
            "k_layernorm_xattn": stacked_norm(att + "k_layernorm_xattn", dtype),
            "linear_kv_xattn": {"weight": stacked(att + "linear_kv_xattn.weight", True, dtype)},
            "linear_proj": {
                "weight": stacked(att + "linear_proj.weight", True, dtype, _fold_tp8_interleave)
            },
        },
        "self_attn_post_norm": stacked_norm(blk + "self_attn_post_norm"),
        "mlp": {
            "layer_norm": stacked_norm(blk + "mlp.layer_norm", dtype),
            "linear_fc1": {"weight": stacked(blk + "mlp.linear_fc1.weight", True, dtype)},
            "linear_fc2": {"weight": stacked(blk + "mlp.linear_fc2.weight", True, dtype)},
        },
        "mlp_post_norm": stacked_norm(blk + "mlp_post_norm"),
    }

    # smooth-quant activation factors (fp8 checkpoints only): attach to the
    # four PerChannel linears (ref: dit_module.py:522,535,875)
    for node, fmt, transform in (
        (blocks["self_attention"]["linear_kv_xattn"], att + "linear_kv_xattn.act_smooth", None),
        (blocks["self_attention"]["linear_proj"], att + "linear_proj.act_smooth", _fold_tp8_interleave),
        (blocks["mlp"]["linear_fc1"], blk + "mlp.linear_fc1.act_smooth", None),
        (blocks["mlp"]["linear_fc2"], blk + "mlp.linear_fc2.act_smooth", None),
    ):
        sm = stacked_smooth(fmt, transform)
        if sm is not None:
            node["act_smooth"] = sm

    xw = g("x_embedder.weight")  # [D, C, tp, p, p]
    params = {
        "x_embedder": {"weight": jnp.asarray(xw.reshape(xw.shape[0], -1).T, jnp.float32)},
        "rope": {"bands": jnp.asarray(g("rope.bands"), jnp.float32)},
        "t_embedder": {
            "mlp": {
                "0": {"weight": lin_T("t_embedder.mlp.0.weight", jnp.float32),
                      "bias": jnp.asarray(g("t_embedder.mlp.0.bias"), jnp.float32)},
                "2": {"weight": lin_T("t_embedder.mlp.2.weight", jnp.float32),
                      "bias": jnp.asarray(g("t_embedder.mlp.2.bias"), jnp.float32)},
            }
        },
        "y_embedder": {
            "y_proj_xattn": {"0": {"weight": lin_T("y_embedder.y_proj_xattn.0.weight", jnp.float32),
                                    "bias": jnp.asarray(g("y_embedder.y_proj_xattn.0.bias"), jnp.float32)}},
            "y_proj_adaln": {"0": {"weight": lin_T("y_embedder.y_proj_adaln.0.weight", jnp.float32),
                                    "bias": jnp.asarray(g("y_embedder.y_proj_adaln.0.bias"), jnp.float32)}},
            "null_caption_embedding": jnp.asarray(g("y_embedder.null_caption_embedding"), jnp.float32),
        },
        "blocks": blocks,
        "final_layernorm": {
            "weight": jnp.asarray(g("videodit_blocks.final_layernorm.weight"), jnp.float32),
            "bias": jnp.asarray(g("videodit_blocks.final_layernorm.bias"), jnp.float32),
        },
        "final_linear": {"linear": {"weight": lin_T("final_linear.linear.weight", jnp.float32)}},
    }
    return params


def load_dit_params(config: MagiConfig, mesh=None) -> dict:
    """config.runtime_config.load -> sharded parameter pytree
    (ref: load_checkpoint, checkpointing.py:158-180)."""
    ec = config.engine_config
    state = load_state_dict(config.runtime_config.load, ec.fp8_quant, ec.distill)
    if ec.fp8_quant:
        state = _dequant_fp8(state)
    params = convert_dit_state(state, config)
    from magi_tpu.parallel.mesh import shard_dit_params

    return shard_dit_params(params, mesh)
