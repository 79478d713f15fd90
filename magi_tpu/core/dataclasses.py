"""Forward-pass metadata containers.

TPU-native analog of the reference's packed-attention dataclasses
(ref: inference/common/dataclass.py:22-59).  The key redesign: MAGI's
packed sequences are always *equal-length chunks* (`clip_token_nums`
tokens per chunk), so instead of materializing per-token cu_seqlens /
condition maps we keep:

  * static ints (segment count, segment length) -> jit specialization keys
  * small dynamic int32 arrays (kv ranges, caption lengths, slice point)
    -> plain traced values, so the sliding ARDF window does NOT trigger
    recompilation (the reference fought this with disabled CUDA-graph
    machinery, ref: context_parallel.py:100-131)

`InferenceParams`' mutable per-layer dict (ref: dataclass.py:62-83) becomes
an explicit stacked KV-cache array threaded through `lax.scan` — see
`init_kv_cache` / `attention_forward` in models/dit/model.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@dataclasses.dataclass(frozen=True)
class SegmentAttnSpec:
    """Per-segment attention ranges (MagiAttention q/k-range semantics,
    ref: dit_module.py:1031-1045).

    Queries are `n_segments` contiguous equal blocks of `seg_len` tokens;
    segment i attends kv tokens [kv_start[i], kv_end[i]) of the kv view.
    """

    kv_start: Any  # int32 [n_segments]
    kv_end: Any  # int32 [n_segments]


_register(SegmentAttnSpec, data_fields=("kv_start", "kv_end"), meta_fields=())


@dataclasses.dataclass(frozen=True)
class ForwardMeta:
    """Everything the DiT forward needs besides tensors.

    Static fields become jit specialization keys; there are only
    O(window_size) distinct combinations per generation run.
    Replaces the reference `ModelMetaArgs` (ref: dataclass.py:44-59).
    """

    # --- static (hashable, part of the compiled signature) ---
    n_segments: int  # denoising_range_num (incl. extra clean chunk if any)
    seg_len: int  # clip_token_nums = chunk_width/t_patch * H/p * W/p
    H: int  # latent patch-grid height
    W: int  # latent patch-grid width
    T_total: int  # total latent frames incl. cached history (rope extent)
    update_kv_cache: bool  # write current kv into the cache
    use_kv_cache: bool  # read history from the cache (view = cache âŠ• cur)
    distill_nearly_clean_chunk: bool  # last segment is the ride-along copy
    fwd_extra_1st_chunk: bool  # first segment is a clean chunk (t=clean_t)

    # --- dynamic (traced) ---
    slice_point: Any  # int32 scalar: #chunks already clean (cache offset)
    self_attn: SegmentAttnSpec  # ranges into the kv view (token units)
    y_lens: Any  # int32 [n_segments]: valid caption tokens per segment

    @property
    def total_q(self) -> int:
        return self.n_segments * self.seg_len


_register(
    ForwardMeta,
    data_fields=("slice_point", "self_attn", "y_lens"),
    meta_fields=(
        "n_segments",
        "seg_len",
        "H",
        "W",
        "T_total",
        "update_kv_cache",
        "use_kv_cache",
        "distill_nearly_clean_chunk",
        "fwd_extra_1st_chunk",
    ),
)
