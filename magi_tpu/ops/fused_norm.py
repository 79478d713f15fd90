"""Fused gate-modulate + LayerNorm + residual-add Pallas kernel.

The post-attention / post-MLP epilogue of every DiT layer is
``bf16_out = bf16( LN_fp32(gate[seg] * x) + residual )``
(ref: dit_module.py:292-307 range_mod + FusedLayerNorm).  Expressed in
plain JAX, XLA splits the chain into a stats fusion and an apply fusion
with the gated activation materialized in HBM as f32 [S, D] between them
— an extra 2×f32 HBM round-trip per call that the reference's fused
Triton/Apex kernels never pay.  This kernel does the whole epilogue in
one VMEM pass: bf16 reads, f32 VPU compute (numerics identical to the
unfused path), bf16 write.

Rows are independent, so the row-block edge at a non-divisible seg_len
is handled by Pallas' automatic boundary masking (out-of-bounds rows are
computed on padded garbage and dropped on store).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _kernel(x_ref, res_ref, gate_ref, w_ref, b_ref, o_ref, *, eps: float,
            zero_centered: bool):
    xf = x_ref[0].astype(jnp.float32)  # [R, D]
    xf = xf * gate_ref[0, 0][None, :].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * lax.rsqrt(var + eps)
    w = w_ref[0].astype(jnp.float32)
    if zero_centered:
        w = w + 1.0
    xn = xn * w[None, :] + b_ref[0][None, :].astype(jnp.float32)
    out = xn + res_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def gate_norm_residual(
    x: jax.Array,  # [S, D]
    residual: jax.Array,  # [S, D]
    gate: jax.Array,  # [n_seg, D] (f32 or bf16)
    weight: jax.Array,  # [D]
    bias: jax.Array,  # [D]
    *,
    eps: float,
    zero_centered: bool,
    n_seg: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns bf16( LN_fp32(gate[seg] ⊙ x) + residual ), one HBM pass."""
    S, D = x.shape
    assert S % n_seg == 0, (S, n_seg)
    seg_len = S // n_seg
    # the f32 row tile lives on the Mosaic kernel stack (~3 live [r, D]
    # arrays); 256x3072 fits the 16MB scoped-vmem cap, 256x6144 (24B)
    # measured 18MB > cap — scale rows down with D, keeping r*D <= 768K
    max_r = max(8, (786_432 // max(D, 1)) // 8 * 8)
    r = min(block_rows, seg_len, max_r)
    n_rb = (seg_len + r - 1) // r

    xs = x.reshape(n_seg, seg_len, D)
    rs = residual.reshape(n_seg, seg_len, D)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, zero_centered=zero_centered),
        grid=(n_seg, n_rb),
        in_specs=[
            pl.BlockSpec((1, r, D), lambda s, i: (s, i, 0)),
            pl.BlockSpec((1, r, D), lambda s, i: (s, i, 0)),
            # [n_seg, 1, D] view so the block's LAST TWO dims (1, D) equal
            # the array's (Mosaic forbids a sublane block of 1 over n_seg)
            pl.BlockSpec((1, 1, D), lambda s, i: (s, 0, 0)),
            pl.BlockSpec((1, D), lambda s, i: (0, 0)),
            pl.BlockSpec((1, D), lambda s, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, D), lambda s, i: (s, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_seg, seg_len, D), residual.dtype),
        interpret=interpret,
    )(xs, rs, gate.reshape(n_seg, 1, D), weight.reshape(1, D), bias.reshape(1, D))
    return out.reshape(S, D)


def gate_norm_residual_sharded(
    x: jax.Array,  # [S, D] sharded P((cp, pp), None)
    residual: jax.Array,  # [S, D] same sharding
    gate: jax.Array,  # [n_seg, D] replicated
    weight: jax.Array,  # [D]
    bias: jax.Array,  # [D]
    *,
    eps: float,
    zero_centered: bool,
    n_seg: int,
    interpret: bool = False,
):
    """The fused epilogue under a model-parallel mesh: a seq-manual
    shard_map so the opaque pallas_call never forces replication of the
    seq-sharded activations.  Each shard covers a contiguous row range;
    the per-segment gate is sliced by shard index.  Returns None when the
    shard grid does not align with segment boundaries (caller falls back
    to the unfused XLA chain).  tp/dp stay auto — rows are independent and
    x is tp-replicated at this point in the layer."""
    from jax.sharding import PartitionSpec as P

    from magi_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_mesh()
    n_sh = mesh_lib.seq_shards(mesh)
    if n_sh == 1:
        return gate_norm_residual(
            x, residual, gate, weight, bias, eps=eps,
            zero_centered=zero_centered, n_seg=n_seg, interpret=interpret,
        )
    S, D = x.shape
    seg_len = S // n_seg
    if S % n_sh:
        return None
    local_S = S // n_sh
    if n_seg % n_sh == 0:
        segs_per = n_seg // n_sh  # each shard holds whole segments
    elif local_S <= seg_len and seg_len % local_S == 0:
        segs_per = 0  # each shard is a fraction of ONE segment
    else:
        return None  # a shard would straddle a segment boundary

    pp_n = mesh.shape[mesh_lib.AXIS_PP]

    def body(xx, rr, gg, ww, bb):
        # SEQ_AXES = (cp, pp): cp is the slower-varying split of dim 0
        i = lax.axis_index(mesh_lib.AXIS_CP) * pp_n + lax.axis_index(mesh_lib.AXIS_PP)
        if segs_per:
            g = lax.dynamic_slice_in_dim(gg, i * segs_per, segs_per, 0)
            ns = segs_per
        else:
            g = lax.dynamic_slice_in_dim(gg, i * local_S // seg_len, 1, 0)
            ns = 1
        return gate_norm_residual(
            xx, rr, g, ww, bb, eps=eps, zero_centered=zero_centered,
            n_seg=ns, interpret=interpret,
        )

    seq = P(mesh_lib.SEQ_AXES, None)
    fn = jax.shard_map(
        body,
        mesh=mesh_lib.shard_map_mesh(),
        in_specs=(seq, seq, P(), P(), P()),
        out_specs=seq,
        axis_names={mesh_lib.AXIS_CP, mesh_lib.AXIS_PP},
        check_vma=False,  # pallas_call out_shape carries no vma
    )
    return fn(x, residual, gate, weight, bias)
