"""Device mesh + sharding rules — the TPU-native replacement for the
reference's entire Megatron-style process-group fabric
(ref: inference/infra/distributed/parallel_state.py, 672 LoC of NCCL group
bookkeeping collapse into one `jax.sharding.Mesh`).

Axes and their meaning:
  dp : data/request parallelism (replicated weights)
  pp : the reference's pipeline dim, realized TPU-natively as layer-FSDP
       (ZeRO-3 style): the stacked layer weights are sharded 1/pp on the
       layer dim and ONE layer is materialized per scan step by a masked
       psum broadcast inside a pp-manual shard_map (`pp_gather_layer`),
       double-buffered so the gather of layer i+1 overlaps layer i's
       compute.  Activations ALSO shard over pp (it joins cp on the token
       axis and cp×tp on the head axis), so pp contributes compute
       throughput, not just memory — the memory scaling PP exists for,
       without pipeline bubbles.  (A plain scan over a pp-sharded weight
       stack does NOT work: XLA's SPMD partitioner hoists a FULL-stack
       all-gather out of the while loop — measured, see
       docs/pp_scaling.md.)
  cp : context parallelism — the packed token axis is sequence-sharded
       between attention calls; attention itself runs head-sharded.  The
       seq<->head resharding IS Ulysses (ref: context_parallel.py:381-597);
       XLA emits the all_to_all over ICI from the sharding constraints, so
       the reference's hand-rolled overlap scheduler disappears into the
       latency-hiding scheduler.
  tp : tensor parallelism (Megatron-style column/row weight sharding).

cp_shuffle_overlap (ref: context_parallel.py:257-305) exists only because
non-Hopper GPUs lack range-based flash attention; our Pallas kernel has no
such limitation, so `cp_strategy: cp_shuffle_overlap` maps onto the same
Ulysses path (config-compatible, strategy-equivalent).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None

AXIS_DP = "dp"
AXIS_PP = "pp"
AXIS_CP = "cp"
AXIS_TP = "tp"

# the packed token axis shards over cp AND pp between attentions; attention
# itself shards heads over cp x pp x tp (Ulysses).  Tuple order is the
# layout contract — kv_cache_spec, the attention shard_maps and the
# activation constraints must all agree.
SEQ_AXES = (AXIS_CP, AXIS_PP)
HEAD_AXES = (AXIS_CP, AXIS_PP, AXIS_TP)


def build_mesh(dp: int = 1, pp: int = 1, cp: int = 1, tp: int = 1, devices=None) -> Mesh:
    """Single-host: devices reshaped (dp, pp, cp, tp) in enumeration order
    (ICI-adjacent).  Multi-host slices: DCN-aware — the host boundary is
    laid onto dp first, then pp (their collectives are per-step weight
    broadcasts / none), keeping cp/tp — the all_to_all/psum-heavy axes —
    inside each host's ICI domain (the scaling-book recipe; the reference
    leaves this to torchrun rank order, example/24B/run.sh:27-32)."""
    if devices is None and jax.process_count() > 1:
        import math

        from jax.experimental import mesh_utils

        shape = [dp, pp, cp, tp]
        dcn = [1, 1, 1, 1]
        rem = jax.process_count()
        for i in range(4):  # dp first, cp/tp only as a last resort
            g = math.gcd(shape[i], rem)
            dcn[i] = g
            rem //= g
            if rem == 1:
                break
        assert rem == 1, (
            f"cannot lay {jax.process_count()} hosts over mesh {tuple(shape)}; "
            f"make dp*pp a multiple of the host count"
        )
        per_host = [s // d for s, d in zip(shape, dcn)]
        arr = mesh_utils.create_hybrid_device_mesh(per_host, dcn_mesh_shape=dcn)
        return Mesh(arr, (AXIS_DP, AXIS_PP, AXIS_CP, AXIS_TP))
    devices = devices if devices is not None else jax.devices()
    need = dp * pp * cp * tp
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    arr = np.asarray(devices[:need]).reshape(dp, pp, cp, tp)
    return Mesh(arr, (AXIS_DP, AXIS_PP, AXIS_CP, AXIS_TP))


def maybe_init_multihost() -> None:
    """Multi-host slice init (the torchrun/c10d rendezvous analog,
    ref: example/24B/run.sh:27-32): call jax.distributed.initialize() when
    a coordinator is configured."""
    import os

    if os.environ.get("MAGI_MULTIHOST") == "1" or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized / single host
            from magi_tpu.core.logger import magi_logger

            magi_logger.warning(f"jax.distributed.initialize skipped: {e}")


def initialize_mesh(config=None, *, dp=1, pp=1, cp=1, tp=1, devices=None) -> Mesh:
    """Analog of dist_init + initialize_model_parallel
    (ref: dist_utils.py:27-62)."""
    global _MESH
    maybe_init_multihost()
    if config is not None:
        ec = config.engine_config
        dp, pp, cp, tp = ec.dp_size, ec.pp_size, ec.cp_size, ec.tp_size
    _MESH = build_mesh(dp=dp, pp=pp, cp=cp, tp=tp, devices=devices)
    return _MESH


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _MESH
    _MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _MESH


def destroy_mesh() -> None:
    """(ref: destroy_model_parallel, parallel_state.py:637-672)."""
    set_mesh(None)


def mesh_is_trivial(mesh: Optional[Mesh]) -> bool:
    return mesh is None or mesh.devices.size == 1


def model_parallel_trivial(mesh: Optional[Mesh] = None) -> bool:
    """True when the model-parallel submesh (pp, cp, tp) is all size 1 —
    dp-only request batching still counts as trivial because each dp group
    runs a full single-device model program (shard_map manual over dp).
    Pallas kernels that XLA cannot SPMD-partition (the int8 qmm) are only
    safe on a model-parallel-trivial mesh; sharded runs use XLA-native
    dots instead."""
    mesh = mesh if mesh is not None else get_mesh()
    if mesh is None:
        return True
    return all(mesh.shape[a] == 1 for a in (AXIS_PP, AXIS_CP, AXIS_TP))


def shard_map_mesh():
    """The mesh to hand a nested `jax.shard_map`: inside an already-manual
    region (the dp-manual request-batching wrapper) the context AbstractMesh
    — whose dp axis is typed Manual — must be passed, or shard_map rejects
    the mesh mismatch; at top level, the concrete global mesh."""
    am = jax.sharding.get_abstract_mesh()
    if am is not None and getattr(am, "axis_names", ()):
        return am
    return get_mesh()


def seq_shards(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else mesh.shape[AXIS_CP] * mesh.shape[AXIS_PP]


def head_shards(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return mesh.shape[AXIS_CP] * mesh.shape[AXIS_PP] * mesh.shape[AXIS_TP]


def kv_replication(hq: int, hk: int, mesh: Optional[Mesh] = None) -> int:
    """GQA kv-head replication factor for head-sharded attention: when the
    head-shard count n exceeds the kv-head count, each kv head is
    replicated n/hk times (contiguously) so Ulysses keeps scaling past hk
    ways — the reference's cp > kv_heads replication
    (ref: context_parallel.py:393-394).  Shard i then holds q heads
    [i·hq/n, (i+1)·hq/n) — a sub-block of kv group i·hk/n — and exactly
    replica i of that group's kv head."""
    mesh = mesh if mesh is not None else get_mesh()
    n = head_shards(mesh)
    if mesh_is_trivial(mesh) or n <= hk:
        return 1
    assert n % hk == 0 and hq % n == 0, (
        f"head-sharding {n} ways with GQA replication needs "
        f"n % kv_heads({hk}) == 0 and q_heads({hq}) % n == 0"
    )
    return n // hk


def constraint(x, *spec):
    """with_sharding_constraint if a non-trivial mesh is active; no-op
    otherwise (keeps the model code mesh-agnostic).  Also a no-op when every
    named axis in `spec` has size 1 (e.g. cp constraints under a dp-only
    serving mesh) — a trivial constraint is pure tracing noise and breaks
    rank-alignment under vmap (dp request batching)."""
    mesh = get_mesh()
    if mesh_is_trivial(mesh):
        return x
    names = [a for entry in spec if entry for a in ((entry,) if isinstance(entry, str) else entry)]
    if all(mesh.shape[a] == 1 for a in names):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def replicated(x):
    """Pin to fully-replicated.  Used for the small condition/caption
    tensors (t_emb, condition, y_xattn): their consumers are tp
    column-parallel matmuls and head-sharded attention, and without an
    explicit anchor XLA back-propagates those shardings into the tiny
    embedder reshapes and hits 'involuntary full rematerialization'
    (spmd_partitioner.cc:652) — a replicate-then-repartition that becomes a
    per-layer all-gather at 24B shapes."""
    mesh = get_mesh()
    if mesh_is_trivial(mesh):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def dit_param_specs(params: dict) -> dict:
    """PartitionSpec pytree for the DiT parameter tree: tp column/row
    sharding on the big matmuls, pp(=layer-FSDP) on the stacked layer dim,
    everything else replicated.  Replaces the reference's PP layer-slicing
    checkpoint re-keying (ref: checkpointing.py:116-137)."""

    def spec_for(path: str, leaf) -> P:
        nd = getattr(leaf, "ndim", 0)
        in_blocks = path.startswith("blocks/")
        lead = (AXIS_PP,) if in_blocks else ()
        mat_nd = nd - (1 if in_blocks else 0)
        # column-parallel (shard output features)
        col = ("linear_qkv/q/", "linear_qkv/qx/", "linear_qkv/k/", "linear_qkv/v/",
               "linear_kv_xattn/", "mlp/linear_fc1/")
        # row-parallel (shard input features)
        row = ("linear_proj/", "mlp/linear_fc2/")
        if mat_nd == 2 and any(c in path for c in col) and path.endswith("weight"):
            return P(*lead, None, AXIS_TP)
        if mat_nd == 2 and any(r in path for r in row) and path.endswith("weight"):
            return P(*lead, AXIS_TP, None)
        # int8/int4 quantized leaves (quantize_params_int8/int4): weight_q
        # and nibble-packed weight_q4 mirror the bf16 weight's col/row
        # sharding (the packed in/2 dim divides tp whenever in does);
        # per-out-channel scales follow the out dim (sharded for
        # col-parallel, replicated for row-parallel)
        if mat_nd == 2 and any(c in path for c in col) and (
            path.endswith("weight_q") or path.endswith("weight_q4")
        ):
            return P(*lead, None, AXIS_TP)
        if mat_nd == 2 and any(r in path for r in row) and (
            path.endswith("weight_q") or path.endswith("weight_q4")
        ):
            return P(*lead, AXIS_TP, None)
        if mat_nd == 1 and any(c in path for c in col) and path.endswith("weight_scale"):
            return P(*lead, AXIS_TP)
        return P(*lead, *([None] * mat_nd))

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        specs.append(spec_for(path_str, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_dit_params(params: dict, mesh: Optional[Mesh] = None) -> dict:
    mesh = mesh or get_mesh()
    if mesh_is_trivial(mesh):
        return params
    specs = dit_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def kv_cache_spec() -> P:
    """Cache [L, 2, hk, tok, hd] (kernel layout): kv heads over cp×pp×tp
    (matches the attention shard_map's head axes, so the read-only cache
    enters the kernel with ZERO boundary traffic).  The layer dim stays
    UNSHARDED on purpose: `lax.scan` slices it every step, and slicing a
    sharded dim makes the SPMD partitioner hoist a full-stack all-gather
    out of the loop (measured — see docs/pp_scaling.md).  Total cache
    memory per device is 1/(cp·pp·tp) either way."""
    return P(None, None, HEAD_AXES, None, None)


def pp_num_shards() -> int:
    mesh = get_mesh()
    return 1 if mesh is None else mesh.shape[AXIS_PP]


def pp_gather_layer(blocks: dict, idx) -> dict:
    """Materialize ONE layer's parameter tree from the pp-layer-sharded
    stack [L, ...] — the per-step gather of the layer-FSDP design (the
    TPU-native realization of the reference's PP layer placement,
    ref: pipeline_parallel.py:30-123 / checkpointing.py:116-137).

    Why not just `lax.scan` over the sharded stack: XLA's SPMD partitioner
    cannot partition a dynamic-slice on a sharded dim and hoists an
    all-gather of the ENTIRE stack out of the while loop, putting full
    weights on every device (measured, docs/pp_scaling.md).  Inside a
    pp-manual shard_map the slice happens on the LOCAL shard and the
    broadcast-from-owner is an explicit masked psum per step — weights
    stay 1/pp in HBM, and the caller double-buffers so the psum of layer
    i+1 overlaps layer i's compute (split-phase collectives under XLA's
    latency-hiding scheduler).

    int8 leaves ride through the psum as bf16 — integers in [-127, 127]
    are exact in bf16's 8-bit mantissa, and TPU all-reduce prefers it."""
    import jax.numpy as jnp
    from jax import lax

    mesh = get_mesh()
    pp = mesh.shape[AXIS_PP]
    leaves = jax.tree_util.tree_leaves(blocks)
    num_layers = leaves[0].shape[0]
    assert num_layers % pp == 0, f"num_layers {num_layers} must divide pp={pp}"
    l_loc = num_layers // pp

    def inner(blocks_loc, i):
        rank = lax.axis_index(AXIS_PP)
        mask = rank == i // l_loc
        li = i % l_loc

        def pick(a):
            al = lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
            is_int = jnp.issubdtype(al.dtype, jnp.integer)
            # A sub-f32 all-reduce inside the layer-scan while-loop crashes
            # the CPU backend's AllReducePromotion pass ("Invalid binary
            # instruction opcode copy"), and int dtypes shouldn't ride an
            # add-reduce at all — promote both to f32 for the psum (exact:
            # one rank contributes, the rest are zeros; int8 fits f32).
            # On TPU, bf16 weights psum natively at half the bytes.
            promote = is_int or (al.dtype.itemsize < 4 and jax.default_backend() != "tpu")
            if promote:
                out_dt = jnp.bfloat16 if is_int else al.dtype
                g = lax.psum(jnp.where(mask, al, 0).astype(jnp.float32), AXIS_PP)
                return g.astype(out_dt)
            return lax.psum(jnp.where(mask, al, jnp.zeros_like(al)), AXIS_PP)

        return jax.tree_util.tree_map(pick, blocks_loc)

    in_specs = (jax.tree_util.tree_map(lambda _: P(AXIS_PP), blocks), P())
    out_specs = jax.tree_util.tree_map(lambda _: P(), blocks)
    fn = jax.shard_map(
        inner,
        mesh=shard_map_mesh(),
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names={AXIS_PP},
        check_vma=False,
    )
    return fn(blocks, idx)


def shard_kv_cache(cache, mesh: Optional[Mesh] = None):
    mesh = mesh or get_mesh()
    if mesh_is_trivial(mesh):
        return cache
    # int8-stored caches are {'kv': [L,2,G,tok,hd], 'scale': [L,2,G,tok]} —
    # the scale leaf shards like kv minus the head_dim axis
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*tuple(kv_cache_spec())[: x.ndim]))
        ),
        cache,
    )
