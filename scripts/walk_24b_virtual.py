"""FULL 24B-architecture sharded walk on a virtual CPU mesh (pp2 x cp2 x tp2).

Unlike tests/test_parallel.py::test_24b_architecture_shapes_sharded_walk
(which ratio-scales the hidden size), this runs the REAL 24B geometry —
48 layers x hidden 6144 x ffn 16384 (GLU) x 48q/8kv heads, ~23B params —
with int8 weights (the bf16 tree would be 46GB) at tiny spatial dims, and
executes a complete short ARDF walk through the sharded jitted step:
pp layer-FSDP gathers, head-sharded two-source attention, col/row int8
shard_maps.

KNOWN LIMIT on a 1-core host (this round's bench box): XLA:CPU's
collective rendezvous has a HARDCODED 40s termination timeout
(rendezvous.cc; the DebugOptions knobs for it are not plumbed in this
jaxlib — jit compiler_options are accepted but ignored), and with eight
virtual devices time-sharing one core, each 24B-layer collective round
serializes ~8 device-compute slices of several seconds — the first
pp-gather psum blows the 40s budget and the process aborts.  On any
multi-core host this walk completes; on this box the same code paths are
proven by (a) the 48-layer ratio-scaled sharded-walk test and (b) the
REAL-chip single-device 24B walk (scripts/bench_24b.py).

Usage:  python scripts/walk_24b_virtual.py   (prints one JSON line)
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# 8 virtual devices time-share ONE core at 24B scale: a collective
# participant can be MINUTES late to the rendezvous, and the default 40s
# terminate timeout kills the process.  The flag isn't registered in this
# jaxlib's XLA_FLAGS parser, but jit compiler_options reach DebugOptions —
# patch jax.jit so every program in the walk carries the raised timeouts.
_orig_jit = jax.jit
_CPU_COLLECTIVE_OPTS = {
    "xla_cpu_collective_call_warn_stuck_seconds": "600",
    "xla_cpu_collective_call_terminate_timeout_seconds": "14400",
}


def _patched_jit(*a, **kw):
    opts = dict(_CPU_COLLECTIVE_OPTS)
    opts.update(kw.get("compiler_options") or {})
    kw["compiler_options"] = opts
    return _orig_jit(*a, **kw)


jax.jit = _patched_jit

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    from magi_tpu.core.config import MagiConfig
    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.parallel import mesh as mesh_lib
    from magi_tpu.sampling.transport import ArdfSampler, InferenceInput

    config = MagiConfig.from_json("example/24B/24B_base_config.json")
    mc, rc, ec = config.model_config, config.runtime_config, config.engine_config
    assert mc.num_layers == 48 and mc.hidden_size == 6144 and mc.num_attention_heads == 48

    # tiny spatial dims + short schedule; ARCHITECTURE stays full-size
    rc.video_size_h = rc.video_size_w = 96  # latent 12x12 -> 6x6 patch grid
    rc.num_steps, rc.window_size = 2, 2
    rc.noise2clean_kvrange, rc.clean_chunk_kvrange = [], -1
    mc.params_dtype = jnp.bfloat16
    mc.caption_max_length = 64
    ec.pp_size = ec.cp_size = ec.tp_size = 2
    chunk_num = 2

    t0 = time.time()
    mesh = mesh_lib.initialize_mesh(config)
    # int8 weights built directly in quantized form (46GB bf16 never exists)
    params = init_dit_params(jax.random.PRNGKey(0), config, zeros=True, quant_bits=8)
    params = mesh_lib.shard_dit_params(params, mesh)
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params["blocks"])
        if l.ndim == 3
    )
    print(f"built+sharded {n_params/1e9:.2f}B stacked block params in {time.time()-t0:.0f}s",
          file=sys.stderr)

    H = W = rc.video_size_h // 8
    L = mc.caption_max_length
    rng = np.random.default_rng(0)
    inp = InferenceInput(
        caption_embs=jnp.asarray(rng.normal(size=(chunk_num, L, mc.caption_channels)).astype(np.float32)),
        caption_lens=np.full(chunk_num, L, np.int32),
        null_emb=jnp.asarray(rng.normal(size=(L, mc.caption_channels)).astype(np.float32)),
        null_len=8,
        latent_size=(mc.in_channels // 2, chunk_num * rc.chunk_width, H, W),
        num_steps=rc.num_steps,
        chunk_num=chunk_num,
        has_text=True,
    )
    sampler = ArdfSampler(config, params, inp, jax.random.PRNGKey(7))
    t1 = time.time()
    chunks = [c for _, c in sampler.walk()]
    np.asarray(sampler.xs.ravel()[:1])
    wall = time.time() - t1
    steps = sampler.total_forward_steps()
    ok = len(chunks) == chunk_num and all(np.isfinite(np.asarray(c)).all() for c in chunks)
    print(json.dumps({
        "walk_24b_virtual": "ok" if ok else "FAILED",
        "mesh": "pp2 x cp2 x tp2 (8 virtual cpu devices)",
        "arch": f"{mc.num_layers}L x {mc.hidden_size}h x {mc.ffn_hidden_size}ffn GLU, "
                f"{mc.num_attention_heads}q/{mc.num_query_groups}kv",
        "block_params_B": round(n_params / 1e9, 2),
        "weights": "int8 (sharded col/row int8 execution + pp layer-FSDP)",
        "forward_steps": steps,
        "chunks_emitted": len(chunks),
        "walk_wall_s": round(wall, 1),
    }))
    mesh_lib.destroy_mesh()


if __name__ == "__main__":
    main()
