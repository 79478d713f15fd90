"""Multi-device correctness on the 8-device virtual CPU mesh: the sharded
denoise step must match the single-device result bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.models.dit.model import init_dit_params
from magi_tpu.parallel import mesh as mesh_lib
from magi_tpu.sampling.transport import ArdfSampler
from tests.test_transport import make_input
from tests.tiny import tiny_config


@pytest.fixture(autouse=True)
def _clean_mesh():
    yield
    mesh_lib.destroy_mesh()


def mesh_cfg():
    # heads must divide cp*tp: use 8 q-heads / 8 kv-groups
    return tiny_config(
        model={"num_attention_heads": 8, "num_query_groups": 8, "hidden_size": 128, "kv_channels": 16},
        engine={"cp_size": 4, "tp_size": 2},
    )


def run_walk(cfg, sharded: bool, eight_devices):
    inp = make_input(cfg, 2)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    if sharded:
        mesh = mesh_lib.initialize_mesh(cfg, devices=eight_devices)
        params = mesh_lib.shard_dit_params(params, mesh)
    else:
        mesh_lib.destroy_mesh()
    sampler = ArdfSampler(cfg, params, inp, jax.random.PRNGKey(7))
    if sharded:
        sampler.cache = mesh_lib.shard_kv_cache(sampler.cache)
    return [c for _, c in sampler.walk()]


def test_sharded_walk_matches_single_device(eight_devices):
    cfg = mesh_cfg()
    ref = run_walk(cfg, sharded=False, eight_devices=eight_devices)
    got = run_walk(cfg, sharded=True, eight_devices=eight_devices)
    assert len(ref) == len(got) == 2
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, atol=2e-4, rtol=2e-4)


def test_pp_sharded_walk_matches_single_device(eight_devices):
    """pp2 x cp2 x tp2 — the 24B reference layout shape (pp_size:2, cp_size:4
    on 8 GPUs, ref: README.md:201); pp = layer-FSDP weights + seq/head
    compute sharding (docs/pp_scaling.md)."""
    cfg = tiny_config(
        model={"num_attention_heads": 8, "num_query_groups": 8, "hidden_size": 128, "kv_channels": 16},
        engine={"pp_size": 2, "cp_size": 2, "tp_size": 2},
    )
    ref = run_walk(cfg, sharded=False, eight_devices=eight_devices)
    got = run_walk(cfg, sharded=True, eight_devices=eight_devices)
    assert len(ref) == len(got) == 2
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, atol=2e-4, rtol=2e-4)


def test_param_specs_cover_tree():
    cfg = mesh_cfg()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    specs = mesh_lib.dit_param_specs(params)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    assert len(flat_p) == len(flat_s)
    # tp-sharded dims must divide
    mesh = mesh_lib.build_mesh(cp=4, tp=2, devices=jax.devices()[:8])
    for p, s in zip(flat_p, flat_s):
        for dim, axis in zip(p.shape, tuple(s) + (None,) * (p.ndim - len(s))):
            if axis is not None:
                axes = axis if isinstance(axis, tuple) else (axis,)
                size = int(np.prod([mesh.shape[a] for a in axes]))
                assert dim % size == 0, (p.shape, s)


def test_pp_scan_does_not_hoist_weight_allgather(eight_devices):
    """The layer-FSDP design exists because a plain lax.scan over a
    pp-sharded weight stack makes the SPMD partitioner hoist an all-gather
    of the ENTIRE stack out of the while loop (full weights on every
    device).  Guard: the compiled pp-sharded step must contain no
    all-gather at any full-stack weight shape."""
    cfg = tiny_config(
        model={"num_attention_heads": 8, "num_query_groups": 8,
               "hidden_size": 128, "kv_channels": 16, "num_layers": 4},
        engine={"pp_size": 2, "cp_size": 2, "tp_size": 2},
    )
    inp = make_input(cfg, 2)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.initialize_mesh(cfg, devices=eight_devices)
    params = mesh_lib.shard_dit_params(params, mesh)
    sampler = ArdfSampler(cfg, params, inp, jax.random.PRNGKey(7))
    sampler.cache = mesh_lib.shard_kv_cache(sampler.cache)

    # capture the real first-step args, then lower that exact call
    orig = sampler._jit_cfg3
    captured = {}

    def capture(*args, **kw):
        # lower BEFORE running: the step donates xs/cache and lowering
        # afterwards would touch deleted buffers
        captured["txt"] = orig.lower(*args, **kw).compile().as_text()
        return orig(*args, **kw)

    sampler._jit_cfg3 = capture
    sampler.prepare()
    sampler.do_step(0)
    txt = captured["txt"]

    L = cfg.model_config.num_layers
    tp = cfg.engine_config.tp_size
    stack_shapes = set()
    for leaf in jax.tree_util.tree_leaves(params["blocks"]):
        if leaf.ndim == 3 and leaf.shape[0] == L:  # stacked weight matrices
            _, a, b = leaf.shape
            stack_shapes.add((L, a, b))
            stack_shapes.add((L, a // tp, b))  # tp-sharded variants
            stack_shapes.add((L, a, b // tp))
    import re

    for line in txt.splitlines():
        if "all-gather(" not in line and "all-gather-start(" not in line:
            continue
        m = re.search(r"(?:bf16|f32|s8)\[([\d,]+)\]", line)
        if not m:
            continue
        dims = tuple(int(d) for d in m.group(1).split(","))
        assert dims not in stack_shapes, f"hoisted full-stack all-gather: {line[:160]}"


def test_multihost_init_hook(monkeypatch):
    """maybe_init_multihost must call jax.distributed.initialize exactly
    when a coordinator is configured (the torchrun/c10d rendezvous analog,
    ref: example/24B/run.sh:27-32), and survive an already-initialized
    backend with a warning instead of crashing the engine."""
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda: calls.append(1))
    monkeypatch.delenv("MAGI_MULTIHOST", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    mesh_lib.maybe_init_multihost()
    assert calls == []

    monkeypatch.setenv("MAGI_MULTIHOST", "1")
    mesh_lib.maybe_init_multihost()
    assert calls == [1]

    # already-initialized / single-host error is swallowed, not fatal
    def boom():
        raise RuntimeError("backend already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    mesh_lib.maybe_init_multihost()  # must not raise

    # coordinator address alone also triggers
    monkeypatch.delenv("MAGI_MULTIHOST")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    calls.clear()
    monkeypatch.setattr(jax.distributed, "initialize", lambda: calls.append(2))
    mesh_lib.maybe_init_multihost()
    assert calls == [2]


def test_multihost_mesh_is_dcn_aware(monkeypatch):
    """On a multi-host slice build_mesh must lay the host (DCN) boundary
    onto dp/pp and keep cp/tp inside each host's ICI domain."""
    calls = {}

    def fake_hybrid(per_host, dcn_mesh_shape):
        calls["per_host"], calls["dcn"] = tuple(per_host), tuple(dcn_mesh_shape)
        need = int(np.prod(per_host)) * int(np.prod(dcn_mesh_shape))
        return np.asarray(jax.devices()[:need]).reshape(
            tuple(d * p for d, p in zip(dcn_mesh_shape, per_host))
        )

    from jax.experimental import mesh_utils

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", fake_hybrid)
    monkeypatch.setattr(jax, "process_count", lambda: 4)

    m = mesh_lib.build_mesh(dp=2, pp=2, cp=2, tp=2)
    assert calls["dcn"] == (2, 2, 1, 1)  # hosts on dp, then pp
    assert calls["per_host"] == (1, 1, 2, 2)  # cp/tp stay on ICI
    assert dict(m.shape) == {"dp": 2, "pp": 2, "cp": 2, "tp": 2}

    # explicit devices (tests / single host) bypass the hybrid path
    calls.clear()
    mesh_lib.build_mesh(cp=4, tp=2, devices=jax.devices()[:8])
    assert not calls

    # host count that cannot sit on dp*pp must fail loudly, not silently
    # put cp traffic on DCN... unless cp is the only place left
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    m2 = mesh_lib.build_mesh(dp=1, pp=1, cp=2, tp=2)
    assert calls["dcn"] == (1, 1, 2, 1)


def test_int8_sharded_walk_close_to_single_device(eight_devices):
    """Quantized execution composed with model parallelism: on a
    pp2 x cp2 x tp2 mesh ALL EIGHT linears run int8 activation execution
    inside manual shard_maps (col: collective-free; row: tp-pmax rowmax +
    f32-scaled partial psum — matching the reference's fp8 coverage,
    ref: dit_module.py:481-487, 535-551).  Agreement with the
    single-device int8 walk is within partial-sum rounding noise (the f32
    psum of per-shard int32 partials reorders the exact int accumulation);
    edge layers run full bf16 on both sides."""
    from magi_tpu.ops.quant import quantize_params_int8

    cfg = tiny_config(
        model={"num_attention_heads": 8, "num_query_groups": 8, "hidden_size": 128,
               "kv_channels": 16, "num_layers": 4},
        engine={"pp_size": 2, "cp_size": 2, "tp_size": 2},
    )
    inp = make_input(cfg, 2)
    params = quantize_params_int8(init_dit_params(jax.random.PRNGKey(0), cfg))

    mesh_lib.destroy_mesh()
    s = ArdfSampler(cfg, params, inp, jax.random.PRNGKey(7))
    ref = [c for _, c in s.walk()]

    mesh = mesh_lib.initialize_mesh(cfg, devices=eight_devices)
    sp = mesh_lib.shard_dit_params(params, mesh)
    s2 = ArdfSampler(cfg, sp, inp, jax.random.PRNGKey(7))
    got = [c for _, c in s2.walk()]

    assert len(ref) == len(got) == 2
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, atol=2e-2, rtol=2e-2)


def test_pp_gather_layer_unit(eight_devices):
    """pp_gather_layer materializes exactly layer i from the pp-sharded
    stack on every rank, for f32 and int8 leaves."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_lib.build_mesh(pp=2, cp=2, tp=2, devices=eight_devices)
    mesh_lib.set_mesh(mesh)
    L = 4
    blocks = {
        "w": jnp.arange(L * 8 * 8, dtype=jnp.float32).reshape(L, 8, 8),
        "q": (jnp.arange(L * 8, dtype=jnp.int32) % 127 - 63).astype(jnp.int8).reshape(L, 8),
    }
    blocks = {
        k: jax.device_put(v, NamedSharding(mesh, P("pp", *([None] * (v.ndim - 1)))))
        for k, v in blocks.items()
    }

    @jax.jit
    def gather(blocks, i):
        return mesh_lib.pp_gather_layer(blocks, i)

    for i in range(L):
        got = gather(blocks, jnp.int32(i))
        np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(blocks["w"][i]))
        # int8 leaves come back as bf16 (exact for the int8 range)
        assert got["q"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got["q"], np.float32), np.asarray(blocks["q"][i], np.float32)
        )


def test_head_sharding_past_kv_heads_16way(sixteen_devices):
    """Head sharding WIDER than the kv-head count: a 16-way head-sharded
    mesh (cp4 x tp4) over 16 q-heads / 8 kv-heads engages GQA kv-head
    replication (mesh.kv_replication — the reference's cp > kv_heads path,
    ref: context_parallel.py:393-394).  Sharded walk == single-device."""
    cfg = tiny_config(
        model={"num_attention_heads": 16, "num_query_groups": 8,
               "hidden_size": 256, "kv_channels": 16},
        engine={"cp_size": 4, "tp_size": 4},
    )
    assert mesh_lib.kv_replication(16, 8, mesh_lib.build_mesh(cp=4, tp=4, devices=sixteen_devices)) == 2
    ref = run_walk(cfg, sharded=False, eight_devices=sixteen_devices)
    got = run_walk(cfg, sharded=True, eight_devices=sixteen_devices)
    assert len(ref) == len(got) == 2
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, atol=2e-4, rtol=2e-4)


def test_24b_architecture_shapes_sharded_walk(eight_devices):
    """24B-ARCHITECTURE ratios on the 24B reference mesh layout
    (pp2 x cp2 x tp2 ~ ref pp2 x cp4, README.md:201): 48 layers scanned
    under pp layer-FSDP, GQA 48q/8kv (q_per_kv=6 folding), hidden scaled
    down.  Sharded walk == single-device walk."""
    cfg = tiny_config(
        model={"num_attention_heads": 48, "num_query_groups": 8,
               "hidden_size": 48 * 16, "ffn_hidden_size": 2 * 48 * 16,
               "kv_channels": 16, "num_layers": 48},
        engine={"pp_size": 2, "cp_size": 2, "tp_size": 2},
    )
    ref = run_walk(cfg, sharded=False, eight_devices=eight_devices)
    got = run_walk(cfg, sharded=True, eight_devices=eight_devices)
    assert len(ref) == len(got) == 2
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, atol=4e-4, rtol=4e-4)


def test_attn_int8_sharded_walk_matches_single_device(eight_devices, monkeypatch):
    """MAGI_ATTN_INT8 under a head-sharded (Ulysses) mesh: the sharded int8
    walk must equal the single-device int8 walk — both run the dequant
    reference with identical per-token kv quantization, so sharding must be
    math-preserving (scales shard on the head axis alongside kv).  Tolerance
    is looser than the bf16 walk's 2e-4: int8 rounding is discontinuous, so
    the sharded linears' different fp reduction order can flip a rounded
    level (~scale/2 jumps); a mis-sharded scale tensor would be O(1) off."""
    monkeypatch.setenv("MAGI_ATTN_INT8", "1")
    cfg = mesh_cfg()
    ref = run_walk(cfg, sharded=False, eight_devices=eight_devices)
    got = run_walk(cfg, sharded=True, eight_devices=eight_devices)
    assert len(ref) == len(got) == 2
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, atol=5e-3, rtol=5e-3)
        # and the bulk must be MUCH closer (guards against a systematic
        # wrong-scale error hiding inside a loose tolerance)
        assert np.abs(np.asarray(r) - np.asarray(g)).mean() < 2e-4


def test_smooth_int8_sharded_walk_close_to_single_device(eight_devices):
    """fp8-checkpoint smooth-quant composed with model parallelism: an
    act_smooth-carrying tree (loader._dequant_fp8 output) quantizes to the
    smooth-folded int8 form and walks identically on a pp2 x cp2 x tp2 mesh
    vs single device — the global x/s divide happens before the manual
    shard_maps, so SPMD partitions it (the smooth vector is replicated
    per-layer; ref: PerChannelQuantizedFp8Linear, dit_module.py:462-487)."""
    import jax.numpy as jnp

    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.ops.quant import quantize_params_int8

    cfg = tiny_config(
        model={"num_attention_heads": 8, "num_query_groups": 8, "hidden_size": 128,
               "kv_channels": 16, "num_layers": 4},
        engine={"pp_size": 2, "cp_size": 2, "tp_size": 2},
    )
    inp = make_input(cfg, 2)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    # attach per-layer smoothing vectors to the four PerChannel linears
    rng = np.random.default_rng(5)
    L = cfg.model_config.num_layers
    for node in (
        params["blocks"]["self_attention"]["linear_proj"],
        params["blocks"]["self_attention"]["linear_kv_xattn"],
        params["blocks"]["mlp"]["linear_fc1"],
        params["blocks"]["mlp"]["linear_fc2"],
    ):
        width = node["weight"].shape[1]  # [L, in, out] -> smooth indexes in
        sm = rng.uniform(0.5, 2.0, size=(L, width)).astype(np.float32)
        sm[0] = sm[-1] = 1.0  # edge layers never smooth
        node["act_smooth"] = jnp.asarray(sm)
    qp = quantize_params_int8(params)
    assert "act_smooth" in qp["blocks"]["mlp"]["linear_fc2"]

    mesh_lib.destroy_mesh()
    s = ArdfSampler(cfg, qp, inp, jax.random.PRNGKey(7))
    ref = [c for _, c in s.walk()]

    mesh = mesh_lib.initialize_mesh(cfg, devices=eight_devices)
    sp = mesh_lib.shard_dit_params(qp, mesh)
    s2 = ArdfSampler(cfg, sp, inp, jax.random.PRNGKey(7))
    got = [c for _, c in s2.walk()]

    assert len(ref) == len(got) == 2
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, atol=2e-2, rtol=2e-2)
