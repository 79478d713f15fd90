"""dp-axis request batching: a DpBatchedSampler over N requests must
reproduce N independent ArdfSampler walks — unsharded and on a dp=2 mesh
(the reference's per-rank engine replication, parallel_state.py dp groups)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.models.dit.model import init_dit_params
from magi_tpu.parallel import mesh as mesh_lib
from magi_tpu.sampling.batched import DpBatchedSampler
from magi_tpu.sampling.transport import ArdfSampler
from tests.test_transport import H, W, make_input
from tests.tiny import tiny_config


@pytest.fixture(autouse=True)
def _clean_mesh():
    yield
    mesh_lib.destroy_mesh()


def single_walks(cfg, params, inps, keys):
    out = []
    for inp, k in zip(inps, keys):
        s = ArdfSampler(cfg, params, inp, k)
        out.append({ci: lat for ci, lat in s.walk()})
    return out


def batched_walk(cfg, params, inps, keys):
    s = DpBatchedSampler(cfg, params, inps, keys)
    return {ci: lat for ci, lat in s.walk()}


def _compare(cfg, inps, keys, atol=1e-4):
    for inp in inps[1:]:  # the null slab is per-model, not per-request
        inp.null_emb = inps[0].null_emb
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    refs = single_walks(cfg, params, inps, keys)
    got = batched_walk(cfg, params, inps, keys)
    assert set(got) == set(refs[0])
    for ci, lat in got.items():
        assert lat.shape[0] == len(inps)
        for r, ref in enumerate(refs):
            np.testing.assert_allclose(lat[r], ref[ci], atol=atol, rtol=atol)


def test_batched_matches_independent_t2v():
    cfg = tiny_config()
    inps = [make_input(cfg, 3, key=0), make_input(cfg, 3, key=1)]
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]
    _compare(cfg, inps, keys)


def test_batched_mixed_text_nulltext():
    cfg = tiny_config()
    inps = [make_input(cfg, 2, key=0), make_input(cfg, 2, has_text=False, key=1)]
    keys = [jax.random.PRNGKey(3), jax.random.PRNGKey(4)]
    _compare(cfg, inps, keys)


def test_batched_prefix_video():
    cfg = tiny_config()
    cw = cfg.runtime_config.chunk_width
    inps = [make_input(cfg, 3, prefix_frames=cw, key=0), make_input(cfg, 3, prefix_frames=cw, key=1)]
    keys = [jax.random.PRNGKey(5), jax.random.PRNGKey(6)]
    _compare(cfg, inps, keys)


def test_batched_distill_cfg1():
    cfg = tiny_config(engine={"distill": True}, runtime={"cfg_number": 1, "num_steps": 4, "window_size": 2})
    inps = [make_input(cfg, 2, key=0), make_input(cfg, 2, key=1)]
    keys = [jax.random.PRNGKey(11), jax.random.PRNGKey(12)]
    _compare(cfg, inps, keys)


def test_batched_on_dp_mesh(eight_devices):
    cfg = tiny_config()
    inps = [make_input(cfg, 2, key=i) for i in range(4)]
    for inp in inps[1:]:
        inp.null_emb = inps[0].null_emb
    keys = [jax.random.PRNGKey(10 + i) for i in range(4)]
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    refs = single_walks(cfg, params, inps, keys)

    mesh_lib.initialize_mesh(dp=2, devices=eight_devices[:2])
    got = batched_walk(cfg, params, inps, keys)
    for ci, lat in got.items():
        for r, ref in enumerate(refs):
            np.testing.assert_allclose(lat[r], ref[ci], atol=2e-4, rtol=2e-4)


def test_batched_on_dp_cp_tp_mesh(eight_devices):
    """dp request batching composed with model parallelism: a dp2 x cp2 x tp2
    mesh serves 2 batched requests, each denoised by a 4-device cp x tp group
    (ref: dp groups coexisting with cp/pp, parallel_state.py:332)."""
    cfg = tiny_config(
        model={"num_attention_heads": 8, "num_query_groups": 8, "hidden_size": 128, "kv_channels": 16},
    )
    inps = [make_input(cfg, 2, key=i) for i in range(2)]
    for inp in inps[1:]:
        inp.null_emb = inps[0].null_emb
    keys = [jax.random.PRNGKey(20 + i) for i in range(2)]
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    refs = single_walks(cfg, params, inps, keys)

    mesh_lib.initialize_mesh(dp=2, cp=2, tp=2, devices=eight_devices)
    sharded = mesh_lib.shard_dit_params(params)
    got = batched_walk(cfg, sharded, inps, keys)
    for ci, lat in got.items():
        for r, ref in enumerate(refs):
            np.testing.assert_allclose(lat[r], ref[ci], atol=2e-4, rtol=2e-4)


def test_batch_shape_validation():
    cfg = tiny_config()
    inps = [make_input(cfg, 2, key=0), make_input(cfg, 3, key=1)]
    with pytest.raises(ValueError, match="differs"):
        DpBatchedSampler(
            cfg, init_dit_params(jax.random.PRNGKey(0), cfg), inps,
            [jax.random.PRNGKey(0), jax.random.PRNGKey(1)],
        )


def test_batched_sliding_kv_offload_roll():
    """Batched walk with the sliding-window kv_offload cache (the roll
    engages mid-walk) == independent walks.  Regression: the batched roll
    axis was off by one vs the stacked cache layout."""
    kw = dict(
        runtime={"noise2clean_kvrange": [2, 1], "clean_chunk_kvrange": 1},
        engine={"kv_offload": True},
    )
    cfg = tiny_config(**kw)
    inps = [make_input(cfg, 6, key=0), make_input(cfg, 6, key=1)]
    keys = [jax.random.PRNGKey(21), jax.random.PRNGKey(22)]
    # the sliding window must actually be smaller than the chunk grid
    probe = ArdfSampler(cfg, init_dit_params(jax.random.PRNGKey(0), cfg), inps[0], keys[0])
    assert probe.cache_chunks < probe.chunk_num
    del probe
    _compare(tiny_config(**kw), inps, keys)


def test_batched_attn_int8_stored_cache(monkeypatch):
    """DpBatchedSampler with the int8-STORED KV cache (MAGI_ATTN_INT8):
    the dict cache {kv int8, scale f32} gains a leading request axis and
    batched == independent walks (identical int8 math per request)."""
    monkeypatch.setenv("MAGI_ATTN_INT8", "1")
    cfg = tiny_config()
    inps = [make_input(cfg, 2, key=0), make_input(cfg, 2, key=1)]
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]
    for inp in inps[1:]:
        inp.null_emb = inps[0].null_emb
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    refs = single_walks(cfg, params, inps, keys)
    s = DpBatchedSampler(cfg, params, inps, keys)
    assert isinstance(s.cache, dict) and s.cache["kv"].dtype == jnp.int8
    assert s.cache["kv"].ndim == 6  # [R, L, 2, G, tok, hd]
    got = {ci: lat for ci, lat in s.walk()}
    for ci, lat in got.items():
        for r, ref in enumerate(refs):
            np.testing.assert_allclose(lat[r], ref[ci], atol=1e-4, rtol=1e-4)
