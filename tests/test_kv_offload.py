"""Host-offloaded KV cache (kv_offload + DEFAULT kv ranges): the streamed
per-layer walk must match the in-HBM walk (the reference's pinned-CPU
kv_offload property, ref: dit_module.py:800-819 — unbounded video length
with the cache in host RAM)."""

import jax
import numpy as np

from magi_tpu.models.dit.model import init_dit_params
from magi_tpu.sampling.transport import ArdfSampler
from tests.test_transport import make_input
from tests.tiny import tiny_config


def _walks(cfg_kwargs, prefix_frames=0, n_chunks=2):
    cfg_a = tiny_config(**cfg_kwargs)
    cfg_b = tiny_config(**cfg_kwargs)
    cfg_b.engine_config.kv_offload = True
    assert not cfg_a.runtime_config.noise2clean_kvrange  # default ranges
    params = init_dit_params(jax.random.PRNGKey(0), cfg_a)
    sa = ArdfSampler(cfg_a, params, make_input(cfg_a, n_chunks, prefix_frames=prefix_frames), jax.random.PRNGKey(7))
    assert not sa.host_mode
    ref = [c for _, c in sa.walk()]
    sb = ArdfSampler(cfg_b, params, make_input(cfg_b, n_chunks, prefix_frames=prefix_frames), jax.random.PRNGKey(7))
    assert sb.host_mode and sb.cache is None
    got = [c for _, c in sb.walk()]
    assert len(ref) == len(got) > 0
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), atol=1e-5, rtol=1e-5)
    # the device never held the stacked cache; host buffer did get written
    assert np.abs(sb.host_cache.buf.astype(np.float32)).max() > 0


def test_host_offload_cfg3_t2v_matches():
    _walks({})


def test_host_offload_cfg3_v2v_prefix_matches():
    _walks({}, prefix_frames=2)


def test_host_offload_cfg1_distill_matches():
    _walks({"engine": {"distill": True}, "runtime": {"cfg_number": 1, "num_steps": 4, "window_size": 2}})


def test_host_offload_long_horizon_matches():
    """8-chunk distill walk (the BASELINE config-#5 shape at tiny scale):
    the attended span and the streamed host cache grow chunk by chunk —
    every chunk position must still match the in-HBM walk."""
    _walks({"engine": {"distill": True},
            "runtime": {"cfg_number": 1, "num_steps": 4, "window_size": 2}},
           n_chunks=8)


def test_host_offload_attn_int8_matches(monkeypatch):
    """Streamed host-offloaded walk with the int8-STORED cache: host buffers
    hold {kv int8, scale f32} (half the RAM and half the streaming bytes)
    and the walk equals the in-HBM int8 walk bit-for-bit."""
    monkeypatch.setenv("MAGI_ATTN_INT8", "1")
    cfg_a = tiny_config()
    cfg_b = tiny_config()
    cfg_b.engine_config.kv_offload = True
    params = init_dit_params(jax.random.PRNGKey(0), cfg_a)
    sa = ArdfSampler(cfg_a, params, make_input(cfg_a, 2), jax.random.PRNGKey(7))
    assert isinstance(sa.cache, dict)  # in-HBM int8-stored
    ref = [c for _, c in sa.walk()]
    sb = ArdfSampler(cfg_b, params, make_input(cfg_b, 2), jax.random.PRNGKey(7))
    assert sb.host_mode and isinstance(sb.host_cache.buf, dict)
    assert sb.host_cache.buf["kv"].dtype == np.int8
    got = [c for _, c in sb.walk()]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    assert np.abs(sb.host_cache.buf["kv"]).max() > 0  # host cache written
