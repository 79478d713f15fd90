"""Sliding-window KV cache (the TPU-native kv_offload): a long walk with
the bounded cache must match the unbounded-cache walk exactly."""

import jax
import numpy as np
import pytest

from magi_tpu.models.dit.model import init_dit_params
from magi_tpu.sampling.transport import ArdfSampler
from tests.test_transport import make_input
from tests.tiny import tiny_config


def run(kv_offload: bool, chunk_num: int = 8):
    cfg = tiny_config(
        runtime={
            "noise2clean_kvrange": [2, 2, 1, 1],
            "clean_chunk_kvrange": 1,
            "num_steps": 4,
            "window_size": 2,
        },
        engine={"kv_offload": kv_offload},
    )
    inp = make_input(cfg, chunk_num)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    sampler = ArdfSampler(cfg, params, inp, jax.random.PRNGKey(7))
    chunks = [c for _, c in sampler.walk()]
    return chunks, sampler


def test_sliding_cache_matches_full_cache():
    ref_chunks, ref_s = run(kv_offload=False)
    got_chunks, got_s = run(kv_offload=True)
    assert got_s.cache_chunks < ref_s.cache_chunks  # actually bounded
    assert got_s.cache_base > 0  # the window actually slid
    assert len(ref_chunks) == len(got_chunks) == 8
    for r, g in zip(ref_chunks, got_chunks):
        np.testing.assert_allclose(r, g, atol=1e-5, rtol=1e-5)


def test_offload_without_n2c_falls_back_to_full():
    cfg = tiny_config(engine={"kv_offload": True})
    inp = make_input(cfg, 3)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    sampler = ArdfSampler(cfg, params, inp, jax.random.PRNGKey(7))
    assert sampler.cache_chunks == 3  # chunk_num (no scratch, unpacked 3-CFG)
    assert len(list(sampler.walk())) == 3
