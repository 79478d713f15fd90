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
    on 8 GPUs, ref: README.md:201); pp = layer-dim weight sharding here."""
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
