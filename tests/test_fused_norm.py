"""gate_norm_residual Pallas kernel (interpret) == the unfused JAX chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.models.dit.model import layer_norm
from magi_tpu.ops.fused_norm import gate_norm_residual


def unfused(x, residual, gate, w, b, eps, zc, n_seg):
    S, D = x.shape
    xf = x.astype(jnp.float32).reshape(n_seg, S // n_seg, D)
    xf = (xf * gate.astype(jnp.float32)[:, None, :]).reshape(S, D)
    xf = layer_norm(xf, {"weight": w, "bias": b}, eps, zc, compute_dtype=jnp.float32)
    return (xf + residual.astype(jnp.float32)).astype(residual.dtype)


@pytest.mark.parametrize("nseg_shards", [
    (8, 4),   # whole segments per shard (n_seg % n_shards == 0)
    (2, 4),   # fraction of one segment per shard
])
def test_sharded_matches_unfused(rng, eight_devices, nseg_shards):
    """gate_norm_residual_sharded on a cp2 x pp2 virtual mesh == unfused."""
    from magi_tpu.parallel import mesh as mesh_lib
    from magi_tpu.ops.fused_norm import gate_norm_residual_sharded

    n_seg, _ = nseg_shards
    seg_len, D = 64, 256
    S = n_seg * seg_len
    mesh = mesh_lib.build_mesh(pp=2, cp=2, devices=eight_devices[:4])
    mesh_lib.set_mesh(mesh)
    try:
        x = jnp.asarray(rng.normal(size=(S, D)), jnp.bfloat16)
        res = jnp.asarray(rng.normal(size=(S, D)), jnp.bfloat16)
        gate = jnp.asarray(rng.normal(size=(n_seg, D)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
        # under jit: jax's EAGER partial-manual shard_map impl trips an
        # internal out_specs=P(all_axes) check (jax 0.9 _unmatch_spec);
        # production always runs this inside the jitted step
        fn = jax.jit(
            lambda *a: gate_norm_residual_sharded(
                *a, eps=1e-6, zero_centered=True, n_seg=n_seg, interpret=True
            )
        )
        got = fn(x, res, gate, w, b)
        assert got is not None
        want = unfused(x, res, gate, w, b, 1e-6, True, n_seg)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )
        # misaligned: 3 segments of 80 over 4 shards -> a shard straddles
        # a segment boundary -> caller must fall back to the unfused chain
        xb = jnp.zeros((240, D), jnp.bfloat16)
        bad = gate_norm_residual_sharded(
            xb, xb, jnp.zeros((3, D), jnp.float32), w, b, eps=1e-6,
            zero_centered=True, n_seg=3, interpret=True,
        )
        assert bad is None
    finally:
        mesh_lib.destroy_mesh()


@pytest.mark.parametrize("zc", [False, True])
@pytest.mark.parametrize("n_seg,seg_len,block,D", [
    (2, 128, 64, 256),
    (3, 90, 64, 256),
    # wide-D row-tile scaling: 786432//6144 = 128 < block_rows, so the
    # kernel must shrink rows to stay under the Mosaic scoped-vmem cap
    (2, 200, 256, 6144),
])
def test_matches_unfused(rng, zc, n_seg, seg_len, block, D):
    S = n_seg * seg_len
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(size=(S, D)), jnp.bfloat16)
    gate = jnp.asarray(rng.normal(size=(n_seg, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    got = gate_norm_residual(x, res, gate, w, b, eps=1e-6, zero_centered=zc,
                             n_seg=n_seg, block_rows=block, interpret=True)
    want = unfused(x, res, gate, w, b, 1e-6, zc, n_seg)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_single_segment_and_extreme_gates(rng):
    """n_seg=1 (w1 steps — most of the headline walk) and near-zero /
    large gate magnitudes: the fp32 island inside the kernel must match
    the unfused chain bit-for-bit at bf16 output precision."""
    S, D = 96, 256
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(size=(S, D)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    for gate_scale in (1e-6, 1.0, 1e3):
        gate = jnp.asarray(rng.normal(size=(1, D)) * gate_scale, jnp.float32)
        got = gate_norm_residual(x, res, gate, w, b, eps=1e-6, zero_centered=True,
                                 n_seg=1, block_rows=64, interpret=True)
        want = unfused(x, res, gate, w, b, 1e-6, True, 1)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_gate_indexing_per_segment(rng):
    """Each segment must be multiplied by ITS gate row (the range_mod
    gather semantics, ref: dit_module.py:201-289): distinct constant
    gates per segment produce outputs that differ exactly per segment."""
    n_seg, seg_len, D = 3, 64, 256
    S = n_seg * seg_len
    x = jnp.ones((S, D), jnp.bfloat16)
    res = jnp.zeros((S, D), jnp.bfloat16)
    w = jnp.ones((D,), jnp.float32) * 0.0  # zero-centered -> gamma = 1
    b = jnp.zeros((D,), jnp.float32)
    gate = jnp.asarray(np.stack([np.full(D, g, np.float32) for g in (0.0, 1.0, 2.0)]))
    got = np.asarray(
        gate_norm_residual(x, res, gate, w, b, eps=1e-6, zero_centered=True,
                           n_seg=n_seg, block_rows=64, interpret=True),
        np.float32,
    )
    # uniform x rows: LN of a constant row is 0 regardless of gate, EXCEPT
    # gate 0 which zeroes the input first (still 0 after LN) — instead use
    # the unfused chain as oracle per segment to pin row->gate mapping
    want = np.asarray(unfused(x, res, gate, w, b, 1e-6, True, n_seg), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    # and a non-uniform x to make per-segment differences visible
    x2 = jnp.asarray(np.random.default_rng(0).normal(size=(S, D)), jnp.bfloat16)
    got2 = np.asarray(
        gate_norm_residual(x2, res, gate, w, b, eps=1e-6, zero_centered=True,
                           n_seg=n_seg, block_rows=64, interpret=True),
        np.float32,
    )
    want2 = np.asarray(unfused(x2, res, gate, w, b, 1e-6, True, n_seg), np.float32)
    np.testing.assert_allclose(got2, want2, atol=2e-2, rtol=2e-2)
    # gate 0 zeroes segment 0's contribution entirely (residual is 0 here)
    assert np.abs(got2[:seg_len]).max() < 1e-3
    assert np.abs(got2[seg_len:]).max() > 0.1
