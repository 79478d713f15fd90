"""Golden tests for ARDF scheduling math against the reference's documented
worked examples (ref: video_generate.py:139-161) and hand-computed values."""

import numpy as np

from magi_tpu.sampling.kv_ranges import (
    default_kvrange,
    noise2clean_kvrange,
    prefix_kvrange,
    self_only_kvrange,
)
from magi_tpu.sampling.schedule import (
    denoise_step_of_each_chunk,
    generate_sequences,
    get_timestep,
    init_interval,
    init_t,
    timestep_indices,
)
from tests.tiny import tiny_config


def test_sequences_example1():
    cs, ce, ts, te = generate_sequences(8, 8, 0)
    assert cs == [0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7]
    assert ce == [1, 2, 3, 4, 5, 6, 7, 8, 8, 8, 8, 8, 8, 8, 8]
    assert ts == [0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7]
    assert te == [1, 2, 3, 4, 5, 6, 7, 8, 8, 8, 8, 8, 8, 8, 8]


def test_sequences_example2():
    cs, ce, ts, te = generate_sequences(8, 4, 0)
    assert cs == [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7]
    assert ce == [1, 2, 3, 4, 5, 6, 7, 8, 8, 8, 8]
    assert ts == [0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3]
    assert te == [1, 2, 3, 4, 4, 4, 4, 4, 4, 4, 4]


def test_sequences_example3_offset():
    cs, ce, ts, te = generate_sequences(8, 4, 2)
    assert cs == [2, 2, 2, 2, 3, 4, 5, 6, 7]
    assert ce == [3, 4, 5, 6, 7, 8, 8, 8, 8]
    assert ts == [0, 0, 0, 0, 0, 0, 1, 2, 3]
    assert te == [1, 2, 3, 4, 4, 4, 4, 4, 4]


def test_sequences_example4_window1():
    cs, ce, ts, te = generate_sequences(8, 1, 0)
    assert cs == list(range(8))
    assert ce == list(range(1, 9))
    assert ts == [0] * 8
    assert te == [1] * 8


def test_init_t_sd3_golden():
    # hand-computed: t=linspace(0,1,5); t^2; x/(3-2x)
    t = init_t(4)
    np.testing.assert_allclose(t, [0.0, 0.0625 / 2.875, 0.1, 0.3, 1.0], atol=1e-6)


def test_init_t_monotone_and_endpoints():
    for steps in (8, 12, 16, 32, 64):
        t = init_t(steps)
        assert t.shape == (steps + 1,)
        assert t[0] == 0.0 and abs(t[-1] - 1.0) < 1e-6
        assert (np.diff(t) > 0).all()


def test_init_t_shortcut_12():
    # base grid: cat([0], [.125, .1875]) + accu, then sd3(x^2)
    t = init_t(12, shortcut_mode="8,16,16")
    raw = np.array([0, 0.125, 0.1875, 0.25, 0.375, 0.4375, 0.5, 0.625, 0.6875, 0.75, 0.875, 0.9375, 1.0])
    expect = (raw**2) / (3 - 2 * raw**2)
    np.testing.assert_allclose(t, expect, atol=1e-6)
    t2 = init_t(12, shortcut_mode="16,16,8")
    raw2 = np.array([0, 0.0625, 0.125, 0.25, 0.3125, 0.375, 0.5, 0.5625, 0.625, 0.75, 0.8125, 0.875, 1.0])
    np.testing.assert_allclose(t2, (raw2**2) / (3 - 2 * raw2**2), atol=1e-6)


def test_init_interval():
    np.testing.assert_array_equal(init_interval(8), np.ones(8))
    np.testing.assert_array_equal(init_interval(12, "16,16,8"), [1, 1, 2] * 4)
    np.testing.assert_array_equal(init_interval(12, "8,16,16"), [2, 1, 1] * 4)


def test_timestep_ordering():
    # most-denoised chunk first (reversed), clean_t prepended
    assert timestep_indices(8, 0, 4, 3) == [27, 19, 11, 3]
    t_total = np.linspace(0, 1, 33, dtype=np.float32)
    ts = get_timestep(t_total, 8, 0, 4, 3, clean_t=0.9999)
    np.testing.assert_allclose(ts, [0.9999, 27 / 32, 19 / 32, 11 / 32, 3 / 32], atol=1e-6)
    assert denoise_step_of_each_chunk(8, 0, 4, 3, num_steps=32) == [32, 27, 19, 11, 3]


def test_default_kvrange():
    s, e = default_kvrange(slice_point=2, n_denoise=3, ctn=10)
    np.testing.assert_array_equal(s, [0, 0, 0])
    np.testing.assert_array_equal(e, [30, 40, 50])


def test_noise2clean_kvrange():
    # num_steps=8, n2c=[5,4,3,2] -> dpss=2; chunk steps [8(clean), 5, 1]
    s, e = noise2clean_kvrange(
        slice_point=1, n_denoise=3, noise2clean=[5, 4, 3, 2],
        clean_chunk_kvrange=1, steps_of_chunks=[8, 5, 1], num_steps=8, ctn=10,
    )
    # clean chunk: span 1 -> [1,2); step5 -> stage 2 span 3 -> [0,3); step1 -> stage 0 span 5 -> [0,4)
    np.testing.assert_array_equal(s, [10, 0, 0])
    np.testing.assert_array_equal(e, [20, 30, 40])


def test_prefix_kvrange():
    cfg = tiny_config(runtime={"clean_chunk_kvrange": 1})
    s, e = prefix_kvrange(cfg.runtime_config, 4, 10)
    np.testing.assert_array_equal(s, [0, 10, 20, 30])
    np.testing.assert_array_equal(e, [10, 20, 30, 40])
    cfg2 = tiny_config(runtime={"clean_chunk_kvrange": -1, "noise2clean_kvrange": [5, 4, 3, 2]})
    s2, e2 = prefix_kvrange(cfg2.runtime_config, 4, 10)
    np.testing.assert_array_equal(s2, [0, 0, 10, 20])


def test_self_only_kvrange():
    s, e = self_only_kvrange(3, 7)
    np.testing.assert_array_equal(s, [0, 7, 14])
    np.testing.assert_array_equal(e, [7, 14, 21])
