"""Native IO runtime: roundtrips through the C++ library and equivalence
with the pure-python fallbacks."""

import numpy as np
import pytest

from magi_tpu import runtime_native as rn


@pytest.fixture(scope="module")
def native_lib():
    lib = rn.get_lib()
    if lib is None:
        pytest.skip("native runtime unavailable (no toolchain)")
    return lib


def test_zstd_roundtrip(native_lib):
    import zstandard

    data = np.random.default_rng(0).integers(0, 255, 200_000, np.uint8).tobytes()
    comp = zstandard.ZstdCompressor().compress(data)
    assert rn.zstd_decompress(comp) == data


def test_read_files_mixed(native_lib, tmp_path):
    import zstandard

    raw = np.random.default_rng(1).integers(0, 255, 50_000, np.uint8).tobytes()
    p1 = tmp_path / "a.bin"
    p1.write_bytes(raw)
    p2 = tmp_path / "b.bin.zst"
    p2.write_bytes(zstandard.ZstdCompressor().compress(raw))
    out = rn.read_files([str(p1), str(p2)])
    assert out[0] == raw and out[1] == raw


def test_bf16_conversion_matches_numpy(native_lib):
    x = np.random.default_rng(2).normal(size=4096).astype(np.float32)
    # make exact bf16 values by truncation for a clean comparison
    bf_bits = (x.view(np.uint32) >> 16).astype(np.uint16)
    want = (bf_bits.astype(np.uint32) << 16).view(np.float32)
    got = rn.bf16_to_f32(bf_bits)
    np.testing.assert_array_equal(got, want)


def test_frame_pack_roundtrip_and_fallback_equivalence(native_lib, monkeypatch):
    frames = np.random.default_rng(3).integers(0, 255, (3, 6, 8, 3), np.uint8)
    f_native = rn.u8_thwc_to_f32_cthw(frames)
    back = rn.f32_cthw_to_u8_thwc(f_native)
    np.testing.assert_array_equal(back, frames)
    # fallback equivalence
    monkeypatch.setattr(rn, "_LIB", None)
    monkeypatch.setattr(rn, "_TRIED", True)
    f_py = rn.u8_thwc_to_f32_cthw(frames)
    np.testing.assert_allclose(f_native, f_py, atol=1e-6)
    back_py = rn.f32_cthw_to_u8_thwc(f_py)
    np.testing.assert_array_equal(back_py, frames)
