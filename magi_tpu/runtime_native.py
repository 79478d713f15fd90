"""ctypes bindings for the native IO runtime (runtime/magi_io.cpp).

Builds on first use (g++ + libzstd, both in the image); every entry point
has a pure-python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from magi_tpu.core.logger import magi_logger

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _runtime_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runtime")


def _build() -> Optional[str]:
    rd = _runtime_dir()
    so = os.path.join(rd, "libmagi_io.so")
    src = os.path.join(rd, "magi_io.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(["make", "-C", rd], check=True, capture_output=True, timeout=120)
        return so if os.path.exists(so) else None
    except Exception as e:
        magi_logger.warning(f"native runtime build failed ({e}); using python fallbacks")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MAGI_DISABLE_NATIVE") == "1":
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.magi_zstd_decompress.restype = ctypes.c_int64
        lib.magi_zstd_decompress.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        lib.magi_zstd_content_size.restype = ctypes.c_int64
        lib.magi_zstd_content_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.magi_payload_size.restype = ctypes.c_int64
        lib.magi_payload_size.argtypes = [ctypes.c_char_p]
        lib.magi_read_files.restype = ctypes.c_int32
        lib.magi_read_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        for name in ("magi_bf16_to_f32", "magi_f32_to_bf16"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        for name in ("magi_u8_thwc_to_f32_cthw", "magi_f32_cthw_to_u8_thwc"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32]
        _LIB = lib
    except Exception as e:
        magi_logger.warning(f"native runtime load failed ({e}); using python fallbacks")
        _LIB = None
    return _LIB


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# public API with fallbacks
# ---------------------------------------------------------------------------


def zstd_decompress(data: bytes) -> bytes:
    lib = get_lib()
    if lib is None:
        import zstandard

        return zstandard.ZstdDecompressor().decompress(data)
    size = lib.magi_zstd_content_size(data, len(data))
    if size < 0:
        import zstandard

        return zstandard.ZstdDecompressor().decompress(data)
    out = ctypes.create_string_buffer(size)
    r = lib.magi_zstd_decompress(data, len(data), out, size)
    assert r == size, f"zstd decompress failed ({r})"
    return out.raw


def read_files(paths: List[str], n_threads: int = 0) -> List[bytes]:
    """Parallel read (+ transparent .zst decompression) of shard files."""
    lib = get_lib()
    if lib is None:
        out = []
        for p in paths:
            with open(p, "rb") as f:
                data = f.read()
            out.append(zstd_decompress(data) if p.endswith(".zst") else data)
        return out

    sizes = [lib.magi_payload_size(p.encode()) for p in paths]
    for p, s in zip(paths, sizes):
        assert s >= 0, f"cannot stat {p}"
    bufs = [np.empty(s, np.uint8) for s in sizes]
    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    c_dsts = (ctypes.c_void_p * len(paths))(*[b.ctypes.data for b in bufs])
    c_caps = (ctypes.c_int64 * len(paths))(*sizes)
    c_out = (ctypes.c_int64 * len(paths))()
    status = lib.magi_read_files(c_paths, len(paths), c_dsts, c_caps, c_out, n_threads)
    assert status == 0, f"native shard read failed (paths={paths})"
    return [b[: c_out[i]].tobytes() for i, b in enumerate(bufs)]


def f32_to_bf16(arr: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """f32 -> bf16 (round-to-nearest-even), returned as a bfloat16-viewed
    array (ml_dtypes).  ~10x faster than ml_dtypes astype for big arrays."""
    import jax.numpy as jnp

    lib = get_lib()
    src = np.ascontiguousarray(arr, dtype=np.float32)
    if lib is None:
        return src.astype(jnp.bfloat16.dtype)
    dst = np.empty(src.shape, np.uint16)
    lib.magi_f32_to_bf16(src.ctypes.data, dst.ctypes.data, src.size, n_threads)
    return dst.view(jnp.bfloat16.dtype)


def bf16_to_f32(arr: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """uint16-viewed bf16 -> f32."""
    lib = get_lib()
    src = np.ascontiguousarray(arr.view(np.uint16))
    if lib is None:
        return (src.astype(np.uint32) << 16).view(np.float32)
    dst = np.empty(src.shape, np.float32)
    lib.magi_bf16_to_f32(src.ctypes.data, dst.ctypes.data, src.size, n_threads)
    return dst


def u8_thwc_to_f32_cthw(frames: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """uint8 [T,H,W,3] -> f32 [3,T,H,W] in [-1,1]."""
    T, H, W, C = frames.shape
    assert C == 3
    lib = get_lib()
    if lib is None:
        out = frames.astype(np.float32) / 127.5 - 1.0
        return np.ascontiguousarray(out.transpose(3, 0, 1, 2))
    src = np.ascontiguousarray(frames)
    dst = np.empty((3, T, H, W), np.float32)
    lib.magi_u8_thwc_to_f32_cthw(src.ctypes.data, dst.ctypes.data, T, H, W, n_threads)
    return dst


def f32_cthw_to_u8_thwc(video: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """f32 [3,T,H,W] in [-1,1] -> uint8 [T,H,W,3]."""
    C, T, H, W = video.shape
    assert C == 3
    lib = get_lib()
    if lib is None:
        out = np.clip(video * 127.5 + 127.5, 0, 255) + 0.5
        return out.astype(np.uint8).transpose(1, 2, 3, 0)
    src = np.ascontiguousarray(video, dtype=np.float32)
    dst = np.empty((T, H, W, 3), np.uint8)
    lib.magi_f32_cthw_to_u8_thwc(src.ctypes.data, dst.ctypes.data, T, H, W, n_threads)
    return dst
