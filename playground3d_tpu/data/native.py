"""ctypes bindings for the native frame-preprocessing library (framepipe).

Builds ``native/libframepipe.so`` on first use if the toolchain is present;
every entry point has a numpy fallback so the framework degrades gracefully
on machines without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from playground3d_tpu.data.timestamps import TimestampGeometry, precomputed_checksums
from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframepipe.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "framepipe.cc")
    stale = (
        os.path.exists(_LIB_PATH)
        and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.fp_resize_half.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int]
    lib.fp_normalize.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int]
    lib.fp_preprocess.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int]
    lib.fp_preprocess_s2d.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int]
    lib.fp_pack_s2d.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_s2d_u8.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_preprocess_s2d_u8.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_yuv420_to_rgb.argtypes = [u8p, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_yuv420_to_s2d_u8.argtypes = [u8p, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_yuv420_half_to_s2d_u8.argtypes = [u8p, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_plane_half.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_parse_timestamp.argtypes = [u8p] + [ctypes.c_int] * 11 + [i32p, i32p]
    lib.fp_parse_timestamp.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def resize_half(frame: np.ndarray) -> np.ndarray:
    """[h,w,3] uint8 -> [h/2,w/2,3] uint8, 2x2 box filter."""
    h, w = frame.shape[:2]
    lib = _load()
    if lib is not None:
        out = np.empty((h // 2, w // 2, 3), np.uint8)
        lib.fp_resize_half(np.ascontiguousarray(frame), out, h, w)
        return out
    f = frame[: h // 2 * 2, : w // 2 * 2].astype(np.uint16)
    out = (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2] + 2) >> 2
    return out.astype(np.uint8)


def normalize(frame_u8: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """uint8 [h,w,3] -> ImageNet-normalized float32."""
    lib = _load()
    h, w = frame_u8.shape[:2]
    if lib is not None:
        out = np.empty((h, w, 3), np.float32)
        lib.fp_normalize(
            np.ascontiguousarray(frame_u8), out, h, w,
            np.ascontiguousarray(IMAGENET_MEAN), np.ascontiguousarray(IMAGENET_STD),
            n_threads,
        )
        return out
    return (frame_u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def preprocess(frame_u8: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """Fused 2x downsample + normalize: 4K uint8 -> 1080p normalized f32
    (the reference loader's resize+normalize, mp_loader.py:236-239)."""
    lib = _load()
    h, w = frame_u8.shape[:2]
    if lib is not None:
        out = np.empty((h // 2, w // 2, 3), np.float32)
        lib.fp_preprocess(
            np.ascontiguousarray(frame_u8), out, h, w,
            np.ascontiguousarray(IMAGENET_MEAN), np.ascontiguousarray(IMAGENET_STD),
            n_threads,
        )
        return out
    return normalize(resize_half(frame_u8), n_threads)


def preprocess_s2d(frame_u8: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """Fused 2x downsample + normalize + space-to-depth(4x4) pack:
    4K uint8 -> [H/8, W/8, 48] normalized float32, the layout consumed by
    the TPU s2d stem (models/resnet.py)."""
    lib = _load()
    h, w = frame_u8.shape[:2]
    if lib is not None:
        out = np.empty((h // 8, w // 8, 48), np.float32)
        lib.fp_preprocess_s2d(
            np.ascontiguousarray(frame_u8), out, h, w,
            np.ascontiguousarray(IMAGENET_MEAN), np.ascontiguousarray(IMAGENET_STD),
            n_threads,
        )
        return out
    from playground3d_tpu.data.video import pack_s2d

    return pack_s2d(preprocess(frame_u8, n_threads))


def pack_s2d_native(frame_f32: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """[H,W,3] float32 -> [H/4,W/4,48] float32 s2d packing."""
    lib = _load()
    h, w = frame_f32.shape[:2]
    if lib is not None:
        out = np.empty((h // 4, w // 4, 48), np.float32)
        lib.fp_pack_s2d(np.ascontiguousarray(frame_f32), out, h, w, n_threads)
        return out
    from playground3d_tpu.data.video import pack_s2d

    return pack_s2d(frame_f32)


def s2d_u8(frame_u8: np.ndarray, n_threads: int = 1) -> np.ndarray:
    """[H,W,3] uint8 -> [H/4,W/4,48] uint8 s2d pack — the shipped feed-path
    layout (frames travel uint8; the device s2d stem normalizes)."""
    h, w = frame_u8.shape[:2]
    lib = _load()
    if lib is not None:
        out = np.empty((h // 4, w // 4, 48), np.uint8)
        lib.fp_s2d_u8(np.ascontiguousarray(frame_u8), out, h, w, n_threads)
        return out
    from playground3d_tpu.data.video import pack_s2d

    return pack_s2d(frame_u8)


def preprocess_s2d_u8(frame_u8: np.ndarray, n_threads: int = 1) -> np.ndarray:
    """Fused 2x box downsample + s2d pack, all uint8: 4K [H,W,3] ->
    [H/8,W/8,48]. Equals ``pack_s2d(resize_half(frame))`` exactly."""
    h, w = frame_u8.shape[:2]
    lib = _load()
    if lib is not None:
        out = np.empty((h // 8, w // 8, 48), np.uint8)
        lib.fp_preprocess_s2d_u8(np.ascontiguousarray(frame_u8), out, h, w, n_threads)
        return out
    from playground3d_tpu.data.video import pack_s2d

    return pack_s2d(resize_half(frame_u8))


def yuv420_to_rgb(Y: np.ndarray, U: np.ndarray, V: np.ndarray, n_threads: int = 1):
    """BT.601 limited-range YUV420 planes -> [H,W,3] uint8 RGB; fixed-point
    match of the y4m reader's float conversion (data/video.py:268-276)
    within +-1 LSB. Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    h, w = Y.shape
    out = np.empty((h, w, 3), np.uint8)
    lib.fp_yuv420_to_rgb(
        np.ascontiguousarray(Y), np.ascontiguousarray(U), np.ascontiguousarray(V),
        out, h, w, n_threads,
    )
    return out


def yuv420_to_s2d_u8(Y: np.ndarray, U: np.ndarray, V: np.ndarray, n_threads: int = 1):
    """Fused y4m decode tail: YUV420 planes -> s2d-packed uint8
    [H/4,W/4,48] in one pass (no RGB frame materialized). Returns None when
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    h, w = Y.shape
    out = np.empty((h // 4, w // 4, 48), np.uint8)
    lib.fp_yuv420_to_s2d_u8(
        np.ascontiguousarray(Y), np.ascontiguousarray(U), np.ascontiguousarray(V),
        out, h, w, n_threads,
    )
    return out


def yuv420_half_to_s2d_u8(Y: np.ndarray, U: np.ndarray, V: np.ndarray, n_threads: int = 1):
    """Fused 4K y4m decode tail: full-res YUV420 planes -> exact 2x2 box
    downsample in YUV space -> RGB -> s2d-packed uint8 [H/8,W/8,48] in one
    pass (the reference decodes then resizes 4K->1080p, mp_loader.py:236;
    downsampling the planes first halves the conversion arithmetic).
    Bit-exact against ``yuv420_to_s2d_u8(box2(Y), box2(U), box2(V))``.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    h, w = Y.shape
    out = np.empty((h // 8, w // 8, 48), np.uint8)
    lib.fp_yuv420_half_to_s2d_u8(
        np.ascontiguousarray(Y), np.ascontiguousarray(U), np.ascontiguousarray(V),
        out, h, w, n_threads,
    )
    return out


def box2_plane(plane: np.ndarray) -> np.ndarray:
    """Exact 2x2 box average of one uint8 plane (numpy twin of
    ``fp_plane_half``; (a+b+c+d+2)>>2 rounding)."""
    h, w = plane.shape
    p = plane[: h // 2 * 2, : w // 2 * 2].astype(np.uint16)
    return (
        (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2
    ).astype(np.uint8)


def plane_half(plane: np.ndarray, n_threads: int = 1) -> np.ndarray:
    """2x2 box downsample of one 8-bit plane [h,w] -> [h/2,w/2] (the 4K
    ``emit='yuv420'`` feed: quarter-size planes ship to the device, color
    conversion stays on-chip). Falls back to the numpy twin — never None,
    unlike the fused kernels, because callers need the planes either way."""
    lib = _load()
    if lib is None:
        return box2_plane(plane)
    h, w = plane.shape
    out = np.empty((h // 2, w // 2), np.uint8)
    lib.fp_plane_half(np.ascontiguousarray(plane), out, h, w, n_threads)
    return out


def parse_timestamp_native(
    frame_u8: np.ndarray, g: Optional[TimestampGeometry] = None
) -> Optional[float]:
    """Native burned-in timestamp decode; None on checksum mismatch or if
    the native library is unavailable (callers fall back to the numpy
    decoder in data.timestamps)."""
    lib = _load()
    if lib is None:
        return None
    g = g or TimestampGeometry()
    table = precomputed_checksums(g)
    checks = np.stack([table[str(d)].reshape(-1) for d in range(10)]).astype(np.int32)
    out = np.zeros(g.n, np.int32)
    h, w = frame_u8.shape[:2]
    rc = lib.fp_parse_timestamp(
        np.ascontiguousarray(frame_u8), h, w, g.x0, g.y0, g.w, g.h, g.n,
        g.decimal_index, g.h13, g.h23, g.w12,
        np.ascontiguousarray(checks), out,
    )
    if rc != 0:
        return None
    digits = "".join("." if d < 0 else str(d) for d in out)
    return float(digits)
