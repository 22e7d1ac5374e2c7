"""ctypes bindings for the first-party libav shim (native/avdecode.cc).

Real compressed-video ingest — the route the reference takes through
``cv2.VideoCapture`` on its .mp4 recordings (util_track/mp_loader.py:90,
213) — using the system FFmpeg *libraries* directly (this image ships
libavformat/libavcodec/libswscale as shared objects with no CLI or Python
bindings). Builds ``native/libavdecode.so`` on first use when the
toolchain + libraries are present; :func:`available` is False otherwise
and callers fall back to the other decode backends.

Decoded YUV420 planes feed the same fused AVX-512 framepipe tails as the
y4m reader, so H.264/HEVC recordings take the identical zero-float host
path as uncompressed captures. The writer half produces real H.264
(libx264) / MPEG-4 files for self-contained tests and overlay export
(reference ``im_to_vid`` parity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libavdecode.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "avdecode.cc")
    stale = (
        os.path.exists(_LIB_PATH)
        and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s", "libavdecode.so"],
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
    dp = ctypes.POINTER(ctypes.c_double)
    lib.avd_open.argtypes = [ctypes.c_char_p]
    lib.avd_open.restype = ctypes.c_void_p
    lib.avd_close.argtypes = [ctypes.c_void_p]
    for f in (lib.avd_width, lib.avd_height, lib.avd_is_yuv420):
        f.argtypes = [ctypes.c_void_p]
        f.restype = ctypes.c_int
    lib.avd_fps.argtypes = [ctypes.c_void_p]
    lib.avd_fps.restype = ctypes.c_double
    lib.avd_nframes.argtypes = [ctypes.c_void_p]
    lib.avd_nframes.restype = ctypes.c_int64
    lib.avd_codec_name.argtypes = [ctypes.c_void_p]
    lib.avd_codec_name.restype = ctypes.c_char_p
    lib.avd_next_rgb.argtypes = [ctypes.c_void_p, u8p, dp]
    lib.avd_next_rgb.restype = ctypes.c_int
    lib.avd_next_yuv420.argtypes = [ctypes.c_void_p, u8p, u8p, u8p, dp]
    lib.avd_next_yuv420.restype = ctypes.c_int
    lib.avd_writer_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.avd_writer_open.restype = ctypes.c_void_p
    lib.avd_writer_add_rgb.argtypes = [ctypes.c_void_p, u8p]
    lib.avd_writer_add_rgb.restype = ctypes.c_int
    lib.avd_writer_close.argtypes = [ctypes.c_void_p]
    lib.avd_writer_close.restype = ctypes.c_int
    for f in (lib.avd_has_decoder, lib.avd_has_encoder):
        f.argtypes = [ctypes.c_char_p]
        f.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def has_decoder(name: str) -> bool:
    lib = _load()
    return bool(lib and lib.avd_has_decoder(name.encode()))


def has_encoder(name: str) -> bool:
    lib = _load()
    return bool(lib and lib.avd_has_encoder(name.encode()))


class AvReader:
    """Iterate decoded frames of any libav-supported container/codec."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("libavdecode unavailable (no toolchain or FFmpeg libs)")
        self._lib = lib
        self._h = lib.avd_open(os.fspath(path).encode())
        if not self._h:
            raise IOError(f"libav could not open {path!r}")
        self.width = lib.avd_width(self._h)
        self.height = lib.avd_height(self._h)
        self.fps = lib.avd_fps(self._h)
        self.nframes = int(lib.avd_nframes(self._h))  # container estimate, -1 unknown
        self.codec = lib.avd_codec_name(self._h).decode()
        # known at open from the container codec parameters (confirmed /
        # corrected against the first decoded frame's actual format)
        self.is_yuv420: bool = bool(lib.avd_is_yuv420(self._h))

    def read_rgb(self) -> Optional[Tuple[np.ndarray, float]]:
        """Next frame as RGB24 [H,W,3] uint8 + pts seconds, or None at EOF."""
        out = np.empty((self.height, self.width, 3), np.uint8)
        pts = ctypes.c_double(-1.0)
        ret = self._lib.avd_next_rgb(self._h, out, ctypes.byref(pts))
        if ret == 0:
            return None
        if ret < 0:
            raise IOError(f"libav decode error {ret}")
        return out, float(pts.value)

    def read_planes(self) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, float]]:
        """Next frame as YUV420 planes (Y [H,W], U/V [ceil(H/2),ceil(W/2)])
        + pts seconds; None at EOF. Raises ValueError if the stream is not
        4:2:0 planar (caller should use :meth:`read_rgb`)."""
        h, w = self.height, self.width
        ch, cw = (h + 1) // 2, (w + 1) // 2
        Y = np.empty((h, w), np.uint8)
        U = np.empty((ch, cw), np.uint8)
        V = np.empty((ch, cw), np.uint8)
        pts = ctypes.c_double(-1.0)
        ret = self._lib.avd_next_yuv420(self._h, Y, U, V, ctypes.byref(pts))
        if ret == 0:
            return None
        if ret == 2:
            self.is_yuv420 = False
            raise ValueError("stream is not YUV420P; use read_rgb()")
        if ret < 0:
            raise IOError(f"libav decode error {ret}")
        self.is_yuv420 = True
        return Y, U, V, float(pts.value)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.avd_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - gc ordering
        try:
            self.close()
        except Exception:
            pass


class AvWriter:
    """Encode RGB frames to a real compressed video (mp4/H.264 by default)."""

    def __init__(self, path: str, width: int, height: int, fps: int = 30,
                 codec: Optional[str] = None, crf: int = 18):
        lib = _load()
        if lib is None:
            raise RuntimeError("libavdecode unavailable (no toolchain or FFmpeg libs)")
        if codec is None:
            codec = "libx264" if lib.avd_has_encoder(b"libx264") else "mpeg4"
        self._lib = lib
        self.codec = codec
        self._h = lib.avd_writer_open(
            os.fspath(path).encode(), width, height, fps, codec.encode(), crf
        )
        if not self._h:
            raise IOError(f"libav could not open encoder {codec!r} for {path!r}")
        self.width, self.height = width, height

    def add(self, rgb: np.ndarray) -> None:
        rgb = np.ascontiguousarray(rgb, np.uint8)
        if rgb.shape != (self.height, self.width, 3):
            raise ValueError(f"frame shape {rgb.shape} != {(self.height, self.width, 3)}")
        ret = self._lib.avd_writer_add_rgb(self._h, rgb)
        if ret < 0:
            raise IOError(f"libav encode error {ret}")

    def close(self) -> None:
        if getattr(self, "_h", None):
            ret = self._lib.avd_writer_close(self._h)
            self._h = None
            if ret < 0:
                raise IOError(f"libav finalize error {ret}")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - gc ordering
        try:
            self.close()
        except Exception:
            pass
