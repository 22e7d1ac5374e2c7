"""Frame sources and writers: the host I/O runtime.

Replaces the reference's multiprocess loader/writer (util_track/mp_loader.py,
mp_writer.py), which spawn one OS process per camera to decode with
cv2.VideoCapture, parse the pixel timestamp, resize, normalize, and feed a
bounded queue. Here the same pipeline is a background *thread* per source
feeding a bounded queue with ``jax.device_put`` staging (threads suffice:
decode is the only CPU work and releases the GIL inside codec libraries; the
hot path is on-device anyway).

Video decode backends are probed at import: cv2, PyAV, or an ``ffmpeg``
binary via subprocess pipe; none are present in this image, so
:class:`VideoFrameSource` raises a clear error unless a backend exists,
and the test/bench path uses :class:`SyntheticVideoSource` or
:class:`ImageDirSource` (.npy/.npz/.png frames).
"""

from __future__ import annotations

import os
import queue
import struct
import threading
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np

from playground3d_tpu.data.timestamps import (
    TimestampGeometry,
    encode_timestamp,
    parse_frame_timestamp,
    precomputed_checksums,
)
from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD


def _probe_decoder():
    try:
        import cv2  # noqa: F401

        return "cv2"
    except ImportError:
        pass
    try:
        import av  # noqa: F401

        return "av"
    except ImportError:
        pass
    import shutil

    if shutil.which("ffmpeg"):
        return "ffmpeg"
    return None


DECODER = _probe_decoder()


def pack_s2d(frame: np.ndarray, block: int = 4) -> np.ndarray:
    """Host-side space-to-depth packing [H,W,3] -> [H/b,W/b,3*b*b].

    A 3-channel tensor on TPU pads its lane dim 3->128 (~42x waste on every
    op that touches it); the host packs during preprocessing so the device
    never sees the bad layout (models/resnet.py stem="s2d")."""
    h, w, c = frame.shape
    x = frame[: h // block * block, : w // block * block]
    x = x.reshape(h // block, block, w // block, block, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(x.reshape(h // block, w // block, c * block * block))


def normalize_frame(frame_u8: np.ndarray) -> np.ndarray:
    """uint8 [H,W,3] -> ImageNet-normalized float32 (mp_loader.py:237-239)."""
    f = frame_u8.astype(np.float32) / 255.0
    return (f - IMAGENET_MEAN) / IMAGENET_STD


class FrameSource:
    """Iterator protocol: yields (frame [H,W,3] float32 normalized, t_abs)."""

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, float]:
        raise NotImplementedError


class SyntheticVideoSource(FrameSource):
    """Renders a :class:`SyntheticScene` through a projection at frame rate,
    with a real burned-in pixel timestamp — the test/bench stand-in for the
    I-24 recordings."""

    def __init__(
        self,
        scene,
        P: np.ndarray,
        n_frames: int,
        fps: float = 30.0,
        t0: float = 1.6e9,
        height: int = 1080,
        width: int = 1920,
        clock_bias: float = 0.0,
        normalized: bool = True,
        burn_timestamp: bool = True,
        seed: int = 0,
    ):
        from playground3d_tpu.data.synthetic import render_frame

        self._render = render_frame
        self.scene, self.P = scene, P
        self.n_frames, self.fps, self.t0 = n_frames, fps, t0
        self.h, self.w = height, width
        self.clock_bias = clock_bias
        self.normalized = normalized
        self.burn = burn_timestamp
        self.rng = np.random.default_rng(seed)
        self._i = 0

    def __len__(self):
        return self.n_frames

    def __next__(self):
        if self._i >= self.n_frames:
            raise StopIteration
        t_rel = self._i / self.fps
        t_abs = self.t0 + t_rel + self.clock_bias
        frame, _ = self._render(
            self.scene, t_rel, self.P, height=self.h, width=self.w,
            rng=self.rng, normalized=False,
        )
        g = TimestampGeometry()
        if self.burn and self.h >= g.y0 + g.h and self.w >= g.x0 + g.n * g.w:
            frame = encode_timestamp(frame, t_abs, g)
        if self.normalized:
            frame = (frame - IMAGENET_MEAN) / IMAGENET_STD
        self._i += 1
        return frame.astype(np.float32), t_abs


class ImageDirSource(FrameSource):
    """Frames from a directory of .npy/.npz/.png files, sorted by name
    (the reference's directory-of-images mode, mp_loader.py:43-68)."""

    def __init__(self, directory: str, fps: float = 30.0, t0: float = 0.0, normalized=True):
        self.files = sorted(
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.endswith((".npy", ".npz", ".png"))
        )
        self.fps, self.t0 = fps, t0
        self.normalized = normalized
        self._i = 0

    def __len__(self):
        return len(self.files)

    def __next__(self):
        if self._i >= len(self.files):
            raise StopIteration
        path = self.files[self._i]
        if path.endswith(".npy"):
            frame = np.load(path)
        elif path.endswith(".npz"):
            frame = np.load(path)["frame"]
        else:
            frame = read_png(path)
        if frame.dtype == np.uint8:
            frame = frame.astype(np.float32) / 255.0
        if self.normalized:
            frame = (frame - IMAGENET_MEAN) / IMAGENET_STD
        t = self.t0 + self._i / self.fps
        self._i += 1
        return frame.astype(np.float32), t


class VideoFrameSource(FrameSource):
    """Real video decode: cv2 / PyAV / ffmpeg-pipe backends, with pixel
    timestamp parsing (mp_loader.py:206-247). Raises if no backend exists."""

    def __init__(
        self,
        path: str,
        resize_hw: Tuple[int, int] = (1080, 1920),
        parse_ts=True,
        ts_geometries: Optional[list] = None,
    ):
        if DECODER is None:
            raise RuntimeError(
                "no video decode backend available (cv2/PyAV/ffmpeg absent); "
                "use SyntheticVideoSource or ImageDirSource"
            )
        self.path = path
        self.resize_hw = resize_hw
        self.parse_ts = parse_ts
        # multiple candidate timestamp geometries, tried in order — the
        # reference falls back between two digit heights (datareader.py:59-66)
        self._geoms = ts_geometries or [TimestampGeometry()]
        self._checks = [precomputed_checksums(g) for g in self._geoms]
        self._last_ts: Optional[float] = None
        self._open()

    def _open(self):
        if DECODER == "cv2":
            import cv2

            self._cap = cv2.VideoCapture(self.path)
        elif DECODER == "av":
            import av

            self._container = av.open(self.path)
            self._stream = self._container.decode(video=0)
        else:  # ffmpeg subprocess pipe
            import subprocess

            h, w = self.resize_hw
            self._proc = subprocess.Popen(
                [
                    "ffmpeg", "-i", self.path, "-f", "rawvideo",
                    "-pix_fmt", "rgb24", "-s", f"{w}x{h}", "-",
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
            )

    def _read_raw(self) -> Optional[np.ndarray]:
        h, w = self.resize_hw
        if DECODER == "cv2":
            ok, frame = self._cap.read()
            if not ok:
                return None
            import cv2

            frame = cv2.resize(frame, (w, h))[:, :, ::-1]  # BGR->RGB
            return frame
        if DECODER == "av":
            try:
                frame = next(self._stream)
            except StopIteration:
                return None
            arr = frame.to_ndarray(format="rgb24")
            return arr[:h, :w]
        data = self._proc.stdout.read(h * w * 3)
        if len(data) < h * w * 3:
            return None
        return np.frombuffer(data, np.uint8).reshape(h, w, 3)

    def __next__(self):
        frame = self._read_raw()
        if frame is None:
            raise StopIteration
        t = None
        if self.parse_ts:
            for g, checks in zip(self._geoms, self._checks):
                t, _ = parse_frame_timestamp(frame, g, checks)
                if t is not None:
                    break
        if t is None:
            # fallback: previous + nominal period (MC3D:213-215)
            t = (self._last_ts + 1 / 30.0) if self._last_ts is not None else 0.0
        self._last_ts = t
        return normalize_frame(frame), t


class PrefetchingSource(FrameSource):
    """Bounded-queue background-thread wrapper (target depth 5, matching the
    reference's worker queue, mp_loader.py:218)."""

    def __init__(self, source: FrameSource, depth: int = 5):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._thread = threading.Thread(target=self._work, args=(source,), daemon=True)
        self._thread.start()

    def _work(self, source):
        try:
            for item in source:
                self.q.put(item)
        finally:
            self.q.put(self._done)

    def __next__(self):
        try:
            item = self.q.get(timeout=120)
        except queue.Empty:
            # a wedged source ends the stream instead of leaking
            # queue.Empty into the frame loop
            import sys

            print("PrefetchingSource: producer stalled >120s; ending stream", file=sys.stderr)
            raise StopIteration
        if item is self._done:
            raise StopIteration
        return item


# ---------------------------------------------------------------------------
# PNG I/O (stdlib-only; replaces the cv2.imwrite frame writer, mp_writer.py)
# ---------------------------------------------------------------------------


def write_png(path: str, frame: np.ndarray) -> None:
    """Write [H,W,3] uint8 (or float in [0,1]) as PNG using zlib only."""
    if frame.dtype != np.uint8:
        frame = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
    h, w = frame.shape[:2]
    if frame.ndim == 2:
        frame = np.repeat(frame[:, :, None], 3, axis=2)
    raw = b"".join(b"\x00" + frame[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader for files written by :func:`write_png`
    (8-bit RGB, no interlace)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    out = np.zeros((h, w, 3), np.uint8)
    prev = np.zeros(w * 3, np.uint16)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        filt, body = row[0], np.frombuffer(row[1:], np.uint8).astype(np.uint16)
        if filt == 0:
            rec = body
        elif filt == 1:  # Sub
            rec = body.copy()
            for i in range(3, len(rec)):
                rec[i] = (rec[i] + rec[i - 3]) & 0xFF
        elif filt == 2:  # Up
            rec = (body + prev) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {filt}")
        prev = rec
        out[y] = rec.astype(np.uint8).reshape(w, 3)
    return out


class AsyncFrameWriter:
    """Queue-fed background PNG writer (reference OutputWriter,
    util_track/mp_writer.py:21-49). ``close()`` flushes and joins the
    worker, guaranteeing every submitted frame is fully written."""

    _DONE = object()

    def __init__(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.q: queue.Queue = queue.Queue()
        self._n = 0
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def __call__(self, frame: np.ndarray) -> None:
        self.q.put((self._n, frame))
        self._n += 1

    def _work(self):
        while True:
            item = self.q.get()
            if item is self._DONE:
                return
            idx, frame = item
            write_png(os.path.join(self.directory, f"{idx:05d}.png"), frame)

    def close(self, timeout: float = 60.0) -> None:
        self.q.put(self._DONE)
        self._thread.join(timeout=timeout)
