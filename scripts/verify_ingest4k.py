"""Drive the 4K y4m ingest path end-to-end at full scale (host product
surface): write a real 4K y4m, stream it through VideoFrameSource
(emit='s2d_u8', resize to 1080p) with timestamp parsing ON, and check the
output against the composition of the existing primitives."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from playground3d_tpu.data import native as N
from playground3d_tpu.data.timestamps import encode_timestamp
from playground3d_tpu.data.video import VideoFrameSource, _Y4MReader, write_y4m


def box2(p):
    p = p.astype(np.uint16)
    return ((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2).astype(
        np.uint8
    )


rng = np.random.default_rng(0)
path = "/tmp/v4k.y4m"
n_frames = 4
frames = []
for i in range(n_frames):
    f = rng.integers(0, 256, (2160, 3840, 3), dtype=np.uint8)
    f = encode_timestamp(f, 1.6e9 + i / 30.0)
    frames.append(f)
write_y4m(path, frames)
print("wrote", os.path.getsize(path) / 1e6, "MB", flush=True)

src = VideoFrameSource(path, resize_hw=(1080, 1920), emit="s2d_u8")
rd = _Y4MReader(path)
t0 = time.perf_counter()
count = 0
for out, ts in src:
    Y, U, V = rd.read_planes()
    ref = N.yuv420_to_s2d_u8(box2(Y), box2(U), box2(V))
    assert out.shape == (270, 480, 48) and out.dtype == np.uint8, out.shape
    np.testing.assert_array_equal(out, ref)
    # burned-in ts decodes from the full-res strip; y4m chroma subsampling
    # perturbs pixels, so allow the parse-failure fallback (prev + 1/30)
    assert ts is not None
    print(f"frame {count}: ts={ts:.3f} ok", flush=True)
    count += 1
dt = time.perf_counter() - t0
assert count == n_frames
print(f"VERIFY OK: {count} frames, {dt / count * 1e3:.1f} ms/frame incl. checks", flush=True)
