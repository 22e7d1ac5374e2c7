"""Host ingest microbench: per-op ms/frame + fps on ONE core.

The reference's system rate is bound by its host loader
(util_track/mp_loader.py:206-247: decode -> ts parse -> resize ->
normalize). This measures the TPU-host equivalents in native/framepipe.cc
end to end, including the 4K paths that feed a >=476 fps d=6 device.

Run on an otherwise-idle box: python scripts/bench_host.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from playground3d_tpu.data import native as N


def bench(tag, fn, n=30, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{tag:<46} {dt:7.2f} ms  {1e3 / dt:7.0f} fps")
    return dt


def main():
    rng = np.random.default_rng(0)
    assert N.native_available(), "native framepipe not built"

    # 4K interleaved RGB source (post-decode)
    rgb4k = rng.integers(0, 256, (2160, 3840, 3), dtype=np.uint8)
    rgb1080 = rng.integers(0, 256, (1080, 1920, 3), dtype=np.uint8)
    # 4K and 1080p YUV420 planes (y4m decode output)
    Y4, U4, V4 = (
        rng.integers(0, 256, (2160, 3840), dtype=np.uint8),
        rng.integers(0, 256, (1080, 1920), dtype=np.uint8),
        rng.integers(0, 256, (1080, 1920), dtype=np.uint8),
    )
    Y1, U1, V1 = (
        rng.integers(0, 256, (1080, 1920), dtype=np.uint8),
        rng.integers(0, 256, (540, 960), dtype=np.uint8),
        rng.integers(0, 256, (540, 960), dtype=np.uint8),
    )

    print(f"{'op (single core)':<46} {'ms/frame':>10} {'fps':>8}")
    bench("fp_preprocess_s2d_u8  4K RGB -> 1080p s2d", lambda: N.preprocess_s2d_u8(rgb4k))
    bench("fp_s2d_u8             1080p RGB -> s2d", lambda: N.s2d_u8(rgb1080))
    bench("fp_yuv420_to_rgb      1080p planes -> RGB", lambda: N.yuv420_to_rgb(Y1, U1, V1))
    bench("fp_yuv420_to_s2d_u8   1080p planes -> s2d", lambda: N.yuv420_to_s2d_u8(Y1, U1, V1))
    bench(
        "fp_yuv420_half_to_s2d_u8  4K planes -> 1080p s2d",
        lambda: N.yuv420_half_to_s2d_u8(Y4, U4, V4),
    )
    bench(
        "old 4K y4m chain (to_rgb@4K + preprocess)",
        lambda: N.preprocess_s2d_u8(N.yuv420_to_rgb(Y4, U4, V4)),
        n=10,
    )


if __name__ == "__main__":
    main()
