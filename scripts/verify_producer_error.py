"""Verify (on the real TPU) that track_clips surfaces producer-thread errors.

Drives MultiCameraTracker.track_clips through the public API twice:
1. healthy sources -> rows produced, fps printed (proof the fused clip path
   still runs end-to-end on the chip);
2. a source that raises mid-stream -> the exception must propagate out of
   track_clips (not silently truncate the output).
"""

import time

import numpy as np
import jax

print("devices:", jax.devices(), flush=True)

from playground3d_tpu.models import retinanet_init
from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.data.toy_cameras import register_bench_camera

reg, _ = register_bench_camera(image_hw=(64, 96), f=500.0, yaw_deg=0.0, pitch_deg=0.0)
cfg = TrackerConfig(
    max_tracks=16, max_dets=16, pre_topk=128, x_range=(300.0, 800.0),
    f_init=1, det_step=1, skip_step=1, estimate_ts_bias=False,
)
det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
centers = np.array([[565.0, 60.0]], np.float32)

rng = np.random.default_rng(3)
frames_all = rng.uniform(-1, 1, (6, 1, 64, 96, 3)).astype(np.float32)


def sources(poison: bool):
    def gen():
        for f in range(6):
            if poison and f == 4:
                raise RuntimeError("decoder died")
            yield frames_all[f, 0], 1.6e9 + f / 30.0
    return [gen()]


tr = MultiCameraTracker(
    reg, ["p1c1"], cfg=cfg, det_params=det_params, depth=18,
    centers=centers, stem="s2d",
)
t0 = time.time()
stats = tr.track_clips(sources(poison=False), clip_len=3)
print(f"healthy run: {stats['frames']} frames, rows={len(tr.rows)}, "
      f"{time.time()-t0:.1f}s (incl. compile)", flush=True)
assert stats["frames"] == 6 and len(tr.rows) == 6

tr2 = MultiCameraTracker(
    reg, ["p1c1"], cfg=cfg, det_params=det_params, depth=18,
    centers=centers, stem="s2d",
)
try:
    tr2.track_clips(sources(poison=True), clip_len=3)
except RuntimeError as e:
    assert "decoder died" in str(e)
    print(f"poisoned run: RuntimeError propagated OK "
          f"(rows drained before raise: {len(tr2.rows)})", flush=True)
else:
    raise SystemExit("FAIL: producer error was swallowed")

print("VERIFY OK", flush=True)
