"""Verify on the REAL TPU: MultiCameraTracker.track() now delegates to the
fused clip path by default and matches per_frame=True row-for-row; the
batch_detects / unroll clip variants reject misaligned frame0 loudly.

Run from /root/repo:  python scripts/verify_track_delegation_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

print("devices:", jax.devices(), flush=True)

from playground3d_tpu.data.toy_cameras import make_projector, register_toy_camera
from playground3d_tpu.geometry.homography import CameraRegistry
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker, make_mc_clip_step
from playground3d_tpu.utils.config import TrackerConfig

reg = CameraRegistry()
ranges = {"p1c1": (350, 560), "p1c2": (480, 700), "p1c3": (620, 840)}
for i, (name, rng_x) in enumerate(ranges.items()):
    register_toy_camera(reg, name, make_projector(cam_x=rng_x[0] - 30.0), rng_x, seed=7 + i)
cameras = list(ranges.keys())
centers = np.array([[(a + b) / 2.0, 60.0] for a, b in ranges.values()], np.float32)

cfg = TrackerConfig(
    max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
    f_init=1, det_step=1, skip_step=1, estimate_ts_bias=False,
)
det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")

n_frames = 6
rng = np.random.default_rng(9)
frames_all = rng.uniform(-1, 1, (n_frames, 3, 64, 96, 3)).astype(np.float32)


def sources():
    out = []
    for ci in range(3):
        def gen(ci=ci):
            for f in range(n_frames):
                yield frames_all[f, ci], 1.6e9 + f / 30.0
        out.append(gen())
    return out


def mk():
    return MultiCameraTracker(
        reg, cameras, cfg=cfg, det_params=det_params, depth=18,
        centers=centers, stem="s2d",
    )

t1 = mk()
s1 = t1.track(sources(), per_frame=True)
print("per-frame rows:", len(t1.rows), flush=True)

t2 = mk()
s2 = t2.track(sources(), clip_len=3)  # default: should take the clip path
print("delegated rows:", len(t2.rows), "timer keys:", sorted(t2.timers.totals()), flush=True)

assert len(t1.rows) == len(t2.rows), (len(t1.rows), len(t2.rows))
for r1, r2 in zip(t1.rows, t2.rows):
    assert r1[0] == r2[0]
    np.testing.assert_array_equal(r1[2], r2[2])
    np.testing.assert_allclose(r1[3], r2[3], rtol=1e-3, atol=1e-3)
print("PASS: track() delegation matches per-frame rows", flush=True)

# alignment guards
cfg2 = TrackerConfig(
    max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
    f_init=1, det_step=3, skip_step=1, estimate_ts_bias=False,
)
clip_b = make_mc_clip_step(
    det_params, 18, t1.bank, t1.centers, t1.kfp, cfg2, stem="s2d", batch_detects=True
)
import jax.numpy as jnp

state0 = t1.state
try:
    clip_b(state0, jnp.zeros((3,), jnp.float32),
           jnp.zeros((3, 3, 16, 24, 48), jnp.float32), jnp.zeros((3, 3), jnp.float32), 2)
    raise SystemExit("FAIL: misaligned frame0 accepted by batch_detects clip")
except ValueError as e:
    print("PASS: batch_detects rejects misaligned frame0:", e, flush=True)

try:
    make_mc_clip_step(det_params, 18, t1.bank, t1.centers, t1.kfp, cfg2,
                      stem="s2d", unroll=True, mesh="notnone")
    raise SystemExit("FAIL: unroll+mesh accepted")
except ValueError as e:
    print("PASS: unroll+mesh raises:", e, flush=True)

print("ALL PASS", flush=True)
