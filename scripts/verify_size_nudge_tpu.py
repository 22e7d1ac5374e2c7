"""Verify the size_nudge crop-branch path + clip cadence knobs on the real TPU.

Drives the changed surface through public API:
  - TrackerConfig(size_nudge=True, skip_step=2) -> make_mc_clip_step
  - runs one 12-frame clip on tiny shapes, checks finiteness and that the
    nudge pulls live track sizes toward the voted class mean.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from playground3d_tpu.models import retinanet_init
from playground3d_tpu.pipeline.camera_bank import bank_from_registry
from playground3d_tpu.pipeline.multi_cam import make_crop_step
from playground3d_tpu.pipeline.tracker_state import init_track_state
from playground3d_tpu.track.kf import default_params
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.utils.constants import CLASS_DIMS
from playground3d_tpu.geometry.homography import CameraRegistry
from playground3d_tpu.data.toy_cameras import make_projector, register_toy_camera

t0 = time.time()
reg = CameraRegistry()
ranges = {"p1c1": (350, 560), "p1c2": (480, 700)}
for i, (name, rng_x) in enumerate(ranges.items()):
    register_toy_camera(reg, name, make_projector(cam_x=rng_x[0] - 30.0), rng_x, seed=7 + i)
kfp = default_params()
bank = bank_from_registry(reg)
centers = jnp.asarray(
    np.array([[(a + b) / 2.0, 60.0] for a, b in ranges.values()], np.float32)
)
crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")
print(f"[{time.time()-t0:6.1f}s] init done", flush=True)


def run(size_nudge):
    cfg = TrackerConfig(
        max_tracks=8, x_range=(320.0, 880.0), cd_max=4, cs=32,
        size_nudge=size_nudge, skip_step=2,
    )
    step = make_crop_step(
        crop_params, 18, bank, centers, kfp, cfg, stem="s2d", frame_stem="s2d"
    )
    state = init_track_state(cfg.max_tracks)
    x = np.zeros((8, 6), np.float32)
    x[:2, 0] = [500.0, 540.0]
    x[:2, 1] = 60.0
    x[:2, 2:5] = [40.0, 12.0, 11.0]
    mask = np.zeros(8, bool)
    mask[:2] = True
    P = np.tile(np.eye(6, dtype=np.float32)[None] * 5.0, (8, 1, 1))
    votes = np.zeros((8, CLASS_DIMS.shape[0]), np.float32)
    votes[:2, 2] = 3.0
    state = state._replace(
        kf=state.kf._replace(
            x=jnp.asarray(x), P=jnp.asarray(P), mask=jnp.asarray(mask),
            d=jnp.asarray(np.ones(8, np.float32)),
        ),
        cls_votes=jnp.asarray(votes),
        ids=jnp.asarray(np.arange(8, dtype=np.int32)),
    )
    frames = jnp.asarray(np.zeros((2, 16, 24, 48), np.float32))
    state2, _ = jax.jit(step)(
        state, frames, jnp.zeros((2,), jnp.float32), jnp.zeros((2,), jnp.float32)
    )
    return np.asarray(state2.kf.x)


x_plain = run(False)
print(f"[{time.time()-t0:6.1f}s] plain crop step done on {jax.devices()[0].platform}", flush=True)
x_nudge = run(True)
print(f"[{time.time()-t0:6.1f}s] nudged crop step done", flush=True)

target = np.asarray(CLASS_DIMS)[2]
d_plain = np.abs(x_plain[:2, 2:5] - target[None])
d_nudge = np.abs(x_nudge[:2, 2:5] - target[None])
print("plain dist to class mean:", d_plain, flush=True)
print("nudge dist to class mean:", d_nudge, flush=True)
assert np.all(np.isfinite(x_nudge)), "non-finite states"
assert np.all(d_nudge < d_plain), "nudge did not pull toward class mean"
np.testing.assert_array_equal(x_plain[2:], x_nudge[2:])
print("VERIFY OK: size_nudge pulls live tracks toward voted class mean on TPU", flush=True)
