"""Per-frame overhead floor of the fused clip scan: time 24-frame clips
that are all-passthrough / all-crop / all-detect, plus lifecycle and
snapshot standalone. Isolates the ~0.4 ms/frame that is neither the
detector nor the crop branch."""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

from playground3d_tpu.data.video import pack_s2d
from playground3d_tpu.geometry.homography import CameraRegistry
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.quant import quantize_detector
from playground3d_tpu.pipeline.camera_bank import bank_from_registry
from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
from playground3d_tpu.pipeline.tracker_state import (
    init_track_state,
    lifecycle,
    snapshot,
)
from playground3d_tpu.track.kf import default_params, kf_add
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.utils.profiling import device_ms
import dataclasses

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(7)
f, cx, cy = 2000.0, 960.0, 540.0
cam_pos = np.array([250.0, 60.0, -30.0])


def project(p3):
    d = p3 - cam_pos
    yaw, pitch = np.deg2rad(4.0), np.deg2rad(6.0)
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(pitch), -np.sin(pitch)], [0, np.sin(pitch), np.cos(pitch)]])
    cam = np.stack([d[:, 1], -d[:, 2], d[:, 0]], 1) @ Ry.T @ Rx.T
    return np.stack([f * cam[:, 0] / cam[:, 2] + cx, f * cam[:, 1] / cam[:, 2] + cy], 1)


sp = np.stack([rng.uniform(450, 680, 24), rng.uniform(0, 120, 24)], 1)
im = project(np.concatenate([sp, np.zeros((24, 1))], 1))
vp_z = project(np.array([[550.0, 60.0, -1e7]]))[0]
reg = CameraRegistry()
reg.add_camera("p1c1", im, sp, np.array([[1e6, cy], [cx, 1e6], vp_z]))
bank = bank_from_registry(reg)
centers = jnp.asarray(np.array([[565.0, 60.0]], np.float32))
kfp = default_params()

base_cfg = TrackerConfig(
    max_tracks=64, max_dets=48, pre_topk=1024, x_range=(300.0, 800.0),
    det_step=3, skip_step=1, crop_slots=32, cd_max=16, cs=112,
    estimate_ts_bias=False, approx_topk=True,
)

raw = rng.integers(0, 256, (1080, 1920, 3), dtype=np.uint8)
packed = pack_s2d(raw)
T_CLIP = 24
frames = jnp.asarray(np.broadcast_to(packed[None, None], (T_CLIP, 1) + packed.shape).copy())
times = jnp.asarray(np.arange(T_CLIP, dtype=np.float32)[:, None] / 30.0)

det = retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=50, stem="s2d")
crop = retinanet_init(
    jax.random.PRNGKey(1), num_classes=8, depth=18, stem="s2d",
    tower_depth=2, shared_tower=True,
)
detq = quantize_detector(det, packed[None], 50, stem="s2d")
cropq = quantize_detector(
    crop, rng.integers(0, 256, (4, 28, 28, 48), dtype=np.uint8), 18, stem="s2d"
)
print("quantized", flush=True)

state = init_track_state(base_cfg.max_tracks)
x0 = np.zeros((base_cfg.max_tracks, 7), np.float32)
x0[:, 0] = rng.uniform(460, 670, base_cfg.max_tracks)
x0[:, 1] = rng.uniform(5, 115, base_cfg.max_tracks)
x0[:, 2:5] = [18, 7, 6]
x0[:, 5] = 1
x0[:, 6] = 90.0
add_mask = np.zeros((base_cfg.max_tracks,), bool)
add_mask[:32] = True
kf = kf_add(
    state.kf, jnp.asarray(x0[:, [0, 1, 2, 3, 4, 6]]), jnp.asarray(x0[:, 5]),
    jnp.asarray(add_mask), kfp,
)
state = state._replace(
    kf=kf, ids=jnp.where(jnp.asarray(add_mask), jnp.arange(base_cfg.max_tracks), -1)
)
bias = jnp.zeros((1,), jnp.float32)


def t(name, fn, *args, iters=20):
    ms = device_ms(fn, *args, iters=iters)
    print(f"{name:<44s} {ms:7.3f} ms", flush=True)


def clip_for(**kw):
    cfg = dataclasses.replace(base_cfg, **kw)
    return make_mc_clip_step(
        detq, 50, bank, centers, kfp, cfg,
        crop_params=cropq, crop_depth=18, stem="s2d", crop_stem="s2d",
    )


# all-passthrough clip (neither cadence fires within the clip window)
big = 10 ** 6
clip_skip = clip_for(det_step=big, skip_step=big)
clip_crop = clip_for(det_step=big, skip_step=1)

# perturb via state (floats first): wrap so state is the first arg
t("clip 24x passthrough (floor)", lambda s, b, fr, tm: clip_skip(s, b, fr, tm, 1), state, bias, frames, times)
t("clip 24x crop", lambda s, b, fr, tm: clip_crop(s, b, fr, tm, 1), state, bias, frames, times)
t("lifecycle standalone", lambda s: lifecycle(s, jnp.asarray(0.0), kfp, base_cfg), state)
t("snapshot standalone", lambda s: snapshot(s, jnp.asarray(0.0), kfp, base_cfg), state)
print("done", flush=True)
