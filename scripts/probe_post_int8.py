"""Post-int8 detect/crop-step breakdown at bench shapes (1080p, 1 cam).

Times the pieces of the shipped fast path (int8 backbone+fpn+heads,
approx_topk) with utils/profiling.device_ms so we know where the
remaining per-clip milliseconds go: 24/fps s = 8 detect steps + 16 crop
steps at d=3.
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

from playground3d_tpu.data.video import pack_s2d
from playground3d_tpu.geometry.homography import CameraRegistry
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.retinanet import forward_raw, detect_multiframe, localize
from playground3d_tpu.models.quant import quantize_detector
from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d
from playground3d_tpu.pipeline.camera_bank import bank_from_registry
from playground3d_tpu.pipeline.multi_cam import make_crop_step, make_mc_detect_step
from playground3d_tpu.pipeline.tracker_state import init_track_state
from playground3d_tpu.track.kf import default_params, kf_add
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.utils.profiling import device_ms

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
cfg = TrackerConfig(
    max_tracks=64, max_dets=48, pre_topk=1024, x_range=(300.0, 800.0),
    det_step=3, skip_step=1, crop_slots=32, cd_max=16, cs=112,
    estimate_ts_bias=False, approx_topk=True,
)

raw = rng.integers(0, 256, (1080, 1920, 3), dtype=np.uint8)
frames = jnp.asarray(pack_s2d(raw))[None]  # [1,270,480,48] uint8

det = retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=50, stem="s2d")
crop = retinanet_init(
    jax.random.PRNGKey(1), num_classes=8, depth=18, stem="s2d",
    tower_depth=2, shared_tower=True,
)
detq = quantize_detector(det, frames, 50, stem="s2d")
crop_calib = rng.integers(0, 256, (4, 28, 28, 48), dtype=np.uint8)
cropq = quantize_detector(crop, crop_calib, 18, stem="s2d")
print("quantized", flush=True)

# populated tracker state (32 live tracks) for the crop step
state = init_track_state(cfg.max_tracks)
x0 = np.zeros((cfg.max_tracks, 7), np.float32)
x0[:, 0] = rng.uniform(460, 670, cfg.max_tracks)
x0[:, 1] = rng.uniform(5, 115, cfg.max_tracks)
x0[:, 2:5] = [18, 7, 6]
x0[:, 5] = 1
x0[:, 6] = 90.0
add_mask = np.zeros((cfg.max_tracks,), bool)
add_mask[:32] = True
kf = kf_add(
    state.kf,
    jnp.asarray(x0[:, [0, 1, 2, 3, 4, 6]]),  # [x,y,l,w,h,v]
    jnp.asarray(x0[:, 5]),  # direction
    jnp.asarray(add_mask),
    kfp,
)
state = state._replace(
    kf=kf, ids=jnp.where(jnp.asarray(add_mask), jnp.arange(cfg.max_tracks), -1)
)
cam_times = jnp.zeros((1,), jnp.float32)
bias = jnp.zeros((1,), jnp.float32)

boxes32 = np.zeros((32, 4), np.float32)
cxs = rng.uniform(200, 1700, 32)
cys = rng.uniform(200, 900, 32)
ss = rng.uniform(60, 260, 32)
boxes32[:, 0] = cxs - ss / 2
boxes32[:, 1] = cys - ss / 2
boxes32[:, 2] = cxs + ss / 2
boxes32[:, 3] = cys + ss / 2
boxes32 = jnp.asarray(boxes32)
cam32 = jnp.zeros((32,), jnp.int32)
crops_s2d = jnp.asarray(rng.normal(0, 1, (32, 28, 28, 48)).astype(np.float32))

def t(name, fn, *args, iters=20):
    ms = device_ms(fn, *args, iters=iters)
    print(f"{name:<42s} {ms:7.2f} ms", flush=True)

t("forward_raw bf16", lambda p, im: forward_raw(p, im, 50, stem="s2d"), det, frames)
t("forward_raw int8", lambda p, im: forward_raw(p, im, 50, stem="s2d"), detq, frames)
t("detect_multiframe int8+approx",
  lambda p, im: detect_multiframe(p, im, depth=50, pre_topk=1024, max_dets=48, stem="s2d", approx_topk=True),
  detq, frames)
t("detect_multiframe int8 exact topk",
  lambda p, im: detect_multiframe(p, im, depth=50, pre_topk=1024, max_dets=48, stem="s2d", approx_topk=False),
  detq, frames)
t("crop_and_resize_s2d 32x112 (u8+norm)",
  lambda fr, b, c: crop_and_resize_s2d(fr, b, c, out_size=112, normalize=True),
  frames, boxes32, cam32)
t("localize int8 32x112s2d",
  lambda p, c: localize(p, c, depth=18, stem="s2d"), cropq, crops_s2d)

det_step = make_mc_detect_step(detq, 50, bank, kfp, cfg, stem="s2d")
t("mc_detect_step full (int8+approx)",
  lambda s, fr, ct, b: det_step(s, fr, ct, b), state, frames, cam_times, bias)

crop_step = make_crop_step(cropq, 18, bank, centers, kfp, cfg, stem="s2d", frame_stem="s2d")
t("crop_step full (32 slots, int8)",
  lambda s, fr, ct, b: crop_step(s, fr, ct, b), state, frames, cam_times, bias)
print("done", flush=True)
