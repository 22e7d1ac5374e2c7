"""Benchmark: 1080p detect+track throughput on one TPU chip.

Runs the flagship fused pipeline — ResNet-50 directional RetinaNet detection
+ parse + association + Kalman update + lifecycle, all in one jitted device
step — over synthetic 1080p frames staged in HBM, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the driver's north star of 500 frames/sec/chip (BASELINE.json);
vs_baseline is the fraction of that target.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    # persistent compilation cache: later rounds skip the ~minutes-long
    # remote compile of the fused step
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from playground3d_tpu.geometry.homography import CameraRegistry
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.single_cam import make_clip_step, make_full_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.utils.config import TrackerConfig

    H, W = 1080, 1920
    DEPTH = 50
    STEM = "s2d"  # host-packed space-to-depth input: the [H,W,3] layout
    # pads 3->128 lanes on TPU; packing on the host makes the stem MXU-shaped
    N_WARM = 2
    N_ITERS = 15

    # synthetic camera registry (geometry constants only; costs nothing)
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

    from playground3d_tpu.pipeline.camera_bank import bank_from_registry

    cfg = TrackerConfig(max_tracks=64, max_dets=48, pre_topk=1024, x_range=(300.0, 800.0))
    kfp = default_params()
    bank = bank_from_registry(reg)
    params = retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=DEPTH, stem=STEM)
    T_CLIP = 20  # frames advanced per device call (lax.scan clip API)
    clip = make_clip_step(params, DEPTH, bank, kfp, cfg, stem=STEM)

    state = init_track_state(cfg.max_tracks)
    from playground3d_tpu.data.video import pack_s2d

    raw = rng.normal(0, 1, (H, W, 3)).astype(np.float32)
    packed = pack_s2d(raw) if STEM == "s2d" else raw
    frames = jnp.asarray(np.broadcast_to(packed[None, None], (T_CLIP, 1) + packed.shape).copy())

    def times_for(i0):
        return jnp.asarray(
            (np.arange(T_CLIP, dtype=np.float32)[:, None] + i0) / 30.0
        )

    # warm up / compile
    for i in range(N_WARM):
        state, snaps = clip(state, frames, times_for(i * T_CLIP))
    jax.block_until_ready(snaps.states7)

    start = time.time()
    for i in range(N_ITERS):
        state, snaps = clip(state, frames, times_for((N_WARM + i) * T_CLIP))
    jax.block_until_ready(snaps.states7)
    wall = time.time() - start

    fps = N_ITERS * T_CLIP / wall
    baseline = 500.0  # BASELINE.json north star, frames/sec/chip
    print(
        json.dumps(
            {
                "metric": "detect_track_fps_1080p_resnet50",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
