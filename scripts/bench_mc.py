"""Multi-camera throughput bench on the real chip: the fused MC cadence
clip with C cameras at 1080p (single-chip; the camera axis shards over a
mesh on multi-chip hardware — correctness of that layout is covered by
tests/test_multicam.py::test_mc_clip_camera_sharded_matches_unsharded on the
virtual 8-device CPU mesh)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(C=4, det_step=3, max_tracks=64, crop_slots=32):
    import jax
    import jax.numpy as jnp

    from playground3d_tpu.data.video import pack_s2d
    from playground3d_tpu.geometry.homography import CameraRegistry
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.utils.config import TrackerConfig

    H, W = 1080, 1920
    T_CLIP = 12
    N_ITERS = 8

    rng = np.random.default_rng(7)
    f, cx, cy = 2000.0, 960.0, 540.0

    reg = CameraRegistry()
    centers = []
    for ci in range(C):
        shift = 200.0 * ci
        cam_pos = np.array([250.0 + shift, 60.0, -30.0])

        def project(p3, cam_pos=cam_pos):
            d = p3 - cam_pos
            yaw, pitch = np.deg2rad(4.0), np.deg2rad(6.0)
            Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]])
            Rx = np.array([[1, 0, 0], [0, np.cos(pitch), -np.sin(pitch)], [0, np.sin(pitch), np.cos(pitch)]])
            cam = np.stack([d[:, 1], -d[:, 2], d[:, 0]], 1) @ Ry.T @ Rx.T
            return np.stack([f * cam[:, 0] / cam[:, 2] + cx, f * cam[:, 1] / cam[:, 2] + cy], 1)

        sp = np.stack([rng.uniform(450 + shift, 680 + shift, 24), rng.uniform(0, 120, 24)], 1)
        im = project(np.concatenate([sp, np.zeros((24, 1))], 1))
        vp_z = project(np.array([[550.0 + shift, 60.0, -1e7]]))[0]
        reg.add_camera(f"p1c{ci+1}", im, sp, np.array([[1e6, cy], [cx, 1e6], vp_z]))
        centers.append([565.0 + shift, 60.0])

    cfg = TrackerConfig(
        max_tracks=max_tracks, max_dets=max(48, 3 * max_tracks // 4),
        pre_topk=1024, x_range=(300.0, 800.0 + 200.0 * C),
        det_step=det_step, skip_step=1, crop_slots=crop_slots, cd_max=16, cs=112,
        estimate_ts_bias=False, approx_topk=True,
    )
    kfp = default_params()
    bank = bank_from_registry(reg)
    det_params = retinanet_init(jax.random.PRNGKey(0), depth=50, stem="s2d")
    crop_params = retinanet_init(
        jax.random.PRNGKey(1), depth=18, stem="s2d", tower_depth=2, shared_tower=True
    )

    raw = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    packed = pack_s2d(raw)

    from playground3d_tpu.models.quant import quantize_detector

    det_params = quantize_detector(det_params, packed[None], 50, stem="s2d")
    crop_params = quantize_detector(
        crop_params, rng.integers(0, 256, (4, 28, 28, 48), dtype=np.uint8), 18, stem="s2d"
    )
    clip = make_mc_clip_step(
        det_params, 50, bank, jnp.asarray(np.asarray(centers, np.float32)), kfp, cfg,
        crop_params=crop_params, crop_depth=18, stem="s2d", crop_stem="s2d",
    )

    frames = jnp.asarray(np.broadcast_to(packed[None, None], (T_CLIP, C) + packed.shape).copy())
    base_times = jnp.asarray(
        np.broadcast_to(np.arange(T_CLIP, dtype=np.float32)[:, None] / 30.0, (T_CLIP, C)).copy()
    )
    state0 = init_track_state(cfg.max_tracks)
    bias0 = jnp.zeros((C,), jnp.float32)

    def make_loop(n):
        @jax.jit
        def loop(state, bias, frames, base_times):
            def body(i, carry):
                # frames ride the carry with one pixel poked per iteration;
                # loop-invariant frames would let XLA hoist the detector out
                # of the fori_loop and time nothing (see bench.py)
                st, tb, fr = carry
                fr = jax.lax.dynamic_update_slice(
                    fr,
                    (i % 251).astype(fr.dtype).reshape((1,) * fr.ndim),
                    (0,) * fr.ndim,
                )
                t = base_times + (i * T_CLIP).astype(jnp.float32) / 30.0
                st2, tb2, _ = clip(st, tb, fr, t, i * T_CLIP)
                return st2, tb2, fr

            st, tb, fr = jax.lax.fori_loop(0, n, body, (state, bias, frames))
            return jnp.sum(st.kf.x) + jnp.sum(tb) + jnp.sum(fr[0, 0, 0, 0, 0]).astype(jnp.float32)

        return loop

    loop1, loopN = make_loop(1), make_loop(N_ITERS)
    float(loop1(state0, bias0, frames, base_times))
    float(loopN(state0, bias0, frames, base_times))
    # median of k interleaved (loop1, loopN) pairs with a plausibility
    # window — same tunnel-jitter robustness as bench.py (round-4
    # postmortem: one hiccup flips a single tN-t1 difference negative)
    samples = []
    for _ in range(10):
        t0 = time.time(); float(loop1(state0, bias0, frames, base_times)); t1 = time.time() - t0
        t0 = time.time(); float(loopN(state0, bias0, frames, base_times)); tN = time.time() - t0
        per_clip = (tN - t1) / (N_ITERS - 1)
        if per_clip > 0 and 2.0 <= T_CLIP / per_clip <= 5000.0:
            samples.append(per_clip)
        if len(samples) >= 5:
            break
    if not samples:
        print(f"MC C={C} d={det_step}: no plausible timing sample")
        return
    per_clip = float(np.median(samples))
    fps = T_CLIP / per_clip
    print(
        f"MC C={C} d={det_step}: {fps:.1f} multi-cam frames/s "
        f"({fps * C:.1f} camera-frames/s, {per_clip / T_CLIP * 1000:.2f} ms/frame)"
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--cameras", type=int, default=4)
    p.add_argument("--det-step", type=int, default=3)
    p.add_argument("--max-tracks", type=int, default=64,
                   help="track pool capacity (scale with C for the "
                   "18-camera deployment shape, MC3D:1489-1509)")
    p.add_argument("--crop-slots", type=int, default=32)
    a = p.parse_args()
    main(a.cameras, a.det_step, a.max_tracks, a.crop_slots)
