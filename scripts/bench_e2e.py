"""End-to-end SYSTEM throughput: video decode -> native fused s2d-u8 ingest
-> double-buffered clip tracking on the TPU -> CSV. Wall-clock, host incl.

This is the number the reference's own loop reports (its FrameLoader worker
feeds the GPU from cv2 decode, util_track/mp_loader.py:206-247): unlike
bench.py (device-only throughput with frames pre-staged in HBM), this rate
pays for decode, color conversion, s2d packing, host->device transfer, and
the result drain — overlapped with device compute by the producer thread.

``--container mp4`` exercises the REAL deployment ingest: H.264 (libx264)
recordings decoded by the first-party libav shim (native/avdecode.cc), the
same format as the reference's record_{cam}_%05d.mp4 sessions;
``--cameras C`` runs C decode threads feeding the fused C-camera clip
program (reference runs one FrameLoader process per camera).

Writes the synthetic recording(s) to /tmp on first use and caches them.

  python scripts/bench_e2e.py [--frames 240] [--emit s2d_u8|f32]
      [--container y4m|mp4] [--cameras C]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--emit", default="s2d_u8", choices=["s2d_u8", "f32", "yuv420"])
    ap.add_argument("--clip-len", type=int, default=120, help="frames per device call; larger amortizes per-call dispatch overhead (seconds each on the tunneled dev box, ~100us on a local TPU host)")
    ap.add_argument("--det-step", type=int, default=int(os.environ.get("BENCH_DET_STEP", "3")))
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--container", default="y4m", choices=["y4m", "mp4"],
                    help="mp4 = H.264 via the first-party libav shim "
                    "(native/avdecode.cc), the reference session format")
    ap.add_argument("--cameras", type=int, default=1,
                    help="decode threads / camera views feeding the fused "
                    "C-camera clip program")
    ap.add_argument("--render-only", action="store_true",
                    help="render/encode the cached recordings and exit "
                    "(host-only; lets assets build while the TPU is busy)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from playground3d_tpu.data.synthetic import SyntheticScene
    from playground3d_tpu.data.video import (
        PrefetchingSource,
        SyntheticVideoSource,
        VideoFrameSource,
        write_y4m,
    )
    from playground3d_tpu.data.toy_cameras import register_bench_camera
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.quant import quantize_detector
    from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.utils.config import TrackerConfig
    from playground3d_tpu.data.video import pack_s2d

    H, W = args.height, args.width
    C = args.cameras

    # ---- camera geometry -----------------------------------------------------
    if C == 1:
        reg, _project = register_bench_camera(image_hw=(H, W))
        cam_names = ["p1c1"]
        centers = np.array([[565.0, 60.0]], np.float32)
        x_lo, x_hi = 400.0, 720.0
    else:
        from playground3d_tpu.data.toy_cameras import toy_camera_chain

        reg, ranges, centers, _projs = toy_camera_chain(C)
        cam_names = list(ranges.keys())
        x_lo = min(a for a, _ in ranges.values())
        x_hi = max(b for _, b in ranges.values())

    # ---- synthetic recordings (cached); one file per camera ------------------
    scene = SyntheticScene(
        n_objects=max(12, 4 * C), seed=11,
        x_spawn=(x_lo + 20, x_hi - 20), x_visible=(x_lo, x_hi),
    )
    paths = []
    for ci, cam in enumerate(cam_names):
        path = f"/tmp/pg3d_e2e_{H}x{W}_{args.frames}_c{C}{ci}.{args.container}"
        paths.append(path)
        if os.path.exists(path):
            continue
        print(f"rendering {args.frames} synthetic {H}p frames -> {path}", flush=True)
        src = SyntheticVideoSource(
            scene, reg.P[ci, 0], n_frames=args.frames, height=H, width=W,
            normalized=False,
        )

        def u8_frames(src=src):
            for frame, _t in src:
                yield (np.clip(frame, 0, 1) * 255).astype(np.uint8)

        if args.container == "y4m":
            write_y4m(path, u8_frames())
        else:
            from playground3d_tpu.data.avdecode import AvWriter

            with AvWriter(path, width=W, height=H, fps=30) as wr:
                for fr in u8_frames():
                    wr.add(fr)
        print("rendered.", flush=True)

    if args.render_only:
        print("assets ready:", *paths, sep="\n  ", flush=True)
        return

    # ---- decode-only rate ---------------------------------------------------
    def decode_fps(emit):
        vs = VideoFrameSource(paths[0], resize_hw=(H, W), parse_ts=False, emit=emit)
        n, t0 = 0, time.perf_counter()
        for _ in vs:
            n += 1
        return n / (time.perf_counter() - t0)

    host_fps = decode_fps(args.emit)
    print(
        f"decode+ingest only ({args.container}/{args.emit}): {host_fps:.1f} "
        "fps per camera", flush=True,
    )

    # ---- tracker (shipped config, random-init nets, int8) ------------------
    cfg = TrackerConfig(
        max_tracks=64, max_dets=48, pre_topk=512,
        x_range=(x_lo - 100.0, x_hi + 80.0),
        det_step=args.det_step, skip_step=1, crop_slots=32, cd_max=8, cs=112,
        estimate_ts_bias=False, approx_topk=True,
    )
    det_params = retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=50, stem="s2d")
    crop_params = retinanet_init(
        jax.random.PRNGKey(1), num_classes=8, depth=18, stem="s2d",
        tower_depth=2, shared_tower=True,
    )
    rng = np.random.default_rng(7)
    calib = pack_s2d(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    det_params = quantize_detector(det_params, calib[None], 50, stem="s2d")
    crop_calib = rng.integers(0, 256, (4, 28, 28, 48), dtype=np.uint8)
    crop_params = quantize_detector(crop_params, crop_calib, 18, stem="s2d")

    tracker = MultiCameraTracker(
        reg, cam_names, cfg=cfg, kf_params=default_params(),
        det_params=det_params, crop_params=crop_params,
        depth=50, crop_depth=18, centers=centers, stem="s2d", crop_stem="s2d",
    )

    def sources():
        return [
            PrefetchingSource(
                VideoFrameSource(p, resize_hw=(H, W), parse_ts=False, emit=args.emit)
            )
            for p in paths
        ]

    from playground3d_tpu.pipeline.tracker_state import init_track_state

    # host->device link probe: one staged clip's worth of INCOMPRESSIBLE
    # bytes, forced to land with a device reduction (the tunnel defers +
    # compresses plain device_put: zeros report ~1 GB/s while random data
    # moves at ~30 MB/s). On a directly-attached TPU this is PCIe/DMA
    # (negligible); through the axon network tunnel it bounds the chained
    # rate, so report it so the e2e number is attributable.
    bpf = {"s2d_u8": 3.0, "f32": 12.0, "yuv420": 1.5}[args.emit] * H * W / 1e6 * C
    clip_np = np.random.default_rng(0).integers(
        0, 256, (24, C, H // 4, W // 4, 48), dtype=np.uint8
    )
    jax.device_put(clip_np[:1]).block_until_ready()  # warm the path
    t0 = time.perf_counter()
    x = jax.device_put(clip_np)
    # f32 accumulate: an int32 sum of ~150M bytes (~1.9e10) would wrap
    float(jnp.sum(jnp.asarray(x, jnp.float32)))  # force the bytes to land
    dt = time.perf_counter() - t0
    link_mbps = clip_np.nbytes / dt / 1e6
    print(
        f"host->device link (incompressible, forced): {clip_np.nbytes / 1e6:.0f} MB "
        f"in {dt:.2f}s = {link_mbps:.0f} MB/s; emit={args.emit} is {bpf:.1f} MB/frame "
        f"-> link-bound ceiling {link_mbps / bpf:.1f} fps on this box",
        flush=True,
    )

    yuv_hw = (H, W) if args.emit == "yuv420" else None
    print("warm-up pass (compiles)...", flush=True)
    tracker.track_clips(sources(), clip_len=args.clip_len, yuv_hw=yuv_hw)
    # timed pass with warm caches: reset tracker state, keep jitted clip
    tracker.state = init_track_state(cfg.max_tracks)
    tracker.ts_bias = jnp.zeros((1,), jnp.float32)
    tracker.epoch = None
    tracker.rows = []
    tracker.ts_bias_log = []
    tracker.timers.reset()
    stats = tracker.track_clips(sources(), clip_len=args.clip_len, yuv_hw=yuv_hw)
    out_csv = "/tmp/pg3d_e2e_out.csv"
    tracker.write_results_csv(out_csv)
    print(
        f"END-TO-END ({args.container}, C={C}): {stats['frames']} sync steps "
        f"at {stats['fps']:.1f} steps/s = {stats['fps'] * C:.1f} camera-frames/s "
        f"(decode {host_fps:.1f}/cam | device-only headline: see bench.py) "
        f"-> {out_csv}",
        flush=True,
    )
    print({k: round(v, 3) for k, v in stats.items() if k != "frames"}, flush=True)


if __name__ == "__main__":
    main()
