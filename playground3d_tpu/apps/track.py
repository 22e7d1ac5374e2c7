"""Tracking CLI: single-camera (reference minimal_3D_track.py __main__) and
multi-camera crop tracking (MC3D_crop_tracker.py __main__) over synthetic or
real frame sources, with CSV output and optional MOT evaluation.

Usage:
    python -m playground3d_tpu.apps.track --mode single --frames 100 \
        --out out.csv [--gt gt.csv] [--checkpoint det.npz]
    python -m playground3d_tpu.apps.track --mode multi --cameras 3 ...
"""

from __future__ import annotations

import argparse

import numpy as np


def _synthetic_registry(n_cameras: int):
    """Build a synthetic multi-camera registry + scene + per-camera sources."""
    from playground3d_tpu.data.toy_cameras import toy_camera_chain

    reg, ranges, centers, _ = toy_camera_chain(n_cameras)
    return reg, ranges, centers


def track_session(args):
    """Track real recordings from an ingest session directory: camera +
    segment discovery (data/session), video decode with burned-in timestamp
    parsing (data/video), per-camera ignore regions (data/regions), and the
    fused clip tracker — the production flow the reference runs as
    MC3D_crop_tracker.py __main__:1469-1651."""
    import itertools

    import jax

    from playground3d_tpu.data.regions import load_ignore_regions
    from playground3d_tpu.data.session import find_files, get_recording_params
    from playground3d_tpu.data.video import VideoFrameSource
    from playground3d_tpu.geometry.homography import CameraRegistry
    from playground3d_tpu.models import load_params, retinanet_init
    from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker
    from playground3d_tpu.utils.config import TrackerConfig, tracking_x_range

    # camera geometry: npz registry or a reference homography pickle
    if args.registry.endswith((".cpkl", ".pkl")):
        from playground3d_tpu.tools.ref_interop import registry_from_reference_pickle

        reg = registry_from_reference_pickle(args.registry)
    else:
        reg = CameraRegistry.load(args.registry)

    rec_dirs, fmts, cam_names = get_recording_params(args.session_dir)
    cameras = [c for c in cam_names if c in reg.names]
    files = find_files(rec_dirs, fmts, cam_names, drop_last_file=False)
    by_cam = {c: [f for f in files if f[3] == c] for c in cameras}
    assert any(by_cam.values()), "no recordings found for registry cameras"

    ignore = load_ignore_regions(args.ignore_dir, cameras) if args.ignore_dir else None
    try:
        x_range = tracking_x_range(cameras)
    except KeyError:
        x_range = (0.0, 2000.0)
    cfg = TrackerConfig(
        max_tracks=64, max_dets=64, x_range=x_range, f_init=2,
        det_step=args.det_step, crop_slots=32,
    )

    params = retinanet_init(jax.random.PRNGKey(0), depth=args.depth, stem="s2d")
    if args.checkpoint:
        params = load_params(args.checkpoint, params)
    crop_params = None
    if args.crop_checkpoint:
        crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")
        crop_params = load_params(args.crop_checkpoint, crop_params)

    tracker = MultiCameraTracker(
        reg, cameras, cfg=cfg, det_params=params, crop_params=crop_params,
        depth=args.depth, crop_depth=18, stem="s2d", crop_stem="s2d",
        ignore_polygons=ignore, image_hw=(args.height, args.width),
    )

    import os

    def cam_source(cam):
        # emit uint8 s2d frames straight from the native fused decode tail
        # (fp_yuv420_to_s2d_u8): no host float math, 4x less host->device
        # transfer, normalization on device
        segs = (
            VideoFrameSource(
                os.path.join(d, fn), resize_hw=(args.height, args.width),
                emit=args.emit,
            )
            for d, fn, _, _ in by_cam[cam]
        )
        return itertools.chain.from_iterable(segs)

    stats = tracker.track_clips(
        [cam_source(c) for c in cameras], clip_len=args.clip_len, cutoff=args.frames,
        # flat planar YUV buffers need the frame geometry for the on-device
        # yuv420_flat_to_s2d conversion
        yuv_hw=(args.height, args.width) if args.emit == "yuv420" else None,
    )
    tracker.write_results_csv(args.out)
    print(
        f"session: tracked {stats['frames']} frames at {stats['fps']:.1f} fps -> {args.out}"
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="single", choices=["single", "multi", "session"])
    ap.add_argument("--session-dir", default=None, help="ingest session directory (mode=session)")
    ap.add_argument("--registry", default=None, help="camera registry .npz or reference .cpkl")
    ap.add_argument("--ignore-dir", default=None, help="ignored_regions/ directory")
    ap.add_argument("--clip-len", type=int, default=24)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--cameras", type=int, default=3)
    ap.add_argument("--out", default="track_outputs.csv")
    ap.add_argument("--gt-out", default=None, help="also write GT CSV here")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--crop-checkpoint", default=None)
    ap.add_argument("--det-step", type=int, default=1)
    ap.add_argument(
        "--emit", default="s2d_u8", choices=["s2d_u8", "f32", "yuv420"],
        help="session-mode frame layout: uint8 s2d fast path or reference f32",
    )
    ap.add_argument("--oracle", action="store_true", help="use oracle detections (no network)")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args(argv)

    if args.mode == "session":
        assert args.session_dir and args.registry, "--session-dir and --registry required"
        track_session(args)
        return

    import jax

    from playground3d_tpu.data.synthetic import SyntheticScene, oracle_detections
    from playground3d_tpu.utils.config import TrackerConfig

    reg, ranges, centers = _synthetic_registry(args.cameras if args.mode == "multi" else 1)
    cameras = list(ranges.keys())
    lo = min(r[0] for r in ranges.values()) - 20
    hi = max(r[1] for r in ranges.values()) + 20
    scene = SyntheticScene(n_objects=10, seed=3, x_spawn=(lo + 30, hi - 30), x_visible=(lo, hi))

    cfg = TrackerConfig(
        max_tracks=64, max_dets=64, x_range=(lo - 50, hi + 50), f_init=2,
        det_step=args.det_step,
    )

    params = None
    if not args.oracle:
        from playground3d_tpu.models import load_params, retinanet_init

        params = retinanet_init(jax.random.PRNGKey(0), depth=args.depth)
        if args.checkpoint:
            params = load_params(args.checkpoint, params)

    fps = 30.0
    holder = {"f": 0}

    if args.mode == "single":
        from playground3d_tpu.pipeline.single_cam import SingleCameraTracker

        P = reg.P[0, 0]
        rng = np.random.default_rng(0)

        detect_fn = None
        if args.oracle:
            def detect_fn(frames):
                return oracle_detections(
                    scene, holder["f"] / fps, P, K=cfg.max_dets, noise_px=1.0, rng=rng
                )

        tracker = SingleCameraTracker(
            reg, cameras[0], cfg=cfg, det_params=params, depth=args.depth,
            detect_fn=detect_fn,
        )

        def frames():
            from playground3d_tpu.data.video import SyntheticVideoSource

            if args.oracle:
                for f in range(args.frames):
                    holder["f"] = f
                    yield np.zeros((8, 8, 3), np.float32), 1.6e9 + f / fps
            else:
                src = SyntheticVideoSource(
                    scene, P, n_frames=args.frames, height=args.height, width=args.width
                )
                for f, (frame, t) in enumerate(src):
                    holder["f"] = f
                    yield frame, t

        stats = tracker.track(frames())
        tracker.write_results_csv(args.out)
        print(f"tracked {stats['frames']} frames at {stats['fps']:.1f} fps -> {args.out}")
    else:
        from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker
        from playground3d_tpu.data.video import SyntheticVideoSource

        rng = np.random.default_rng(0)
        detect_fn = None
        if args.oracle:
            from playground3d_tpu.data.synthetic import mc_oracle_detections

            def detect_fn(frames, frame_num):
                return mc_oracle_detections(
                    scene, [holder["f"] / fps] * len(cameras), reg, cameras, ranges,
                    cfg.max_dets, rng,
                )

        crop_params = None
        if args.crop_checkpoint:
            from playground3d_tpu.models import load_params, retinanet_init

            crop_params = retinanet_init(jax.random.PRNGKey(1), depth=args.depth)
            crop_params = load_params(args.crop_checkpoint, crop_params)

        tracker = MultiCameraTracker(
            reg, cameras, cfg=cfg, det_params=params, crop_params=crop_params,
            depth=args.depth, detect_fn=detect_fn, centers=centers,
        )

        def source_for(ci):
            if args.oracle:
                def gen():
                    for f in range(args.frames):
                        yield np.zeros((8, 8, 3), np.float32), 1.6e9 + f / fps
                return gen()
            return SyntheticVideoSource(
                scene, reg.P[ci, 0], n_frames=args.frames,
                height=args.height, width=args.width,
            )

        if args.oracle:
            # manual loop so holder["f"] tracks the frame index
            its = [iter(source_for(ci)) for ci in range(len(cameras))]
            for f in range(args.frames):
                holder["f"] = f
                cur = [next(it) for it in its]
                tracker.process(np.stack([c[0] for c in cur]), [c[1] for c in cur], f)
        else:
            tracker.track([source_for(ci) for ci in range(len(cameras))], cutoff=args.frames)
        tracker.write_results_csv(args.out)
        print(f"wrote {args.out}")

    if args.gt_out or args.eval:
        from playground3d_tpu.evaluation import geometry_np as G
        from playground3d_tpu.evaluation.csv_io import TrackRecord, write_results_csv
        from playground3d_tpu.utils.constants import CLASS_NAMES

        P = reg.P[0, 0]
        gt = []
        for f in range(args.frames):
            t = f / fps
            states, idx = scene.states_at(t)
            if len(states) == 0:
                continue
            space = G.state_to_space(states)
            im = G.space_to_im(space, P)
            for i in range(len(states)):
                gt.append(
                    TrackRecord(
                        frame=f, timestamp=1.6e9 + t, obj_id=int(idx[i]),
                        class_name=CLASS_NAMES[int(scene.classes[idx[i]])],
                        state7=states[i], im_corners=im[i],
                        space_footprint=space[i, 0:4, :2], camera=cameras[0],
                    )
                )
        gt_path = args.gt_out or (args.out + ".gt.csv")
        write_results_csv(gt_path, gt)
        print(f"wrote GT to {gt_path}")

        if args.eval:
            from playground3d_tpu.evaluation.mot import MOTEvaluator

            ev = MOTEvaluator(
                gt_path, args.out, reg.H[0, 0], reg.P[0, 0],
                match_iou=0.3, cutoff_frame=args.frames,
            )
            ev.evaluate()
            ev.print_metrics()


if __name__ == "__main__":
    main()
