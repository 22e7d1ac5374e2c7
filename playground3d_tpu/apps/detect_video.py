"""Detection-only video app (reference 3D_detect_video.py and
perform_3D_detection_on_video_sequences.py): run the detector over a frame
source and write a per-sequence detections CSV with a processing-fps log.

Usage:
    python -m playground3d_tpu.apps.detect_video --source synthetic \
        --frames 100 --out detections.csv [--depth 50] [--conf 0.3]
"""

from __future__ import annotations

import argparse
import csv
import time

import numpy as np


def write_detections_csv(path, rows, fps):
    """Per-sequence detections CSV with the reference's "Processing fps"
    trailer row (perform_3D_detection_on_video_sequences.py:124-194)."""
    header = ["frame", "timestamp", "class", "confidence"] + [
        f"c{i}" for i in range(16)
    ] + ["x1", "y1", "x2", "y2"]
    with open(path, "w", newline="") as f:
        out = csv.writer(f)
        out.writerow(header)
        for r in rows:
            out.writerow(r)
        out.writerow([f"Processing fps: {fps:.2f}"])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", default="synthetic", choices=["synthetic", "video", "imagedir"])
    ap.add_argument("--path", default=None, help="video file or image dir")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="detections.csv")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--checkpoint", default=None, help="npz detector params")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from playground3d_tpu.models import retinanet_init, load_params
    from playground3d_tpu.models.retinanet import detect_multiframe

    params = retinanet_init(jax.random.PRNGKey(0), depth=args.depth)
    if args.checkpoint:
        params = load_params(args.checkpoint, params)

    if args.source == "synthetic":
        from playground3d_tpu.data.synthetic import SyntheticScene
        from playground3d_tpu.data.video import SyntheticVideoSource
        from playground3d_tpu.geometry.homography import CameraRegistry

        # standalone synthetic camera
        rng = np.random.default_rng(7)
        from playground3d_tpu.data.dataset import SyntheticDetectionDataset

        ds = SyntheticDetectionDataset(image_shape=(args.height, args.width))
        source = SyntheticVideoSource(
            SyntheticScene(n_objects=8, seed=0, x_spawn=(450, 660), x_visible=(445, 680)),
            ds._P, n_frames=args.frames, height=args.height, width=args.width,
        )
    elif args.source == "video":
        from playground3d_tpu.data.video import VideoFrameSource

        source = VideoFrameSource(args.path, resize_hw=(args.height, args.width))
    else:
        from playground3d_tpu.data.video import ImageDirSource

        source = ImageDirSource(args.path)

    rows = []
    start = time.time()
    n = 0
    for frame_num, (frame, t_abs) in enumerate(source):
        if frame_num >= args.frames:
            break
        det = detect_multiframe(params, jnp.asarray(frame[None]), depth=args.depth)
        scores = np.asarray(det.scores)
        keep = np.asarray(det.mask) & (scores > args.conf)
        boxes = np.asarray(det.boxes)[keep]
        classes = np.asarray(det.classes)[keep]
        for i in range(len(boxes)):
            rows.append(
                [frame_num, t_abs, int(classes[i]), float(scores[keep][i])]
                + [float(v) for v in boxes[i]]
            )
        n += 1
        print(f"\rframe {frame_num}: {keep.sum()} detections", end="", flush=True)
    fps = n / max(time.time() - start, 1e-9)
    write_detections_csv(args.out, rows, fps)
    print(f"\nwrote {len(rows)} detections to {args.out} ({fps:.1f} fps)")


if __name__ == "__main__":
    main()
