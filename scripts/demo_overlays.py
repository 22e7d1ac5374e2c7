"""Render the committed overlay demo artifact: a short synthetic 3-camera
sequence tracked with oracle detections, with the live-observability
callback (tools.visualize.TrackOverlayWriter) drawing posterior boxes,
velocity-rolled priors, and the clock-bias tint onto real rendered frames
(reference overlay loop MC3D_crop_tracker.py:733-917).

Writes PNGs under docs/assets/overlays/<camera>/ (small 270x480 frames so
the committed artifact stays light).

    python scripts/demo_overlays.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from playground3d_tpu.data.synthetic import (  # noqa: E402
    SyntheticScene,
    mc_oracle_detections,
    render_frame,
)
from playground3d_tpu.data.toy_cameras import (  # noqa: E402
    make_projector,
    register_toy_camera,
)
from playground3d_tpu.geometry.homography import CameraRegistry  # noqa: E402
from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker  # noqa: E402
from playground3d_tpu.tools.visualize import TrackOverlayWriter  # noqa: E402
from playground3d_tpu.utils.config import TrackerConfig  # noqa: E402

FPS = 30.0
N_FRAMES = 6
H, W = 270, 480


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "assets", "overlays",
    )
    reg = CameraRegistry()
    ranges = {}
    sx, sy = W / 1920.0, H / 1080.0
    for i in range(3):
        name = f"p1c{i + 1}"
        rng_x = (350.0 + 140.0 * i, 560.0 + 140.0 * i)
        # pitch -20 deg / 45 ft pole keeps the roadway inside the small
        # frame (same camera recipe as scripts/demo_annotator_web.py)
        proj = make_projector(
            cam_x=rng_x[0] - 30.0, height=45.0, pitch_deg=-20.0,
            cx=960.0 * sx, cy=540.0 * sy, f=2000.0 * sx,
        )
        register_toy_camera(
            reg, name, proj, rng_x, seed=7 + i, cx=960.0 * sx, cy=540.0 * sy
        )
        ranges[name] = rng_x
    cameras = list(ranges.keys())
    centers = np.array([[(a + b) / 2.0, 60.0] for a, b in ranges.values()], np.float32)

    scene = SyntheticScene(n_objects=8, seed=11, x_spawn=(360, 820), x_visible=(340, 860))
    cfg = TrackerConfig(max_tracks=32, max_dets=64, x_range=(320.0, 880.0), f_init=1)

    overlay = TrackOverlayWriter(reg, cameras, out_dir, every=2)
    det_rng = np.random.default_rng(0)
    tracker = MultiCameraTracker(
        reg, cameras, cfg=cfg,
        detect_fn=lambda frames, fn: mc_oracle_detections(
            scene, [fn / FPS] * len(cameras), reg, cameras, ranges,
            cfg.max_dets, det_rng,
        ),
        centers=centers,
        on_frame=overlay,
    )

    for f in range(N_FRAMES):
        frames = np.stack(
            [
                render_frame(
                    scene, f / FPS, reg.P[reg.index(c), 0],
                    height=H, width=W, normalized=False,
                    rng=np.random.default_rng(0),  # static background
                )[0]
                for c in cameras
            ]
        )
        tracker.process(frames, [1.6e9 + f / FPS] * len(cameras), f)
    overlay.close()
    n = sum(
        len(os.listdir(os.path.join(out_dir, c)))
        for c in cameras if os.path.isdir(os.path.join(out_dir, c))
    )
    print(f"wrote {n} overlay PNGs under {out_dir}")


if __name__ == "__main__":
    main()
