"""Serve the browser annotation GUI on synthetic traffic (no dataset needed).

Two toy pole cameras over a synthetic highway scene; the session is seeded
from the scene's ground truth at t=0 so there are boxes to select, drag,
and edit immediately. Usage:

    python scripts/demo_annotator_web.py [--port 8008] [--frames 60]

Then open http://127.0.0.1:<port>/ — reference keybindings per the side
panel (manual_annotator_state_v3 workflow, README.md:1-16).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

# the axon sitecustomize imports jax at interpreter start (env vars already
# consumed), so the CPU override must go through jax.config — with the TPU
# tunnel down, any device touch on the axon backend hangs instead of failing
import jax

jax.config.update("jax_platforms", "cpu")

from playground3d_tpu.data.synthetic import SyntheticScene, render_frame
from playground3d_tpu.data.toy_cameras import make_projector, register_toy_camera
from playground3d_tpu.geometry.homography import CameraRegistry
from playground3d_tpu.tools.annotator import AnnotationSession
from playground3d_tpu.tools.annotator_shell import AnnotatorShell
from playground3d_tpu.tools.annotator_web import AnnotatorWeb


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--save", default="/tmp/annotator_web_demo.csv")
    args = p.parse_args(argv)

    reg = CameraRegistry()
    ranges = {"p1c1": (350.0, 560.0), "p1c2": (480.0, 700.0)}
    sx, sy = args.width / 1920.0, args.height / 1080.0
    for i, (name, rng_x) in enumerate(ranges.items()):
        # pitch -20 deg / 45 ft pole puts the roadway inside the visible
        # frame (the test fixture's +12 deg geometry is valid for round
        # trips but projects the ground above the image)
        proj0 = make_projector(
            cam_x=rng_x[0] - 30.0, height=45.0, pitch_deg=-20.0,
            cx=960.0 * sx, cy=540.0 * sy, f=2000.0 * sx,
        )
        register_toy_camera(reg, name, proj0, rng_x, seed=7 + i,
                            cx=960.0 * sx, cy=540.0 * sy)

    scene = SyntheticScene(n_objects=10, seed=3, x_spawn=(360, 660), x_visible=(340, 700))

    def frames(frame_idx, camera):
        c = reg.index(camera)
        img, _ = render_frame(
            scene, frame_idx / 30.0, reg.P[c, 0],
            height=args.height, width=args.width, normalized=False,
        )
        return img

    sess = AnnotationSession()
    states, idx = scene.states_at(0.0)
    for s, i in zip(states, idx):
        sess.add_box(0.0, s, int(scene.classes[i]))

    shell = AnnotatorShell(sess, registry=reg, cameras=list(ranges), frames=frames, t0=0.0)
    shell.save_path = args.save
    AnnotatorWeb(shell, height=args.height, width=args.width).serve_forever(port=args.port)


if __name__ == "__main__":
    main()
