"""Drive the round-3 review fixes end-to-end on the real TPU.

Paths under test (public API only):
1. apps/track.py --mode session --emit yuv420: the flat planar YUV buffers
   must reach track_clips with yuv_hw so color conversion + s2d packing run
   on device (the fix: yuv_hw was never passed, so the clip program traced
   with rank-3 frames and crashed).
2. evaluation.mot.MOTEvaluator(pred_from_image=True) on a CSV whose speed
   column is empty (the fix: a redundant velocity-override loop crashed on
   the empty field the _gt_frame path tolerates).
3. data.video.VideoFrameSource planar ts-strip parsing (refactored into
   _parse_ts_planes) for both emit modes on a timestamp-burned recording.
"""

import os
import sys
import tempfile
import time

import numpy as np

t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)


import jax

log(f"devices: {jax.devices()}")

from playground3d_tpu.data.synthetic import SyntheticScene
from playground3d_tpu.data.toy_cameras import toy_camera_chain
from playground3d_tpu.data.video import SyntheticVideoSource, VideoFrameSource, write_y4m
from playground3d_tpu.apps import track as track_app
from playground3d_tpu.evaluation.csv_io import COL_SPEED, load_i24_csv

tmp = tempfile.mkdtemp(prefix="verify_review_")
reg, ranges, centers, projectors = toy_camera_chain(2)
cameras = list(ranges.keys())

root = os.path.join(tmp, "session")
os.makedirs(os.path.join(root, "recording"))
with open(os.path.join(root, "_SESSION_CONFIG.config"), "w") as f:
    f.write(
        "".join(f"__CAMERA__\nname == {c}\n" for c in cameras)
        + "__PERSISTENT-RECORDING__\n"
        "recording_filename == ./recording/record_{cam_name}_%05d.y4m\n"
    )
with open(os.path.join(root, "_SESSION_INFO.txt"), "w") as f:
    f.write("SESSION #1\n")

H, W = 64, 96
scene = SyntheticScene(n_objects=6, seed=2, x_spawn=(380, 820), x_visible=(340, 860))
for ci, cam in enumerate(cameras):
    src = SyntheticVideoSource(
        scene, reg.P[ci, 0], n_frames=6, t0=1.6e9, height=H, width=W,
        normalized=False, burn_timestamp=True,
    )
    frames = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f, _ in src]
    write_y4m(
        os.path.join(root, "recording", f"record_{cam}_00000.y4m"), frames, fps=30
    )

reg_path = os.path.join(tmp, "registry.npz")
reg.save(reg_path)

# --- 1+3: session CLI, both emits, timestamps burned+parsed -----------------
for emit in ("yuv420", "s2d_u8"):
    out = os.path.join(tmp, f"out_{emit}.csv")
    log(f"track_session emit={emit} ...")
    track_app.main(
        [
            "--mode", "session", "--session-dir", root, "--registry", reg_path,
            "--depth", "18", "--frames", "6", "--clip-len", "3",
            "--det-step", "1", "--height", str(H), "--width", str(W),
            "--emit", emit, "--out", out,
        ]
    )
    headers, data = load_i24_csv(out)
    assert headers[0] == "Frame #", headers[:2]
    log(f"  emit={emit}: CSV written, {sum(len(v) for v in data.values())} rows")

# --- 2: pred_from_image with empty speed fields ------------------------------
# score the tracker's own output against a speed-blanked copy in image space
from playground3d_tpu.evaluation.mot import MOTEvaluator

gt_csv = os.path.join(tmp, "out_yuv420.csv")
pred_csv = os.path.join(tmp, "pred_blank_speed.csv")
raw = open(gt_csv).read().splitlines()
hdr_n = len(raw) - sum(1 for r in raw if r.split(",")[0].strip().isdigit())
out_rows = raw[:hdr_n]
for r in raw[hdr_n:]:
    cells = r.split(",")
    if len(cells) > COL_SPEED:
        cells[COL_SPEED] = ""
    out_rows.append(",".join(cells))
open(pred_csv, "w").write("\n".join(out_rows) + "\n")
Hm, Pm = np.asarray(reg.H[0, 0]), np.asarray(reg.P[0, 0])
m = MOTEvaluator(
    gt_csv, pred_csv, Hm, Pm, match_iou=0.3, cutoff_frame=6,
    camera=cameras[0], pred_from_image=True,
).evaluate()
log(f"pred_from_image empty-speed rescore: TP={m['TP']} FN={m['FN']}")

log("ALL REVIEW-FIX PATHS VERIFIED")
