"""Diagnose id flips in the 10-camera/128-object scale test: trace, per
frame, the nearest live track (id + distance) for each flipped object and
every birth/death event, to tell apart fragmentation (kill+rebirth),
association steal, and duplicate tracks."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from playground3d_tpu.data.synthetic import SyntheticScene, mc_oracle_detections  # noqa: E402
from playground3d_tpu.data.toy_cameras import make_projector, register_toy_camera  # noqa: E402
from playground3d_tpu.geometry.homography import CameraRegistry  # noqa: E402
from playground3d_tpu.utils.config import TrackerConfig  # noqa: E402

FPS = 15.0
WATCH = [15, 29, 30, 44, 62, 82, 90, 95, 106]


def main():
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_mc_detect_step_from_detections
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params

    reg = CameraRegistry()
    ranges = {}
    for i in range(10):
        name = f"p1c{i + 1}"
        rng_x = (350.0 + 140.0 * i, 560.0 + 140.0 * i)
        register_toy_camera(
            reg, name, make_projector(cam_x=rng_x[0] - 30.0), rng_x, seed=7 + i
        )
        ranges[name] = rng_x
    cameras = list(ranges.keys())

    scene = SyntheticScene(
        n_objects=128, seed=3, x_spawn=(360.0, 1760.0), x_visible=(340.0, 1830.0)
    )
    cfg = TrackerConfig(
        max_tracks=256, max_dets=512, x_range=(320.0, 1840.0), f_init=1,
        estimate_ts_bias=False,
    )
    kfp = default_params()
    bank = bank_from_registry(reg)
    step = make_mc_detect_step_from_detections(bank, kfp, cfg)

    state = init_track_state(cfg.max_tracks)
    bias = jnp.zeros((len(cameras),), jnp.float32)
    det_rng = np.random.default_rng(0)
    hist = {oi: [] for oi in WATCH}
    prev_ids = set()
    for f in range(40):
        t = f / FPS
        det = mc_oracle_detections(
            scene, [t] * len(cameras), reg, cameras, ranges, cfg.max_dets, det_rng
        )
        times = jnp.full((len(cameras),), t, jnp.float32)
        state, snap, bias = step(state, det, times, bias)
        states7 = np.asarray(snap.states7)
        ids = np.asarray(snap.ids)
        mask = np.asarray(snap.raw_mask)
        live = states7[mask]
        lids = ids[mask]
        cur = set(lids.tolist())
        born = cur - prev_ids
        died = prev_ids - cur
        if f and (born or died):
            print(f"f={f:2d} born={sorted(born)} died={sorted(died)}")
        prev_ids = cur
        gts, gidx = scene.states_at(t)
        gl = list(gidx)
        for oi in WATCH:
            if oi not in gl:
                hist[oi].append((f, None, None, None))
                continue
            g = gts[gl.index(oi)]
            d = np.hypot(live[:, 0] - g[0], live[:, 1] - g[1])
            order = np.argsort(d)
            j0 = int(order[0])
            second = (
                (int(lids[order[1]]), round(float(d[order[1]]), 1))
                if len(order) > 1 and d[order[1]] < 15.0
                else None
            )
            hist[oi].append((f, int(lids[j0]), round(float(d[j0]), 2), second))

    for oi in WATCH:
        print(f"\nobject {oi}:")
        last = None
        for f, tid, dist, second in hist[oi]:
            if tid != last or (f in (8, 39)):
                print(f"  f={f:2d} id={tid} d={dist} 2nd={second}")
                last = tid


if __name__ == "__main__":
    main()
