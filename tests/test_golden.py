"""Golden-file regression test (SURVEY.md section 4 item 3): a committed
tracker-output CSV guards the full numeric pipeline — any change to
geometry, association, KF numerics, or CSV composition that shifts box
coordinates beyond 1e-2 ft is caught here.

Regenerate after an INTENTIONAL behavior change with:
    python -m tests.test_golden
"""

import os

import numpy as np
import pytest

from playground3d_tpu.data.synthetic import SyntheticScene, oracle_detections
from playground3d_tpu.data.toy_cameras import toy_camera_chain
from playground3d_tpu.evaluation.csv_io import load_i24_csv, parse_state_row
from playground3d_tpu.pipeline.single_cam import SingleCameraTracker
from playground3d_tpu.utils.config import TrackerConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "single_cam_golden.csv")
N_FRAMES = 40


def run_golden_scenario(out_path: str) -> None:
    reg, ranges, centers, _ = toy_camera_chain(1)
    cam = list(ranges.keys())[0]
    lo, hi = ranges[cam]
    scene = SyntheticScene(
        n_objects=6, seed=9, x_spawn=(lo + 20, hi - 20), x_visible=(lo, hi)
    )
    cfg = TrackerConfig(max_tracks=16, max_dets=16, x_range=(lo - 50, hi + 50), f_init=2)
    rng = np.random.default_rng(4)
    holder = {"f": 0}
    P = reg.P[0, 0]

    def detect_fn(frames):
        return oracle_detections(
            scene, holder["f"] / 30.0, P, K=cfg.max_dets, noise_px=0.5, rng=rng
        )

    tracker = SingleCameraTracker(reg, cam, cfg=cfg, detect_fn=detect_fn)

    def frames():
        for f in range(N_FRAMES):
            holder["f"] = f
            yield np.zeros((4, 4, 3), np.float32), 1.6e9 + f / 30.0

    tracker.track(frames())
    tracker.write_results_csv(out_path)


def rows_to_state_dict(path):
    _, data = load_i24_csv(path)
    out = {}
    for frame, rows in data.items():
        for r in rows:
            out[(frame, int(r[2]))] = parse_state_row(r)
    return out


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden not generated")
def test_tracker_matches_golden(tmp_path):
    out = str(tmp_path / "run.csv")
    run_golden_scenario(out)
    got = rows_to_state_dict(out)
    want = rows_to_state_dict(GOLDEN)
    assert set(got.keys()) == set(want.keys()), (
        len(got), len(want),
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5],
    )
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-2, err_msg=str(k))


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    run_golden_scenario(GOLDEN)
    print(f"regenerated {GOLDEN}")
