"""Re-score the reference's committed tracking CSVs through this
framework's MOT evaluator, with the camera geometry re-fit from the CSVs
themselves (no pickle needed) — the evaluator-parity harness demanded by
SURVEY §4.3 / reference mot_evaluator.py:120-408.

Writes docs/REF_PARITY.md with the committed numbers; tests/test_evaluation
asserts they stay stable."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from playground3d_tpu.evaluation.csv_io import load_i24_csv  # noqa: E402
from playground3d_tpu.evaluation.mot import MOTEvaluator  # noqa: E402
from playground3d_tpu.tools.ref_interop import fit_camera_from_tracking_csv  # noqa: E402

REF = "/root/reference"
GT = os.path.join(REF, "working_3D_tracking_data.csv")
PRED = os.path.join(REF, "3D_tracking_results.csv")


def main():
    reg = fit_camera_from_tracking_csv(GT, "p1c1")
    c = reg.index("p1c1")
    H, P = reg.H[c, 0], reg.P[c, 0]

    # fit exactness: the committed footprints reproject through the fitted H
    _, data = load_i24_csv(GT)
    errs = []
    for rows in data.values():
        for row in rows:
            if row[36].strip() != "p1c1":
                continue
            imc = np.array([float(v) for v in row[11:27]]).reshape(8, 2)
            spc = np.array([float(v) for v in row[27:35]]).reshape(4, 2)
            pts = np.concatenate([imc[:4], np.ones((4, 1))], 1) @ H.T
            errs.append(np.abs(pts[:, :2] / pts[:, 2:] - spc).max())
    fit_err = float(np.max(errs))

    # cross-file evaluation (hand-corrected GT vs tracker output)
    ev = MOTEvaluator(GT, PRED, H, P, match_iou=0.2, cutoff_frame=170, camera="p1c1")
    cross = ev.evaluate()

    # self-consistency: a file scored against itself must be perfect
    ev2 = MOTEvaluator(PRED, PRED, H, P, match_iou=0.2, cutoff_frame=170, camera="p1c1")
    self_m = ev2.evaluate()

    lines = [
        "# Reference-artifact parity (round 2)",
        "",
        "Produced by `scripts/rescore_reference_csvs.py`: the reference's",
        "committed tracking CSVs scored through this framework's",
        "`MOTEvaluator`, with camera geometry re-fit from the CSVs' own",
        "paired image corners / roadway footprints",
        "(`tools/ref_interop.fit_camera_from_tracking_csv`).",
        "",
        f"- ground-plane homography refit max error: **{fit_err:.2e} ft**",
        "  (the committed footprints were generated through a true planar",
        "  homography, which the normalized DLT recovers exactly —",
        "  reference homography.py:354-355 parity)",
        "",
        "## Self-consistency (3D_tracking_results.csv vs itself, p1c1, IoU 0.2)",
        "",
        f"- Recall {self_m['Recall']:.3f}, Precision {self_m['Precision']:.3f},",
        f"  MOTA {self_m['MOTA']:.3f}, ID switches {self_m['ID switches']}",
        "",
        "## Cross-file (working_3D_tracking_data.csv GT vs 3D_tracking_results.csv, p1c1)",
        "",
        f"- TP {cross['TP']}, FP@0.2 {cross['FP @ 0.2']}, FN {cross['FN']},",
        f"  unique GT objects {cross['True unique objects']},",
        f"  unique pred objects {cross['Predicted unique objects']}",
        "",
        "The cross-file recall is 0 because the two committed artifacts were",
        "produced with different homography fits: the hand-corrected GT's",
        "single p1c1 vehicle sits ~5.6 ft laterally offset from the",
        "tracker-output roadway frame (GT x 379-433 / y~25 vs nearest pred",
        "track y~19), below the 0.2 IoU gate. The numbers are committed as a",
        "stability lock for the evaluator pipeline on real reference data.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "REF_PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
