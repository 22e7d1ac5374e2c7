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

    # cross-file evaluation (hand-corrected GT vs tracker output), taking
    # the PRED CSV's state columns at face value — the two artifacts carry
    # DIFFERENT homography fits, so this is expected to underestimate
    ev = MOTEvaluator(GT, PRED, H, P, match_iou=0.2, cutoff_frame=170, camera="p1c1")
    cross = ev.evaluate()

    # common-frame cross-file evaluation: predictions re-derived from their
    # IMAGE corners through the GT-fitted homography (image space is shared
    # between the artifacts), removing the frame mismatch
    ev3 = MOTEvaluator(
        GT, PRED, H, P, match_iou=0.2, cutoff_frame=170, camera="p1c1",
        pred_from_image=True,
    )
    common = ev3.evaluate()

    # self-consistency: a file scored against itself must be perfect
    ev2 = MOTEvaluator(PRED, PRED, H, P, match_iou=0.2, cutoff_frame=170, camera="p1c1")
    self_m = ev2.evaluate()

    # offset analysis: time-match the GT vehicle against the nearest pred
    # track in IMAGE space (homography-independent) and quantify the gap
    def cam_rows(d, cam):
        out = {}
        for f, rows in d.items():
            rr = [r for r in rows if len(r) > 36 and r[36].strip() == cam]
            if rr:
                out[f] = rr
        return out

    _, gtd = load_i24_csv(GT)
    _, prd = load_i24_csv(PRED)
    g, p = cam_rows(gtd, "p1c1"), cam_rows(prd, "p1c1")
    pts = {f: float(p[f][0][1]) for f in p}
    dxs, dys, ious = [], [], []
    for f in sorted(g.keys()):
        grow = g[f][0]
        gts = float(grow[1])
        gim = np.array([float(v) for v in grow[11:27]]).reshape(8, 2)
        fb = min(pts, key=lambda q: abs(pts[q] - gts))
        best = None
        for prow in p[fb]:
            pim = np.array([float(v) for v in prow[11:27]]).reshape(8, 2)
            d = np.linalg.norm(pim.mean(0) - gim.mean(0))
            if best is None or d < best[0]:
                best = (d, pim)
        pim = best[1]
        dxs.append(pim[:, 0].mean() - gim[:, 0].mean())
        dys.append(pim[:, 1].mean() - gim[:, 1].mean())
        gx1, gy1, gx2, gy2 = gim[:, 0].min(), gim[:, 1].min(), gim[:, 0].max(), gim[:, 1].max()
        px1, py1, px2, py2 = pim[:, 0].min(), pim[:, 1].min(), pim[:, 0].max(), pim[:, 1].max()
        iw = max(0.0, min(gx2, px2) - max(gx1, px1))
        ih = max(0.0, min(gy2, py2) - max(gy1, py1))
        inter = iw * ih
        union = (gx2 - gx1) * (gy2 - gy1) + (px2 - px1) * (py2 - py1) - inter
        ious.append(inter / union if union > 0 else 0.0)
    dx_m, dy_m, iou_m = float(np.mean(dxs)), float(np.mean(dys)), float(np.mean(ious))

    lines = [
        "# Reference-artifact parity (round 3)",
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
        "The face-value cross-file recall is 0 because the two committed",
        "artifacts were produced with different homography fits: the",
        "hand-corrected GT's single p1c1 vehicle sits ~5.6 ft laterally",
        "offset from the tracker-output roadway frame, below the 0.2 IoU",
        "gate.",
        "",
        "## Cross-file, COMMON frame (pred re-derived from image corners",
        "## through the GT-fitted homography; MOTEvaluator(pred_from_image))",
        "",
        f"- TP {common['TP']}, FP@0.2 {common['FP @ 0.2']}, FN {common['FN']},",
        f"  Recall {common['Recall']:.3f}, Precision {common['Precision']:.3f},",
        f"  MOTA {common['MOTA']:.3f}, ID switches {common['ID switches']}",
        "",
        "## Offset analysis: the artifacts are irreconcilable at the source",
        "",
        "Time-matching the GT vehicle to its nearest tracker box in IMAGE",
        "space (homography-independent; same recording — timestamps agree",
        "to <30 ms) over all 16 GT frames:",
        "",
        f"- mean center offset: dx {dx_m:+.1f} px, dy {dy_m:+.1f} px",
        f"- mean image-box IoU: {iou_m:.3f} (y-extents are DISJOINT in every",
        "  frame: e.g. GT y [768,859] vs pred y [951,1102] at frame 0)",
        "- the same physical vehicle is labeled 'midsize' in GT and tracked",
        "  as 'pickup' in the results file",
        "",
        "A ~200 px vertical offset in the committed image corners themselves",
        "cannot be produced by any homography/roadway-frame difference — the",
        "two artifacts come from different annotation/geometry generations of",
        "the reference workspace (its README calls it an intentionally messy",
        "MVP, README.md:20). No common-frame transformation can reconcile",
        "them; the quantified offsets above are the lock.",
    ]
    if "X precision" in common:
        lines += [
            f"- state precision vs GT (mean ft): "
            f"x {common['X precision'][0]:.2f}, y {common['Y precision'][0]:.2f}, "
            f"L {common['Length precision'][0]:.2f}, W {common['Width precision'][0]:.2f}, "
            f"H {common['Height precision'][0]:.2f}",
        ]
    lines += [
        "",
        "Image space is shared between the two artifacts, so the",
        "pred_from_image evaluation (both files scored through ONE",
        "homography, the reference mot_evaluator.py:120-408 structure) is",
        "the correct common-frame comparison — and it still scores TP 0,",
        "because the disagreement is in the committed image corners",
        "themselves, not in the roadway-frame fits. All numbers are",
        "committed as a stability lock for the evaluator pipeline on real",
        "reference data; `pred_from_image` remains the supported way to",
        "score any externally-produced tracking CSV against GT from a",
        "different geometry generation.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "REF_PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
