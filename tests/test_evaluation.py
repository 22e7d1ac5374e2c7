"""CSV schema + MOT evaluator tests.

Includes a golden-file check: the reader must parse the reference repo's
committed tracking CSVs (SURVEY.md section 4 regression artifacts).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from playground3d_tpu.evaluation import geometry_np as G
from playground3d_tpu.evaluation.csv_io import (
    TrackRecord,
    load_i24_csv,
    write_results_csv,
    parse_state_row,
)
from playground3d_tpu.evaluation.mot import MOTEvaluator
from playground3d_tpu.geometry import state_to_space as j_state_to_space
from playground3d_tpu.geometry import state_to_im as j_state_to_im

REF_CSV = "/root/reference/3D_tracking_results.csv"


def test_numpy_twins_match_jax(rng):
    states = np.stack(
        [
            rng.uniform(400, 620, 6),
            rng.uniform(10, 110, 6),
            rng.uniform(12, 60, 6),
            rng.uniform(5, 9, 6),
            rng.uniform(3, 13, 6),
            np.sign(rng.normal(size=6) + 0.1),
        ],
        axis=1,
    )
    got = G.state_to_space(states)
    want = np.asarray(j_state_to_space(jnp.asarray(states.astype(np.float32))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    P = rng.normal(size=(3, 4))
    P[2] = [0, 0, 0.001, 1]
    got_im = G.state_to_im(states, P)
    want_im = np.asarray(j_state_to_im(jnp.asarray(states.astype(np.float32)), jnp.asarray(P.astype(np.float32))))
    np.testing.assert_allclose(got_im, want_im, rtol=1e-3, atol=1e-2)


@pytest.mark.skipif(not os.path.exists(REF_CSV), reason="reference not mounted")
def test_reader_parses_reference_golden_csv():
    headers, data = load_i24_csv(REF_CSV)
    assert headers[0] == "Frame #"
    assert len(data) > 0
    some_frame = sorted(data.keys())[0]
    row = data[some_frame][0]
    state = parse_state_row(row)
    assert state.shape == (7,)
    assert np.isfinite(state).all()
    # corner block parses as floats
    corners = np.array(row[11:27], dtype=np.float64)
    assert corners.shape == (16,)


def _make_track_records(camera_geom, n_frames=30, n_objs=5, noise=0.0, id_offset=0, seed=5):
    """Synthesize constant-velocity tracks and compose CSV records."""
    rng = np.random.default_rng(seed)
    H, P = camera_geom
    x0 = rng.uniform(420, 560, n_objs)
    y0 = rng.uniform(10, 110, n_objs)
    l = rng.uniform(14, 20, n_objs)
    w = rng.uniform(5.5, 7, n_objs)
    h = rng.uniform(4, 6, n_objs)
    d = np.where(y0 > 60, -1.0, 1.0)
    v = rng.uniform(20, 40, n_objs)
    classes = ["sedan", "midsize", "van", "pickup", "sedan"][:n_objs]

    records = []
    for f in range(n_frames):
        t = f / 30.0
        for i in range(n_objs):
            x = x0[i] + d[i] * v[i] * t + rng.normal(0, noise)
            state7 = np.array([x, y0[i] + rng.normal(0, noise), l[i], w[i], h[i], d[i], v[i]])
            space = G.state_to_space(state7[None])[0]
            im = G.space_to_im(space[None], P)[0]
            records.append(
                TrackRecord(
                    frame=f,
                    timestamp=1600000000.0 + t,
                    obj_id=i + id_offset,
                    class_name=classes[i],
                    state7=state7,
                    im_corners=im,
                    space_footprint=space[0:4, :2],
                    camera="p1c1",
                )
            )
    return records


@pytest.fixture(scope="module")
def camera_geom(toy_camera):
    reg = toy_camera["registry"]
    c = reg.index(toy_camera["cam"])
    return reg.H[c, 0], reg.P[c, 0]


def test_write_read_roundtrip(tmp_path, camera_geom):
    records = _make_track_records(camera_geom, n_frames=5)
    path = str(tmp_path / "out.csv")
    write_results_csv(path, records)
    headers, data = load_i24_csv(path)
    assert len(data) == 5
    assert len(data[0]) == 5
    st = parse_state_row(data[0][0])
    np.testing.assert_allclose(st, records[0].state7, rtol=1e-6)


def test_mot_evaluator_perfect_match(tmp_path, camera_geom):
    H, P = camera_geom
    gt = _make_track_records(camera_geom, n_frames=20)
    pred = _make_track_records(camera_geom, n_frames=20, id_offset=100)
    gt_path, pred_path = str(tmp_path / "gt.csv"), str(tmp_path / "pred.csv")
    write_results_csv(gt_path, gt)
    write_results_csv(pred_path, pred)

    ev = MOTEvaluator(gt_path, pred_path, H, P, match_iou=0.5, cutoff_frame=20)
    metrics = ev.evaluate()
    assert metrics["TP"] == 100
    assert metrics["FP"] == 0 and metrics["FN"] == 0
    assert metrics["Recall"] == 1.0 and metrics["Precision"] == 1.0
    assert metrics["ID switches"] == 0 and metrics["Fragmentations"] == 0
    assert metrics["MOTA"] == 1.0
    # state precision ~0 except height (two-pass refinement approximates)
    assert metrics["X precision"][0] < 0.2
    assert metrics["Y precision"][0] < 0.2


def test_mot_evaluator_pred_from_image_empty_speed(tmp_path, camera_geom):
    """pred_from_image must tolerate an empty speed field like the GT path
    does (regression: a redundant velocity-override loop crashed on '')."""
    H, P = camera_geom
    gt = _make_track_records(camera_geom, n_frames=5)
    pred = _make_track_records(camera_geom, n_frames=5, id_offset=100)
    gt_path, pred_path = str(tmp_path / "gt.csv"), str(tmp_path / "pred.csv")
    write_results_csv(gt_path, gt)
    write_results_csv(pred_path, pred)
    # blank the speed column of every pred row (as in hand-labeled CSVs)
    from playground3d_tpu.evaluation.csv_io import COL_SPEED

    rows = open(pred_path).read().splitlines()
    hdr_n = len(rows) - sum(1 for r in rows if r.split(",")[0].strip().isdigit())
    out = rows[:hdr_n]
    for r in rows[hdr_n:]:
        cells = r.split(",")
        cells[COL_SPEED] = ""
        out.append(",".join(cells))
    open(pred_path, "w").write("\n".join(out) + "\n")

    ev = MOTEvaluator(
        gt_path, pred_path, H, P, match_iou=0.5, cutoff_frame=5,
        pred_from_image=True,
    )
    metrics = ev.evaluate()
    assert metrics["TP"] == 25 and metrics["FN"] == 0


def test_mot_evaluator_detects_errors(tmp_path, camera_geom):
    H, P = camera_geom
    gt = _make_track_records(camera_geom, n_frames=20)
    pred = _make_track_records(camera_geom, n_frames=20, noise=0.5, id_offset=100)
    # drop one object entirely -> FNs
    pred = [r for r in pred if r.obj_id != 102]
    gt_path, pred_path = str(tmp_path / "gt.csv"), str(tmp_path / "pred.csv")
    write_results_csv(gt_path, gt)
    write_results_csv(pred_path, pred)

    ev = MOTEvaluator(gt_path, pred_path, H, P, match_iou=0.3, cutoff_frame=20)
    metrics = ev.evaluate()
    assert metrics["FN"] >= 20  # one missing object over 20 frames
    assert metrics["Recall"] < 1.0
    assert 0.1 < metrics["X precision"][0] < 2.0  # noise shows up in ft


class TestRefInterop:
    """Reference-artifact interop: pickle converters + CSV camera refit +
    evaluator re-scoring of the committed reference CSVs."""

    def _fake_reference_pickle(self, tmp_path, wrapper=False):
        """Build a pickle shaped exactly like the reference's Homography /
        Homography_Wrapper (homography.py:336-380, 816-827) without
        importing reference code: stub modules registered in sys.modules."""
        import pickle
        import sys
        import types

        mod = types.ModuleType("homography")

        class Homography:
            pass

        class Homography_Wrapper:
            pass

        mod.Homography = Homography
        mod.Homography_Wrapper = Homography_Wrapper
        Homography.__module__ = "homography"
        Homography.__qualname__ = "Homography"
        Homography_Wrapper.__module__ = "homography"
        Homography_Wrapper.__qualname__ = "Homography_Wrapper"
        sys.modules["homography"] = mod
        try:
            rng = np.random.default_rng(0)
            H = rng.normal(0, 1, (3, 3))
            H_inv = np.linalg.inv(H)
            vps = rng.normal(500, 100, (3, 2))
            P = np.zeros((3, 4))
            P[:, 0] = H_inv[:, 0]
            P[:, 1] = H_inv[:, 1]
            P[:, 3] = H_inv[:, 2]
            P[:, 2] = np.array([vps[2][0], vps[2][1], 1]) * 0.01
            cor = {"H": H, "H_inv": H_inv, "P": P, "vps": vps,
                   "corr_pts": rng.normal(0, 1, (8, 2)), "space_pts": rng.normal(0, 1, (8, 2))}
            hg = Homography()
            hg.correspondence = {"p1c1": cor}
            obj = hg
            if wrapper:
                hg2 = Homography()
                cor2 = dict(cor)
                cor2["H"] = H * 2.0
                hg2.correspondence = {"p1c1": cor2}
                w = Homography_Wrapper()
                w.hg1, w.hg2 = hg, hg2
                obj = w
            p = str(tmp_path / ("w.cpkl" if wrapper else "h.cpkl"))
            with open(p, "wb") as f:
                pickle.dump(obj, f)
            return p, H, P
        finally:
            del sys.modules["homography"]

    def test_registry_from_reference_pickle(self, tmp_path):
        from playground3d_tpu.tools.ref_interop import registry_from_reference_pickle

        p, H, P = self._fake_reference_pickle(tmp_path)
        reg = registry_from_reference_pickle(p)
        c = reg.index("p1c1")
        np.testing.assert_allclose(reg.H[c, 0], H)
        np.testing.assert_allclose(reg.H[c, 1], H)  # "both" banks
        np.testing.assert_allclose(reg.P[c, 0], P)

    def test_registry_from_wrapper_pickle(self, tmp_path):
        from playground3d_tpu.tools.ref_interop import registry_from_reference_pickle

        p, H, P = self._fake_reference_pickle(tmp_path, wrapper=True)
        reg = registry_from_reference_pickle(p)
        c = reg.index("p1c1")
        np.testing.assert_allclose(reg.H[c, 0], H)
        np.testing.assert_allclose(reg.H[c, 1], H * 2.0)  # WB bank differs

    def test_kf_params_from_reference_pickle(self, tmp_path):
        import pickle

        import torch

        from playground3d_tpu.tools.ref_interop import kf_params_from_reference_pickle

        init = {
            "P": torch.eye(6) * 7.0,
            "Q": torch.eye(6) * 0.3,
            "R": torch.eye(5) * 0.2,
            "F": torch.eye(6),
            "H": torch.zeros(5, 6),
            "mu_Q": torch.zeros(6),
            "mu_R": torch.ones(5) * 0.1,
            "mu_v": torch.tensor(93.0),
        }
        p = str(tmp_path / "kf_params_save2.cpkl")
        with open(p, "wb") as f:
            pickle.dump(init, f)
        kfp = kf_params_from_reference_pickle(p)
        np.testing.assert_allclose(np.asarray(kfp.P0), np.eye(6) * 7.0)
        np.testing.assert_allclose(np.asarray(kfp.Q), np.eye(6) * 0.3)
        np.testing.assert_allclose(np.asarray(kfp.mu_R), np.full(5, 0.1))
        assert float(kfp.mu_v) == 93.0
        # optional models absent -> defaults kept
        assert np.asarray(kfp.R2).shape == (5, 5)

    def test_restricted_unpickler_blocks_code(self, tmp_path):
        """Reference classes become inert shells; nothing from the pickle's
        module namespace executes."""
        import pickle
        import sys
        import types

        mod = types.ModuleType("evil_ref")

        class Boom:
            def __setstate__(self, state):
                raise RuntimeError("reference code executed!")

        Boom.__module__ = "evil_ref"
        Boom.__qualname__ = "Boom"
        mod.Boom = Boom
        sys.modules["evil_ref"] = mod
        try:
            b = Boom.__new__(Boom)
            b.__dict__["x"] = 1
            p = str(tmp_path / "evil.pkl")
            with open(p, "wb") as f:
                pickle.dump(b, f)
        finally:
            del sys.modules["evil_ref"]
        from playground3d_tpu.tools.ref_interop import load_reference_pickle

        obj = load_reference_pickle(p)
        assert obj.x == 1 and type(obj).__name__ == "Boom"


@pytest.mark.skipif(not os.path.exists(REF_CSV), reason="reference not mounted")
class TestReferenceRescore:
    """Stability lock: our evaluator's numbers on the committed reference
    CSVs (documented in docs/REF_PARITY.md)."""

    GT = "/root/reference/working_3D_tracking_data.csv"
    PRED = "/root/reference/3D_tracking_results.csv"

    def _camera(self):
        from playground3d_tpu.tools.ref_interop import fit_camera_from_tracking_csv

        reg = fit_camera_from_tracking_csv(self.GT, "p1c1")
        c = reg.index("p1c1")
        return reg.H[c, 0], reg.P[c, 0]

    def test_csv_camera_refit_is_exact(self):
        from playground3d_tpu.evaluation.csv_io import load_i24_csv

        H, _ = self._camera()
        _, data = load_i24_csv(self.GT)
        for rows in data.values():
            for row in rows:
                if row[36].strip() != "p1c1":
                    continue
                imc = np.array([float(v) for v in row[11:27]]).reshape(8, 2)
                spc = np.array([float(v) for v in row[27:35]]).reshape(4, 2)
                pts = np.concatenate([imc[:4], np.ones((4, 1))], 1) @ H.T
                np.testing.assert_allclose(pts[:, :2] / pts[:, 2:], spc, atol=1e-5)

    def test_self_consistency_perfect(self):
        from playground3d_tpu.evaluation.mot import MOTEvaluator

        H, P = self._camera()
        m = MOTEvaluator(
            self.PRED, self.PRED, H, P, match_iou=0.2, cutoff_frame=170, camera="p1c1"
        ).evaluate()
        assert m["Recall"] == 1.0 and m["Precision"] == 1.0
        assert m["ID switches"] == 0 and m["MOTA"] == 1.0

    def test_cross_file_metrics_stable(self):
        from playground3d_tpu.evaluation.mot import MOTEvaluator

        H, P = self._camera()
        m = MOTEvaluator(
            self.GT, self.PRED, H, P, match_iou=0.2, cutoff_frame=170, camera="p1c1"
        ).evaluate()
        # committed in docs/REF_PARITY.md: different homography fits between
        # the two artifacts put the single GT vehicle below the IoU gate
        assert m["TP"] == 0 and m["FN"] == 16
        assert m["FP @ 0.2"] == 108
        assert m["True unique objects"] == 1
        assert m["Predicted unique objects"] == 34

    def test_common_frame_rescore_and_offset_lock(self):
        """pred_from_image scores both artifacts through ONE homography;
        TP stays 0 because the committed IMAGE corners themselves disagree
        (~240 px vertical offset, image IoU 0 — docs/REF_PARITY.md)."""
        import numpy as np

        from playground3d_tpu.evaluation.csv_io import load_i24_csv
        from playground3d_tpu.evaluation.mot import MOTEvaluator

        H, P = self._camera()
        m = MOTEvaluator(
            self.GT, self.PRED, H, P, match_iou=0.2, cutoff_frame=170,
            camera="p1c1", pred_from_image=True,
        ).evaluate()
        assert m["TP"] == 0 and m["FN"] == 16

        # the offset lock: time-matched same-vehicle boxes are disjoint in y
        def cam_rows(d):
            out = {}
            for f, rows in d.items():
                rr = [r for r in rows if len(r) > 36 and r[36].strip() == "p1c1"]
                if rr:
                    out[f] = rr
            return out

        _, gtd = load_i24_csv(self.GT)
        _, prd = load_i24_csv(self.PRED)
        g, p = cam_rows(gtd), cam_rows(prd)
        pts = {f: float(p[f][0][1]) for f in p}
        dys = []
        for f in sorted(g.keys()):
            grow = g[f][0]
            gim = np.array([float(v) for v in grow[11:27]]).reshape(8, 2)
            fb = min(pts, key=lambda q: abs(pts[q] - float(grow[1])))
            best = min(
                p[fb],
                key=lambda prow: np.linalg.norm(
                    np.array([float(v) for v in prow[11:27]]).reshape(8, 2).mean(0)
                    - gim.mean(0)
                ),
            )
            pim = np.array([float(v) for v in best[11:27]]).reshape(8, 2)
            dys.append(pim[:, 1].mean() - gim[:, 1].mean())
            # y-extents disjoint: pred box entirely below the GT box
            assert pim[:, 1].min() > gim[:, 1].max()
        assert 200.0 < float(np.mean(dys)) < 290.0


class TestCocoPath:
    """COCO-format loader + COCO-style mAP (reference dataloader.py:23,
    coco_eval.py:6 — pycocotools-free)."""

    def _write_coco(self, tmp_path):
        import json

        from playground3d_tpu.data.video import write_png

        img = np.zeros((64, 96, 3), np.uint8)
        img[10:30, 20:50] = 200
        write_png(str(tmp_path / "im1.png"), img)
        write_png(str(tmp_path / "im2.png"), img)
        coco = {
            "images": [
                {"id": 7, "file_name": "im1.png", "width": 96, "height": 64},
                {"id": 9, "file_name": "im2.png", "width": 96, "height": 64},
            ],
            "categories": [
                {"id": 3, "name": "car"},
                {"id": 11, "name": "truck"},
            ],
            "annotations": [
                {"id": 1, "image_id": 7, "category_id": 3, "bbox": [20, 10, 30, 20], "iscrowd": 0},
                {"id": 2, "image_id": 7, "category_id": 11, "bbox": [5, 5, 10, 12], "iscrowd": 0},
                {"id": 3, "image_id": 9, "category_id": 3, "bbox": [40, 20, 20, 18], "iscrowd": 0},
                {"id": 4, "image_id": 9, "category_id": 3, "bbox": [1, 1, 0.5, 8], "iscrowd": 0},
                {"id": 5, "image_id": 9, "category_id": 3, "bbox": [2, 2, 9, 9], "iscrowd": 1},
            ],
        }
        with open(tmp_path / "ann.json", "w") as f:
            json.dump(coco, f)
        return str(tmp_path)

    def test_coco_dataset_loads(self, tmp_path):
        from playground3d_tpu.data.coco import CocoDataset

        root = self._write_coco(tmp_path)
        ds = CocoDataset(root, "ann.json")
        assert len(ds) == 2 and ds.num_classes == 2
        assert ds.label_to_name == ["car", "truck"]
        img, ann = ds.sample(0)
        assert img.shape == (64, 96, 3) and img.max() <= 1.0
        assert ann.shape == (2, 5)
        np.testing.assert_allclose(ann[0], [20, 10, 50, 30, 0])  # xywh->xyxy, label 0
        # image 2: sub-pixel box dropped, crowd dropped -> 1 annotation
        ann2 = ds.annotations(1)
        assert ann2.shape == (1, 5)

    def test_coco_map_perfect_and_miss(self):
        from playground3d_tpu.evaluation.coco_eval import coco_map

        gt = [(1, 0, np.array([10, 10, 50, 50])), (2, 0, np.array([20, 20, 60, 60]))]
        # perfect detections
        det = [(1, 0, 0.9, np.array([10, 10, 50, 50])), (2, 0, 0.8, np.array([20, 20, 60, 60]))]
        m = coco_map(det, gt, num_classes=1)
        assert m["AP"] == pytest.approx(1.0, abs=1e-6)
        assert m["AP50"] == pytest.approx(1.0, abs=1e-6)
        # no detections
        m0 = coco_map([], gt, num_classes=1)
        assert m0["AP"] == 0.0

    def test_coco_map_iou_sweep(self):
        from playground3d_tpu.evaluation.coco_eval import coco_map

        gt = [(1, 0, np.array([0.0, 0.0, 100.0, 100.0]))]
        # IoU ~0.6 detection: counts for thresholds 0.5-0.6, not 0.65+
        det = [(1, 0, 0.9, np.array([0.0, 0.0, 100.0, 60.0]))]
        m = coco_map(det, gt, num_classes=1)
        assert m["AP50"] == pytest.approx(1.0, abs=0.02)
        assert m["AP75"] == 0.0
        assert 0.15 <= m["AP"] <= 0.35  # ~2-3/10 thresholds matched (the
        # IoU denominator eps puts an exact 0.6 IoU epsilon-under thr 0.60)

    def test_coco_map_false_positive_ranking(self):
        from playground3d_tpu.evaluation.coco_eval import coco_map

        gt = [(1, 0, np.array([10, 10, 50, 50]))]
        # high-scoring FP above a perfect TP halves interpolated precision
        det = [
            (1, 0, 0.95, np.array([200, 200, 240, 240])),
            (1, 0, 0.90, np.array([10, 10, 50, 50])),
        ]
        m = coco_map(det, gt, num_classes=1)
        assert m["AP50"] == pytest.approx(0.5, abs=0.02)
