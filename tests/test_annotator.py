"""Annotator session operation tests."""

import numpy as np
import pytest

from playground3d_tpu.tools.annotator import AnnotationSession


def make_session():
    s = AnnotationSession()
    # object 0: EB at 30 ft/s
    for f in range(0, 30, 5):
        t = f / 30.0
        s.add_box(t, [400 + 30 * t, 30, 16, 6, 4, 1, 30], 0, obj_id=0)
    return s


def test_add_shift_resize_class():
    s = make_session()
    s.shift(0, 0.0, dx=2.0)
    assert s.labels[0][0].state7[0] == 402.0
    s.resize(0, 0.0, dl=1.0)
    assert s.labels[0][0].state7[2] == 17.0
    s.set_class(0, 3)
    assert all(l.class_id == 3 for l in s.labels[0])


def test_paste_forward_and_interpolate():
    s = make_session()
    s.paste_forward(0, 25 / 30.0, 1.0)
    last = max(s.labels[0], key=lambda l: l.t)
    assert last.t == pytest.approx(1.0)
    np.testing.assert_allclose(last.state7[0], 400 + 30 * 1.0, atol=0.2)

    s.interpolate(0, hz=30.0)
    ts = sorted(l.t for l in s.labels[0])
    assert len(ts) > 25
    np.testing.assert_allclose(np.diff(ts), 1 / 30.0, atol=1e-3)


def test_outlier_removal():
    s = make_session()
    s.interpolate(0, hz=30.0)
    # corrupt one label
    s.labels[0][10].state7[0] += 50.0
    n = s.remove_outliers(0, sigma=3.0)
    assert n == 1


def test_trajectory_fit():
    s = make_session()
    fx, fy = s.fit_trajectory(0, smoothing=0.1)
    np.testing.assert_allclose(fx(0.5), 415.0, atol=1.0)
    np.testing.assert_allclose(fy(0.5), 30.0, atol=1.0)


def test_ts_bias_solve():
    s = make_session()
    s.interpolate(0, hz=30.0)
    # camera B reports times 0.05s late: x observed at true t, reported t+0.05
    obs = {
        "A": [(0, t, 400 + 30 * t) for t in (0.2, 0.4, 0.6)],
        "B": [(0, t + 0.05, 400 + 30 * t) for t in (0.2, 0.4, 0.6)],
    }
    biases = s.solve_ts_bias(obs, reference_camera="A")
    assert biases["A"] == 0.0
    assert biases["B"] == pytest.approx(-0.05, abs=0.01)


def test_auto_label_matches_and_creates():
    s = make_session()
    dets = np.array([[400 + 30 * 1.0, 30, 16, 6, 4, 1], [500, 90, 18, 6, 5, -1.0]])
    ids = s.auto_label(dets, np.array([0, 2]), t=1.0)
    assert ids[0] == 0  # matched existing
    assert ids[1] != 0  # new object
    assert len(s.labels[ids[1]]) == 1


def test_save_load(tmp_path):
    s = make_session()
    p = str(tmp_path / "sess.npz")
    s.save(p)
    s2 = AnnotationSession.load(p)
    assert set(s2.labels.keys()) == {0}
    np.testing.assert_allclose(
        s2.labels[0][0].state7, s.labels[0][0].state7
    )


def test_reprojection_errors(toy_camera):
    reg = toy_camera["registry"]
    s = make_session()
    errs = s.reprojection_errors(0, reg.H[0, 0], reg.P[0, 0])
    assert errs.shape == (6,)
    assert np.isfinite(errs).all()


class TestAnnotatorShell:
    """Scriptable review shell (reference manual_annotator_state_v3.run
    :2865 + README keybindings, headless command parity)."""

    def _session(self):
        from playground3d_tpu.tools.annotator import AnnotationSession

        sess = AnnotationSession()
        t0 = 1.6e9
        for f in range(6):
            t = t0 + f / 30.0
            sess.add_box(t, [500.0 + 3 * f, 24.0, 18.0, 6.0, 5.0, 1.0, 90.0], 1, 0)
            sess.add_box(t, [540.0 + 3 * f, 36.0, 20.0, 6.5, 5.5, 1.0, 90.0], 2, 1)
        return sess, t0

    def _shell(self, sess, t0, **kw):
        import io

        from playground3d_tpu.tools.annotator_shell import AnnotatorShell

        return AnnotatorShell(sess, t0=t0, out=io.StringIO(), **kw)

    def test_scripted_edit_workflow(self, tmp_path, toy_camera):
        from playground3d_tpu.tools.annotator_shell import (
            AnnotatorShell,
            session_from_csv,
            session_to_records,
        )
        from playground3d_tpu.evaluation.csv_io import write_results_csv

        sess, t0 = self._session()
        reg = toy_camera["registry"]
        csv_in = str(tmp_path / "in.csv")
        write_results_csv(csv_in, session_to_records(sess, reg, "p1c1"))

        # reload through the CSV (round trip) and drive a scripted session
        sess2 = session_from_csv(csv_in)
        shell = self._shell(sess2, t0, registry=reg, cameras=["p1c1"])
        out_csv = str(tmp_path / "out.csv")
        png = str(tmp_path / "f3.png")
        shell.run(
            [
                "next 3",
                "show",
                "shift 0 2.5 -1.0",
                "dim 1 1.0 0 0",
                "class 1 semi",
                "copy 0",
                "next 1",
                "prev 1",
                f"render {png} 256 512",
                f"save {out_csv}",
                "quit",
            ]
        )
        assert shell.done
        import os

        assert os.path.exists(png) and os.path.exists(out_csv)

        back = session_from_csv(out_csv)
        # shift applied at frame 3 only
        l3 = [l for l in back.labels[0] if abs(l.t - (t0 + 3 / 30.0)) < 1e-3][0]
        assert abs(l3.state7[0] - (500.0 + 9 + 2.5)) < 1e-2
        assert abs(l3.state7[1] - 23.0) < 1e-2
        # dimension edit applied to ALL frames of object 1; class changed
        for l in back.labels[1]:
            assert abs(l.state7[2] - 21.0) < 1e-2
            assert l.class_id == list(__import__("playground3d_tpu.utils.constants", fromlist=["CLASS_NAMES"]).CLASS_NAMES).index("semi")

    def test_copy_paste_rollforward_and_undo(self):
        sess, t0 = self._session()
        shell = self._shell(sess, t0)
        shell.run(["copy 0", "goto 10", "paste"])
        ls = sorted(sess.labels[0], key=lambda l: l.t)
        # pasted at frame 10 with constant-velocity rollforward from frame 5
        assert abs(ls[-1].t - (t0 + 10 / 30.0)) < 1e-6
        expect_x = (500.0 + 15) + 90.0 * (5 / 30.0)
        assert abs(ls[-1].state7[0] - expect_x) < 1e-3
        n_before = len(sess.labels[0])
        shell.execute("undo")
        assert len(sess.labels[0]) == n_before - 1

    def test_delete_onward_and_auto(self):
        sess, t0 = self._session()

        def detector(t, camera):
            return np.array([[700.0, 48.0, 17.0, 6.0, 5.0, 1.0]]), np.array([0])

        shell = self._shell(sess, t0, detector=detector)
        shell.run(["goto 3", "delete 1"])
        assert all(l.t < t0 + 3 / 30.0 - 1e-9 for l in sess.labels[1])
        assert len(sess.labels[1]) == 3
        shell.run(["auto"])  # creates a new object from the detection
        new_id = max(sess.labels.keys())
        assert new_id >= 2
        assert abs(sess.labels[new_id][0].state7[0] - 700.0) < 1e-3

    def test_interactive_error_recovery(self):
        sess, t0 = self._session()
        shell = self._shell(sess, t0)
        shell.run(["bogus command", "shift 99 1 1", "next 2"])  # must not raise
        assert shell.frame == 2

    def test_cli_script_mode(self, tmp_path):
        from playground3d_tpu.tools import annotator_shell

        sess, _ = self._session()
        npz = str(tmp_path / "sess.npz")
        sess.save(npz)
        script = tmp_path / "cmds.txt"
        script.write_text("next 2\nshift 0 1 0\nsave\nquit\n")
        annotator_shell.main([npz, "--script", str(script)])
        from playground3d_tpu.tools.annotator import AnnotationSession

        back = AnnotationSession.load(npz)
        l2 = [l for l in back.labels[0] if abs(l.state7[0] - 507.0) < 1e-6]
        assert len(l2) == 1


def test_auto_label_e2e_pixels_to_scored_csv(tmp_path):
    """The welded workflow (VERDICT r2 #8): train briefly -> render -> y4m ->
    REAL pixel decode -> shell `auto` labeling -> cleanup -> CSV -> evaluator.
    Asserts plumbing: real decode happened, a session and a scored CSV exist.
    (Quality is asserted in the TPU-run demo, not at this step count.)"""
    import os

    from playground3d_tpu.apps import auto_label_e2e

    prefix = str(tmp_path / "al")
    metrics = auto_label_e2e.main([
        "--steps", "60", "--batch", "2", "--frames", "8",
        "--height", "96", "--width", "144", "--sigma-d", "0.01",
        "--out-prefix", prefix,
    ])
    assert os.path.exists(prefix + ".y4m")
    assert os.path.exists(prefix + "_session.npz")
    assert os.path.exists(prefix + "_pred.csv")
    assert os.path.exists(prefix + "_gt.csv")
    assert isinstance(metrics, dict) and "MOTA" in metrics
