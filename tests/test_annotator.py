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
