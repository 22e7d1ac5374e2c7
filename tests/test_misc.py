"""Tests for datareader resampling, AP evaluation, and visualization."""

import numpy as np
import pytest

from playground3d_tpu.evaluation.ap import compute_ap, evaluate_detections, mean_ap
from playground3d_tpu.evaluation.datareader import (
    TimeIndexedTracks,
    reinterpolate,
    rollforward,
    states_at,
    test_integrity as integrity_check,
)


def make_tracks():
    times, states, classes = {}, {}, {}
    for oid, (x0, v) in enumerate([(400.0, 30.0), (500.0, -25.0)]):
        ts = 1.6e9 + np.arange(0, 2, 1 / 30.0)
        d = 1.0 if v > 0 else -1.0
        st = np.zeros((len(ts), 7))
        st[:, 0] = x0 + v * (ts - ts[0])
        st[:, 1] = 30.0 + oid * 50
        st[:, 2:5] = [16, 6, 4]
        st[:, 5] = d
        st[:, 6] = abs(v)
        times[oid], states[oid], classes[oid] = ts, st, "sedan"
    return TimeIndexedTracks(times=times, states=states, classes=classes)


def test_rollforward():
    s = np.array([100.0, 30, 16, 6, 4, -1.0, 30.0])
    out = rollforward(s, 0.5)
    np.testing.assert_allclose(out[0], 100 - 15.0)


def test_states_at_interpolates():
    tracks = make_tracks()
    ids, states = states_at(tracks, 1.6e9 + 1.0)
    assert ids == [0, 1]
    np.testing.assert_allclose(states[0, 0], 430.0, atol=0.5)
    np.testing.assert_allclose(states[1, 0], 475.0, atol=0.5)


def test_reinterpolate_uniform():
    tracks = make_tracks()
    out = reinterpolate(tracks, hz=10.0)
    for oid in out.ids():
        dt = np.diff(out.times[oid])
        np.testing.assert_allclose(dt, 0.1, atol=1e-6)
        # x stays consistent with constant velocity (atol floor set by the
        # float64 quantization of UNIX-seconds input timestamps: ~2.4e-7 s
        # per sample -> v * 2.4e-7 ~ 1e-5 ft)
        x = out.states[oid][:, 0]
        np.testing.assert_allclose(np.diff(x), np.diff(x)[0], atol=1e-4)


def test_integrity_counts():
    ts = [0.0, 1 / 30, 1 / 30, 2 / 30, 0.01, 0.5]
    m = integrity_check(ts)
    assert m["duplicate_ts"] == 1
    assert m["backward_ts"] == 1
    assert m["gaps_over_100ms"] == 1


def test_compute_ap_perfect():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    assert compute_ap(r, p) == pytest.approx(1.0)


def test_evaluate_detections():
    gt = [(0, 0, np.array([10, 10, 20, 20.0])), (0, 0, np.array([30, 30, 40, 40.0])),
          (1, 1, np.array([10, 10, 20, 20.0]))]
    dets = [
        (0, 0, 0.9, np.array([10, 10, 20, 20.0])),  # TP
        (0, 0, 0.8, np.array([30, 31, 40, 41.0])),  # TP (iou>0.5)
        (0, 0, 0.7, np.array([50, 50, 60, 60.0])),  # FP
        (1, 1, 0.9, np.array([11, 11, 21, 21.0])),  # TP
    ]
    aps = evaluate_detections(dets, gt, num_classes=2)
    assert aps[0] == pytest.approx(1.0)
    assert aps[1] > 0.5
    assert 0.5 < mean_ap(aps) <= 1.0


def test_plot_boxes_and_birdseye(tmp_path):
    from playground3d_tpu.tools.visualize import birdseye_plot, plot_boxes

    frame = np.zeros((64, 96, 3), np.float32)
    boxes = np.array([[[10, 10], [30, 10], [10, 30], [30, 30],
                       [10, 5], [30, 5], [10, 25], [30, 25]]], np.float32)
    out = plot_boxes(frame, boxes, color=(1, 0, 0))
    assert out.sum() > 0 and frame.sum() == 0
    states = np.array([[450.0, 30, 16, 6, 4, 1, 30]])
    birdseye_plot(states, (400, 500), path=str(tmp_path / "b.png"), ids=[7])
    assert (tmp_path / "b.png").exists()
