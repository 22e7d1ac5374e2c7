"""Synchronized multi-camera playback scrubber (reference datareader.py
plot_in:294-345): per-camera nearest-frame selection under clock bias,
constant-velocity rollforward to each camera's corrected frame time, and the
HTTP scrubber surface."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from playground3d_tpu.evaluation.datareader import TimeIndexedTracks
from playground3d_tpu.tools.playback_web import PlaybackWeb, SyncPlayback


def make_tracks():
    """One EB vehicle at constant velocity: x = 400 + 30 t, sampled at 10 Hz."""
    ts = np.arange(0.0, 4.0, 0.1)
    states = np.zeros((len(ts), 7))
    states[:, 0] = 400.0 + 30.0 * ts
    states[:, 1] = 40.0
    states[:, 2:5] = (16.0, 6.0, 4.0)
    states[:, 5] = 1.0
    states[:, 6] = 30.0
    return TimeIndexedTracks(
        times={3: ts}, states={3: states}, classes={3: "sedan"}
    )


@pytest.fixture()
def playback():
    # camera A on the shared clock at 30 Hz; camera B's clock runs 0.1 s
    # late but its frames are shifted by +0.1 s bias back onto the shared
    # clock (the tracker's ts-bias estimate)
    from playground3d_tpu.data.toy_cameras import make_projector, register_toy_camera
    from playground3d_tpu.geometry.homography import CameraRegistry

    reg = CameraRegistry()
    for i, name in enumerate(["p1c1", "p1c1b"]):
        register_toy_camera(
            reg, name, make_projector(cam_x=350.0), (380.0, 650.0), seed=7 + i
        )
    ts_a = np.arange(0.0, 4.0, 1 / 30.0)
    ts_b = ts_a - 0.1
    return SyncPlayback(
        make_tracks(),
        reg,
        ["p1c1", "p1c1b"],
        {"p1c1": ts_a, "p1c1b": ts_b},
        biases={"p1c1b": 0.1},
    ), reg


def test_frame_selection_under_bias(playback):
    pb, _ = playback
    # at master t=1.0: camera A frame 30 (t=30/30); camera B's corrected
    # clock equals A's, so the same index despite the raw offset
    assert pb.frame_at("p1c1", 1.0) == 30
    assert pb.frame_at("p1c1b", 1.0) == 30
    # nearest (not floor): t=1.02 is closer to frame 31 (1.0333) than 30
    assert pb.frame_at("p1c1", 1.02) == 31
    # clamped at the ends
    assert pb.frame_at("p1c1", -5.0) == 0
    assert pb.frame_at("p1c1", 99.0) == len(pb.cam_times["p1c1"]) - 1


def test_rollforward_to_camera_time(playback):
    pb, _ = playback
    # master t = 1.005 s: camera frame time 1.0; the 10 Hz track sample at
    # t=1.0 needs no roll; master t=1.05 -> frame t=1.0667, nearest earlier
    # track sample 1.0 rolled +0.0667 s at 30 ft/s
    views = pb.view_at(1.05)
    for v in views:
        assert v["ids"] == [3]
        t_frame = v["t_frame"]
        x_expect = 400.0 + 30.0 * t_frame  # closed form of the CV motion
        np.testing.assert_allclose(v["states"][0][0], x_expect, atol=1e-6)
        assert v["corners_px"].shape == (1, 8, 2)


def test_span_is_common_coverage(playback):
    pb, _ = playback
    lo, hi = pb.span()
    # both cameras' corrected clocks start at 0.0; B's corrected end is
    # (3.9667-0.1)+0.1 within a frame of A's
    np.testing.assert_allclose(lo, 0.0, atol=1e-9)
    assert 3.8 < hi <= 4.0


def test_view_marks_dead_tracks_absent(playback):
    pb, _ = playback
    # past the track's last sample + max_extrapolate the object drops out
    views = pb.view_at(99.0)  # clamps to last frame ~3.97 — still alive
    assert views[0]["ids"] == [3]
    pb2 = SyncPlayback(
        make_tracks(), None, ["c"], {"c": np.array([10.0])}, max_extrapolate=0.5
    )
    v = pb2.view_at(10.0)[0]
    assert v["ids"] == []  # 10 s is far past the 3.9 s track end


def test_http_scrubber(playback):
    pb, _ = playback
    web = PlaybackWeb(pb)
    srv = web.make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/", timeout=10) as r:
            page = r.read()
        assert r.status == 200 and b"scrub" in page and b"p1c1b" in page

        with urllib.request.urlopen(base + "/view?t=1.05", timeout=10) as r:
            view = json.loads(r.read())
        assert [c["camera"] for c in view["cameras"]] == ["p1c1", "p1c1b"]
        assert view["cameras"][0]["ids"] == [3]
        assert view["cameras"][0]["classes"] == ["sedan"]

        with urllib.request.urlopen(base + "/pframe.png?cam=p1c1&t=1.05", timeout=10) as r:
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # bad camera -> 400 with a JSON error, server stays alive
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(base + "/pframe.png?cam=nope&t=1.0", timeout=10)
        assert ei.value.code == 400
        with urllib.request.urlopen(base + "/view?t=0.0", timeout=10) as r:
            assert r.status == 200
    finally:
        srv.shutdown()
