"""Browser annotation GUI: HTTP surface over the AnnotatorShell.

Drives the real ThreadingHTTPServer in-process with urllib: page serve,
state JSON with projected pixel corners, PNG frame rendering, pixel-space
add (click) and shift (drag) converted through the camera homography, and
shell-command passthrough with undo — the reference's mouse workflow
(manual_annotator_state_v3.py:2865) minus the display dependency.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from playground3d_tpu.tools.annotator import AnnotationSession
from playground3d_tpu.tools.annotator_shell import AnnotatorShell
from playground3d_tpu.tools.annotator_web import AnnotatorWeb


@pytest.fixture()
def server(toy_camera):
    sess = AnnotationSession()
    # one EB vehicle at t=0 inside the camera's view
    sess.add_box(0.0, [450.0, 30.0, 16.0, 6.0, 4.0, 1.0, 30.0], 2, obj_id=0)
    shell = AnnotatorShell(
        sess, registry=toy_camera["registry"], cameras=["p1c1"], t0=0.0
    )
    web = AnnotatorWeb(shell)
    srv = web.make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield {"base": base, "web": web, "shell": shell, "sess": sess,
           "project": toy_camera["project"]}
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url, body):
    req = urllib.request.Request(url, data=json.dumps(body).encode(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_page_state_and_png(server):
    code, page = _get(server["base"] + "/")
    assert code == 200 and b"<canvas" in page

    code, raw = _get(server["base"] + "/state")
    st = json.loads(raw)
    assert st["camera"] == "p1c1" and st["frame"] == 0
    assert len(st["labels"]) == 1
    lab = st["labels"][0]
    assert lab["oid"] == 0 and lab["class_id"] == 2
    # projected corners must match the ground-truth projector for the
    # box's bottom corners (ground plane -> homography is exact)
    corners = np.asarray(lab["corners_px"])
    assert corners.shape == (8, 2)
    code, png = _get(server["base"] + "/frame.png")
    assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"


def test_pixel_add_round_trips_through_homography(server):
    # click the pixel of a KNOWN ground point; the server must convert it
    # back to (almost exactly) that roadway point
    target = np.array([[500.0, 40.0, 0.0]])
    px = server["project"](target)[0]
    code, st = _post(
        server["base"] + "/pixel", {"op": "add", "x": float(px[0]), "y": float(px[1])}
    )
    assert code == 200
    assert len(st["labels"]) == 2
    new = [l for l in st["labels"] if l["oid"] != 0][0]
    assert abs(new["state7"][0] - 500.0) < 0.5
    assert abs(new["state7"][1] - 40.0) < 0.5


def test_pixel_drag_shifts_in_roadway_feet(server):
    # drag from the pixel of (450,30) to the pixel of (458,33): the shift
    # must land within the px->ft->px round-trip tolerance of (+8,+3) ft
    p0 = server["project"](np.array([[450.0, 30.0, 0.0]]))[0]
    p1 = server["project"](np.array([[458.0, 33.0, 0.0]]))[0]
    code, st = _post(
        server["base"] + "/pixel",
        {"op": "shift", "oid": 0, "x0": float(p0[0]), "y0": float(p0[1]),
         "x1": float(p1[0]), "y1": float(p1[1])},
    )
    assert code == 200
    lab = [l for l in st["labels"] if l["oid"] == 0][0]
    assert abs(lab["state7"][0] - 458.0) < 0.5
    assert abs(lab["state7"][1] - 33.0) < 0.5

    # undo through the command passthrough restores the original position
    code, st = _post(server["base"] + "/cmd", {"line": "undo"})
    assert code == 200
    lab = [l for l in st["labels"] if l["oid"] == 0][0]
    assert lab["state7"][0] == pytest.approx(450.0, abs=1e-6)


def test_bad_requests_keep_session_alive(server):
    code, body = _post(server["base"] + "/pixel", {"op": "explode", "x": 1, "y": 2})
    assert code == 400 and "error" in body
    # unknown shell command is reported into the log, not an HTTP error
    code, st = _post(server["base"] + "/cmd", {"line": "frobnicate 1"})
    assert code == 200
    assert any("unknown command" in m for m in st["log"])
    # server still serves state
    code, _ = _get(server["base"] + "/state")
    assert code == 200


def test_malformed_json_body_answers_400(server):
    """A syntactically invalid POST body must produce an HTTP 400, not a
    dropped connection (the parse happens inside the handler's try)."""
    req = urllib.request.Request(
        server["base"] + "/cmd", data=b"{not json", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read().decode())
    # and the session is still alive
    with urllib.request.urlopen(server["base"] + "/state", timeout=10) as r:
        assert r.status == 200
