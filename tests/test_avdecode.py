"""Real compressed-video ingest through the first-party libav shim.

The reference's actual recordings are H.264 mp4 read via cv2.VideoCapture
(util_track/mp_loader.py:90,213). native/avdecode.cc decodes the same
through the system FFmpeg libraries (present in this image with no CLI or
Python bindings) — these tests encode a REAL H.264 bitstream in-image
(libx264), decode it back through every emit path of VideoFrameSource,
and require the burned-in pixel timestamps to survive the lossy codec.
"""

import numpy as np
import pytest

from playground3d_tpu.data import avdecode as A

pytestmark = pytest.mark.skipif(
    not A.available(), reason="libav shim unavailable (no FFmpeg libs/toolchain)"
)


def test_h264_capability_registered():
    """This build's libavcodec decodes the reference's actual codecs."""
    assert A.has_decoder("h264")
    assert A.has_decoder("mpeg4")
    # hevc ships in the same lib (newer I-24 style recordings)
    assert A.has_decoder("hevc")


def _gradient_frames(n=16, h=96, w=128):
    frames = []
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        f[:, :, 1] = (i * 12) % 256
        f[h // 4 : h // 2, w // 4 : w // 2, 2] = 200
        frames.append(f)
    return frames


@pytest.mark.parametrize("codec", ["libx264", "mpeg4"])
def test_encode_decode_roundtrip(tmp_path, codec):
    """Every frame comes back, in order, at the right rate, pixel-close."""
    if not A.has_encoder(codec):
        pytest.skip(f"no {codec} encoder in this libav build")
    frames = _gradient_frames()
    path = str(tmp_path / f"clip_{codec}.mp4")
    with A.AvWriter(path, 128, 96, fps=30, codec=codec) as w:
        for f in frames:
            w.add(f)

    r = A.AvReader(path)
    assert (r.width, r.height) == (128, 96)
    assert abs(r.fps - 30.0) < 0.01, "packet durations must reach the muxer"
    n, last_pts = 0, -1.0
    while True:
        out = r.read_rgb()
        if out is None:
            break
        rgb, pts = out
        assert pts > last_pts  # display order, monotone
        last_pts = pts
        assert np.abs(rgb.astype(int) - frames[n].astype(int)).mean() < 4.0
        n += 1
    r.close()
    assert n == len(frames), "no frame may be lost to the encode/mux/decode chain"
    assert last_pts == pytest.approx(15 / 30.0, abs=1e-6)


def test_planar_yuv420_path(tmp_path):
    """H.264 decodes to YUV420P planes directly (the fused-tail host path)."""
    frames = _gradient_frames(n=6)
    path = str(tmp_path / "p.mp4")
    with A.AvWriter(path, 128, 96, fps=30) as w:
        for f in frames:
            w.add(f)
    r = A.AvReader(path)
    assert r.is_yuv420
    n = 0
    while True:
        out = r.read_planes()
        if out is None:
            break
        Y, U, V, pts = out
        assert Y.shape == (96, 128) and U.shape == (48, 64) and V.shape == (48, 64)
        n += 1
    r.close()
    assert n == 6


def test_video_frame_source_h264_with_timestamps(tmp_path, toy_camera):
    """The reference ingest scenario end to end on a REAL H.264 mp4:
    VideoFrameSource -> native-size decode -> burned pixel timestamps parse
    BEFORE resize -> resized normalized frames (mp_loader.py:206-247)."""
    from playground3d_tpu.data.synthetic import SyntheticScene
    from playground3d_tpu.data.video import DECODER, SyntheticVideoSource, VideoFrameSource

    assert DECODER == "lav", "first-party libav must win the backend probe here"

    reg = toy_camera["registry"]
    P = reg.P[0, 0]
    scene = SyntheticScene(n_objects=4, seed=3)
    t0 = 1.6e9
    src = SyntheticVideoSource(
        scene, P, n_frames=12, t0=t0, height=540, width=960,
        normalized=False, burn_timestamp=True,
    )
    frames_u8 = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f, _ in src]
    path = str(tmp_path / "clip.mp4")
    with A.AvWriter(path, 960, 540, fps=30, crf=12) as w:
        for f in frames_u8:
            w.add(f)

    vsrc = VideoFrameSource(path, resize_hw=(270, 480))
    assert vsrc._backend == "lav"
    decoded = list(vsrc)
    assert len(decoded) == 12
    for i, (frame, t) in enumerate(decoded):
        assert frame.shape == (270, 480, 3)
        # burned timestamps survive the lossy codec and parse pre-resize
        np.testing.assert_allclose(t, t0 + i / 30.0, atol=5e-3)


def test_video_frame_source_h264_s2d_and_yuv420(tmp_path, toy_camera):
    """The TPU feed layouts straight from compressed video: emit='s2d_u8'
    (fused planar tail) and emit='yuv420' (raw planes, device-side
    conversion) both serve from the H.264 stream's YUV420P planes."""
    from playground3d_tpu.data.synthetic import SyntheticScene
    from playground3d_tpu.data.video import VideoFrameSource

    reg = toy_camera["registry"]
    P = reg.P[0, 0]
    scene = SyntheticScene(n_objects=4, seed=5)
    src_frames = []
    from playground3d_tpu.data.video import SyntheticVideoSource

    src = SyntheticVideoSource(
        scene, P, n_frames=5, t0=1.6e9, height=256, width=384,
        normalized=False, burn_timestamp=True,
    )
    for f, _ in src:
        src_frames.append((np.clip(f, 0, 1) * 255).astype(np.uint8))
    path = str(tmp_path / "s.mp4")
    with A.AvWriter(path, 384, 256, fps=30, crf=12) as w:
        for f in src_frames:
            w.add(f)

    s2d = list(VideoFrameSource(path, resize_hw=(256, 384), emit="s2d_u8"))
    assert len(s2d) == 5
    for frame, t in s2d:
        assert frame.shape == (64, 96, 48) and frame.dtype == np.uint8
        assert t > 1.5e9  # real parsed epoch, not the 0-based fallback

    yuv = list(VideoFrameSource(path, resize_hw=(256, 384), emit="yuv420"))
    assert len(yuv) == 5
    for flat, t in yuv:
        assert flat.shape == (256 * 384 * 3 // 2,) and flat.dtype == np.uint8

    # the two layouts agree: unpacking the s2d frame matches converting the
    # raw planes on the host (same decoded pixels, two transport formats)
    from playground3d_tpu.data.video import VideoFrameSource as VFS

    Y = yuv[0][0][: 256 * 384].reshape(256, 384)
    U = yuv[0][0][256 * 384 : 256 * 384 + 128 * 192].reshape(128, 192)
    V = yuv[0][0][256 * 384 + 128 * 192 :].reshape(128, 192)
    rgb = VFS._rgb_from_planes(Y, U, V)
    from playground3d_tpu.data.video import pack_s2d

    np.testing.assert_allclose(
        pack_s2d(rgb).astype(int), s2d[0][0].astype(int), atol=2
    )


def test_frames_dir_to_video_mp4_export(tmp_path):
    """Overlay PNG frames -> real H.264 mp4 (reference im_to_vid parity with
    an actually-compressed artifact), decoded back to verify."""
    from playground3d_tpu.data.video import write_png
    from playground3d_tpu.tools.visualize import frames_dir_to_video

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(4):
        f = np.zeros((64, 96, 3), np.uint8)
        f[:, : (i + 1) * 20] = [40 * i, 200 - 40 * i, 128]
        write_png(str(d / f"frame_{i:05d}.png"), f)
    out = str(tmp_path / "overlay.mp4")
    n = frames_dir_to_video(str(d), out, fps=10)
    assert n == 4
    r = A.AvReader(out)
    assert r.codec == "h264"
    m = 0
    while r.read_rgb() is not None:
        m += 1
    r.close()
    assert m == 4


def test_session_mode_h264_mp4_end_to_end(tmp_path, toy_cameras3):
    """The reference's ACTUAL production flow, un-stubbed: a session
    directory holding H.264 .mp4 recording segments in the DEFAULT
    reference layout (record_{cam}_%05d.mp4, session.py:33) -> segment
    discovery -> real compressed decode via the libav shim -> fused clip
    tracking -> CSV (apps/track.py --mode session; MC3D __main__:
    1469-1651). The y4m twin lives in test_multicam; this one proves the
    compressed-video leg the image previously could not exercise."""
    import os

    from playground3d_tpu.apps import track as track_app
    from playground3d_tpu.data.synthetic import SyntheticScene
    from playground3d_tpu.data.video import SyntheticVideoSource

    reg = toy_cameras3["registry"]
    cameras = list(toy_cameras3["ranges"].keys())

    root = tmp_path / "session"
    (root / "recording").mkdir(parents=True)
    # no recording_filename override: the DEFAULT .mp4 format applies
    (root / "_SESSION_CONFIG.config").write_text(
        "".join(f"__CAMERA__\nname == {c}\n" for c in cameras)
    )
    (root / "_SESSION_INFO.txt").write_text("SESSION #1\n")

    scene = SyntheticScene(n_objects=6, seed=2, x_spawn=(380, 820), x_visible=(340, 860))
    H, W = 64, 96
    for ci, cam in enumerate(cameras):
        src = SyntheticVideoSource(
            scene, reg.P[ci, 0], n_frames=6, t0=1.6e9, height=H, width=W,
            normalized=False, burn_timestamp=False,
        )
        frames = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f, _ in src]
        for seg in range(2):
            with A.AvWriter(
                str(root / "recording" / f"record_{cam}_{seg:05d}.mp4"),
                W, H, fps=30, crf=12,
            ) as w:
                for f in frames[seg * 3 : (seg + 1) * 3]:
                    w.add(f)

    reg_path = str(tmp_path / "registry.npz")
    reg.save(reg_path)
    out = str(tmp_path / "out.csv")
    track_app.main(
        [
            "--mode", "session", "--session-dir", str(root),
            "--registry", reg_path,
            "--depth", "18", "--frames", "6", "--clip-len", "3",
            "--det-step", "1", "--height", str(H), "--width", str(W),
            "--emit", "s2d_u8", "--out", out,
        ]
    )
    assert os.path.exists(out)
    from playground3d_tpu.evaluation.csv_io import load_i24_csv

    headers, _ = load_i24_csv(out)
    assert headers[0] == "Frame #"
