"""Live-observability overlay tests: the opt-in per-frame callback on both
trackers (reference overlay loop, MC3D_crop_tracker.py:733-917) and the
headless TrackOverlayWriter renderer."""

import os

import numpy as np
import jax.numpy as jnp

from playground3d_tpu.data.synthetic import SyntheticScene, oracle_detections
from playground3d_tpu.data.video import read_png
from playground3d_tpu.pipeline.single_cam import SingleCameraTracker
from playground3d_tpu.pipeline.tracker_state import Snapshot
from playground3d_tpu.tools.visualize import TrackOverlayWriter
from playground3d_tpu.utils.config import TrackerConfig

FPS = 30.0


def _snap(states7, t):
    n = len(states7)
    return Snapshot(
        states7=jnp.asarray(np.asarray(states7, np.float32)),
        ids=jnp.arange(n, dtype=jnp.int32),
        classes=jnp.zeros((n,), jnp.int32),
        mask=jnp.ones((n,), bool),
        raw_mask=jnp.ones((n,), bool),
        t=jnp.asarray(t, jnp.float32),
    )


def test_overlay_writer_renders_boxes_and_bias(tmp_path, toy_camera):
    """Posterior boxes land in-frame through the real camera projection,
    priors appear from the second frame, and the clock-bias tint patch is
    stamped; PNGs flush through AsyncFrameWriter."""
    reg = toy_camera["registry"]
    w = TrackOverlayWriter(reg, ["p1c1"], str(tmp_path / "ov"))
    frame = np.zeros((1, 1080, 1920, 3), np.float32)

    # one EB vehicle well inside the toy camera's view
    s0 = np.array([[450.0, 60.0, 18.0, 6.0, 5.0, 1.0, 30.0]], np.float32)
    w(0, frame, _snap(s0, 0.0), ts_bias=np.asarray([0.02], np.float32))
    s1 = s0.copy()
    # posterior jumps 6 ft while the CV roll predicts +1 ft: the prior box
    # (blue) must stay visible beside the posterior (green), not be
    # overdrawn by an identical box
    s1[0, 0] += 6.0
    w(1, frame, _snap(s1, 1 / FPS), ts_bias=np.asarray([0.02], np.float32))
    w.close()

    files = sorted(os.listdir(str(tmp_path / "ov" / "p1c1")))
    assert files == ["00000.png", "00001.png"]
    img0 = read_png(str(tmp_path / "ov" / "p1c1" / files[0])) / 255.0
    img1 = read_png(str(tmp_path / "ov" / "p1c1" / files[1])) / 255.0
    # posterior (green-dominant) pixels drawn on the black frame
    green0 = ((img0[:, :, 1] > 0.8) & (img0[:, :, 0] < 0.4)).sum()
    assert green0 > 50, green0
    # priors (blue-dominant) only from the second frame on
    blue0 = ((img0[:, :, 2] > 0.8) & (img0[:, :, 1] < 0.6)).sum()
    blue1 = ((img1[:, :, 2] > 0.8) & (img1[:, :, 1] < 0.6)).sum()
    assert blue0 <= 64  # only the tint patch region could read blue-ish
    assert blue1 > 50, blue1
    # bias tint patch: +20ms on the +-33ms full scale -> red channel
    # 0.5 + 0.5*(20/33) ~= 0.80, blue pinned at 0.5
    assert img0[2, 2, 0] > 0.75 and img0[2, 2, 0] > img0[2, 2, 2] + 0.2
    assert w.frames_written == 2


def test_overlay_writer_unpacks_s2d_frames(tmp_path, toy_camera):
    """s2d-packed transport frames ([h,w,48] uint8) are unpacked back to
    RGB before rendering — the shipped TPU feed layout stays observable."""
    from playground3d_tpu.models.resnet import space_to_depth

    reg = toy_camera["registry"]
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (1, 64, 96, 3), np.uint8)
    s2d = np.asarray(space_to_depth(jnp.asarray(rgb.astype(np.float32)))).astype(
        np.uint8
    )
    w = TrackOverlayWriter(reg, ["p1c1"], str(tmp_path / "ov"))
    w(0, s2d, _snap(np.zeros((0, 7), np.float32), 0.0))
    w.close()
    img = read_png(str(tmp_path / "ov" / "p1c1" / "00000.png"))
    np.testing.assert_allclose(img, rgb[0], atol=1)


def test_trackers_invoke_on_frame(toy_camera):
    """Both drivers call the opt-in callback once per processed frame with
    (frame_num, frames, snap, ts_bias)."""
    reg = toy_camera["registry"]
    c = reg.index("p1c1")
    P = reg.P[c, 0]
    scene = SyntheticScene(n_objects=4, seed=3)
    cfg = TrackerConfig(max_tracks=16, max_dets=16, x_range=(300.0, 750.0), f_init=2)
    calls = []

    holder = {"f": 0}

    def detect_fn(frames):
        return oracle_detections(
            scene, holder["f"] / FPS, P, K=cfg.max_dets,
            rng=np.random.default_rng(0),
        )

    tr = SingleCameraTracker(
        reg, "p1c1", cfg=cfg, detect_fn=detect_fn,
        on_frame=lambda fn, frames, snap, bias: calls.append(
            (fn, frames.shape, bias)
        ),
    )

    def frames():
        for f in range(4):
            holder["f"] = f
            yield np.zeros((8, 8, 3), np.float32), 1.6e9 + f / FPS

    tr.track(frames())
    assert [c[0] for c in calls] == [0, 1, 2, 3]
    assert all(c[1] == (1, 8, 8, 3) for c in calls)

    # multi-camera driver: per-frame process() path
    from playground3d_tpu.data.synthetic import mc_oracle_detections
    from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker

    ranges = {"p1c1": (350.0, 750.0)}
    mc_calls = []
    mc = MultiCameraTracker(
        reg, ["p1c1"], cfg=cfg,
        detect_fn=lambda frames, fn: mc_oracle_detections(
            scene, [fn / FPS], reg, ["p1c1"], ranges, cfg.max_dets
        ),
        centers=np.array([[550.0, 60.0]], np.float32),
        on_frame=lambda fn, frames, snap, bias: mc_calls.append((fn, bias.shape)),
    )
    for f in range(3):
        mc.process(np.zeros((1, 8, 8, 3), np.float32), [1.6e9 + f / FPS], f)
    assert [c[0] for c in mc_calls] == [0, 1, 2]
    assert all(c[1] == (1,) for c in mc_calls)


def test_frames_dir_to_video_roundtrip(tmp_path):
    """Overlay PNGs -> first-party y4m video -> decoded frames match (the
    reference's im_to_vid workflow, minimal_3D_track.py:920-937)."""
    from playground3d_tpu.data.video import VideoFrameSource, write_png
    from playground3d_tpu.tools.visualize import frames_dir_to_video

    d = tmp_path / "frames"
    d.mkdir()
    # smooth gradients: 4:2:0 chroma subsampling is near-lossless on these
    # (random per-pixel chroma would not round-trip, by design of 4:2:0)
    yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
    frames = np.stack(
        [
            np.stack(
                [xx / 96 * 255, yy / 64 * 255, np.full_like(xx, 40.0 * i)], -1
            ).astype(np.uint8)
            for i in range(4)
        ]
    )
    for i, f in enumerate(frames):
        write_png(str(d / f"{i:05d}.png"), f)

    out = str(tmp_path / "overlay.y4m")
    n = frames_dir_to_video(str(d), out, fps=15)
    assert n == 4

    from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

    decoded = [
        f
        for f, _ in VideoFrameSource(out, resize_hw=(64, 96), parse_ts=False)
    ]
    assert len(decoded) == 4
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    for orig, dec in zip(frames, decoded):
        rgb = np.clip((dec * std + mean) * 255.0, 0, 255)  # de-normalize
        assert rgb.shape == (64, 96, 3)
        # BT.601 + 4:2:0 chroma averaging round trip on random noise:
        # luma-accurate, chroma averaged over 2x2
        err = np.abs(rgb - orig.astype(np.float32)).mean()
        assert err < 12.0, err


def test_np_banked_projection_matches_device_bank(toy_camera):
    """geometry_np.state_to_im_banked (the overlay/annotator host twin) must
    dispatch identically to pipeline.camera_bank.state_to_im_banked — bank
    by roadway side (y > 60 ft), NOT by direction sign."""
    import jax.numpy as jnp
    import numpy as np

    from playground3d_tpu.evaluation import geometry_np as G
    from playground3d_tpu.pipeline.camera_bank import (
        bank_from_registry,
        state_to_im_banked,
    )

    reg = toy_camera["registry"]
    bank = bank_from_registry(reg)
    rng = np.random.default_rng(11)
    n = 16
    states = np.zeros((n, 6), np.float32)
    states[:, 0] = rng.uniform(380.0, 520.0, n)
    # straddle the EB/WB split, with directions deliberately mismatched to
    # the side so a direction-sign dispatch would pick the wrong bank
    states[:, 1] = np.where(np.arange(n) % 2 == 0, 30.0, 90.0)
    states[:, 2:5] = [18.0, 6.0, 5.0]
    states[:, 5] = np.where(np.arange(n) % 4 < 2, 1.0, -1.0)

    host = G.state_to_im_banked(states, reg.P[0, 0], reg.P[0, 1])
    dev = np.asarray(
        state_to_im_banked(
            bank, jnp.asarray(states), jnp.zeros((n,), jnp.int32)
        )
    )
    np.testing.assert_allclose(host, dev, rtol=1e-4, atol=5e-2)
