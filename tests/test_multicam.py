"""Multi-camera crop tracker tests: cross-camera detection fusion, clock-bias
estimation, crop-branch machinery, and the full driver loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from playground3d_tpu.data.synthetic import SyntheticScene, mc_oracle_detections
from playground3d_tpu.evaluation import geometry_np as G
from playground3d_tpu.models.retinanet import Detections
from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker
from playground3d_tpu.utils.config import TrackerConfig

FPS = 30.0


@pytest.fixture(scope="module")
def mc_scene():
    return SyntheticScene(n_objects=10, seed=11, x_spawn=(360, 820), x_visible=(340, 860))


def build_tracker(toy_cameras3, mc_scene, clock_bias=None, n_frames=40, seed=0, estimate_ts=False):
    reg = toy_cameras3["registry"]
    cameras = list(toy_cameras3["ranges"].keys())
    ranges = toy_cameras3["ranges"]
    cfg = TrackerConfig(
        max_tracks=32, max_dets=64, x_range=(320.0, 880.0), f_init=2,
        estimate_ts_bias=estimate_ts,
    )
    rng = np.random.default_rng(seed)
    bias = clock_bias if clock_bias is not None else [0.0] * len(cameras)

    holder = {"f": 0}

    def detect_fn(frames, frame_num):
        t = holder["f"] / FPS
        t_per_cam = [t + bias[ci] * 0 for ci in range(len(cameras))]
        # NOTE: clock bias shifts the *reported* timestamp, not the physical
        # observation time: all cameras observe the scene at true time t, but
        # camera ci reports t + bias[ci].
        return mc_oracle_detections(
            mc_scene, [t] * len(cameras), reg, cameras, ranges, cfg.max_dets, rng
        )

    tracker = MultiCameraTracker(
        reg, cameras, cfg=cfg, detect_fn=detect_fn, centers=toy_cameras3["centers"]
    )

    def sources():
        out = []
        for ci in range(len(cameras)):
            def gen(ci=ci):
                for f in range(n_frames):
                    yield np.zeros((8, 8, 3), np.float32), 1.6e9 + f / FPS + bias[ci]
            out.append(gen())
        return out

    return tracker, sources, holder, cameras


def test_mc_fusion_no_duplicates(toy_cameras3, mc_scene):
    """Objects seen by two overlapping cameras must fuse to one track."""
    tracker, sources, holder, cameras = build_tracker(toy_cameras3, mc_scene)

    srcs = sources()
    it = [iter(s) for s in srcs]
    for f in range(40):
        holder["f"] = f
        cur = [next(i) for i in it]
        tracker.process(np.stack([c[0] for c in cur]), [c[1] for c in cur], f)

    # count tracks vs true objects present
    frame_num, t_abs, ids, states, classes = tracker.rows[-1]
    true_states, _ = mc_scene.states_at(39 / FPS)
    in_range = ((true_states[:, 0] >= 340) & (true_states[:, 0] <= 860)).sum()
    assert len(ids) <= in_range + 2, (len(ids), in_range)
    assert len(ids) >= in_range - 2

    # no two tracks on the same object (footprint overlap)
    if len(states) > 1:
        fp = G.footprint_xyxy(G.state_to_space(states))
        iou = G.iou_xyxy(fp, fp)
        np.fill_diagonal(iou, 0)
        assert iou.max() < 0.4, iou.max()


def test_mc_track_continuity_across_cameras(toy_cameras3, mc_scene):
    """A vehicle crossing camera boundaries keeps one id."""
    tracker, sources, holder, cameras = build_tracker(toy_cameras3, mc_scene, n_frames=40)
    srcs = sources()
    it = [iter(s) for s in srcs]
    id_hist = {}
    for f in range(40):
        holder["f"] = f
        cur = [next(i) for i in it]
        tracker.process(np.stack([c[0] for c in cur]), [c[1] for c in cur], f)
        _, _, ids, states, _ = tracker.rows[-1]
        for i, oid in enumerate(ids):
            id_hist.setdefault(int(oid), []).append((f, states[i, 0]))
    # most ids should persist over many frames
    long_tracks = [k for k, v in id_hist.items() if len(v) > 20]
    assert len(long_tracks) >= 4, {k: len(v) for k, v in id_hist.items()}


def test_ts_bias_estimation(toy_cameras3, mc_scene):
    """Camera 1 reports timestamps 50 ms late; the EMA estimator should
    drive ts_bias[1] toward -0.05 (bias-corrected time = reported + bias)."""
    from playground3d_tpu.pipeline.multi_cam import estimate_ts_bias

    tracker, sources, holder, cameras = build_tracker(
        toy_cameras3, mc_scene, clock_bias=[0.0, 0.05, 0.0], n_frames=60, estimate_ts=True
    )
    srcs = sources()
    it = [iter(s) for s in srcs]
    for f in range(60):
        holder["f"] = f
        cur = [next(i) for i in it]
        tracker.process(np.stack([c[0] for c in cur]), [c[1] for c in cur], f)
    bias = np.asarray(tracker.ts_bias)
    assert abs(bias[0]) < 1e-6  # reference camera fixed
    # the estimator should move camera 1 toward the negative of its clock bias
    assert bias[1] < -0.005, bias


def test_crop_step_machinery(toy_cameras3, mc_scene):
    """Crop branch with a real (untrained) resnet18: runs, keeps shapes, and
    the crop boxes cover the a-priori objects."""
    from playground3d_tpu.models import retinanet_init

    reg = toy_cameras3["registry"]
    cameras = list(toy_cameras3["ranges"].keys())
    cfg = TrackerConfig(
        max_tracks=8, max_dets=32, x_range=(320.0, 880.0), f_init=1,
        cd_max=8, cs=64, estimate_ts_bias=False,
    )
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18)

    rng = np.random.default_rng(2)
    holder = {"f": 0}

    def detect_fn(frames, frame_num):
        t = holder["f"] / FPS
        return mc_oracle_detections(
            mc_scene, [t] * 3, reg, cameras, toy_cameras3["ranges"], cfg.max_dets, rng
        )

    tracker = MultiCameraTracker(
        reg, cameras, cfg=cfg, detect_fn=detect_fn,
        crop_params=crop_params, depth=18, centers=toy_cameras3["centers"],
    )
    frames = np.zeros((3, 128, 192, 3), np.float32)

    # seed tracks with a detect frame, then run a crop frame
    holder["f"] = 0
    tracker.cfg = cfg
    snap0 = tracker.process(frames, [1.6e9] * 3, 0)
    n0 = int(np.asarray(snap0.raw_mask).sum())
    assert n0 > 0
    # crop frame: frame_num=1 not multiple of det_step=1... use det_step=2 semantics
    tracker2 = MultiCameraTracker(
        reg, cameras,
        cfg=TrackerConfig(
            max_tracks=8, max_dets=32, x_range=(320.0, 880.0), f_init=1,
            cd_max=8, cs=64, det_step=2, estimate_ts_bias=False,
        ),
        detect_fn=detect_fn, crop_params=crop_params, depth=18,
        centers=toy_cameras3["centers"],
    )
    holder["f"] = 0
    tracker2.process(frames, [1.6e9] * 3, 0)  # detect
    holder["f"] = 1
    snap = tracker2.process(frames, [1.6e9 + 1 / FPS] * 3, 1)  # crop branch
    assert snap is not None
    assert np.asarray(snap.states7).shape[1] == 7


def test_merge_dist_kills_duplicates(toy_cameras3, mc_scene):
    """merge_dist_ft kills the younger of two near-coincident same-direction
    tracks (cross-camera duplicates below the IoU pruning threshold)."""
    import jax.numpy as jnp
    from playground3d_tpu.pipeline.tracker_state import (
        init_track_state, lifecycle,
    )
    from playground3d_tpu.track.kf import default_params, kf_add

    kfp = default_params()
    cfg = TrackerConfig(max_tracks=8, x_range=(0.0, 2000.0), merge_dist_ft=12.0)
    st = init_track_state(8)
    # two tracks 8 ft apart (footprint IoU ~0 for 16ft-long cars offset 8ft
    # laterally? use laterally-close but longitudinally offset so IoU small)
    new_x = np.zeros((8, 6), np.float32)
    # 11 ft apart along x, 4 ft in y: footprint IoU ~0.05 (below phi_over
    # 0.1) but within merge_dist 12 ft
    new_x[0] = [500.0, 30.0, 16, 6, 4, 30.0]
    new_x[1] = [511.0, 34.0, 16, 6, 4, 30.0]
    add = np.zeros(8, bool); add[:2] = True
    st = st._replace(kf=kf_add(st.kf, jnp.asarray(new_x), jnp.ones(8), jnp.asarray(add), kfp))
    st = st._replace(age=jnp.asarray([5, 1, 0, 0, 0, 0, 0, 0]), ids=jnp.asarray([10, 11, -1, -1, -1, -1, -1, -1]))
    out = lifecycle(st, jnp.asarray(0.0), kfp, cfg)
    mask = np.asarray(out.kf.mask)
    assert mask[0] and not mask[1]  # older survives

    # without merge_dist both survive (footprints overlap < phi_over)
    cfg0 = TrackerConfig(max_tracks=8, x_range=(0.0, 2000.0), merge_dist_ft=0.0)
    out0 = lifecycle(st, jnp.asarray(0.0), kfp, cfg0)
    mask0 = np.asarray(out0.kf.mask)
    assert mask0[0] and mask0[1]


def test_merge_chain_safe():
    """A-B-C chain: B within radius of both A and C, but A-C far apart.
    Greedy semantics keep A (oldest) and C; only B dies."""
    import jax.numpy as jnp
    from playground3d_tpu.pipeline.tracker_state import init_track_state, lifecycle
    from playground3d_tpu.track.kf import default_params, kf_add

    kfp = default_params()
    cfg = TrackerConfig(max_tracks=8, x_range=(0.0, 2000.0), merge_dist_ft=12.0,
                        phi_over=0.0)
    st = init_track_state(8)
    new_x = np.zeros((8, 6), np.float32)
    new_x[0] = [500.0, 30.0, 4, 2, 4, 30.0]   # tiny footprints: overlap-NMS off
    new_x[1] = [511.0, 30.0, 4, 2, 4, 30.0]
    new_x[2] = [522.0, 30.0, 4, 2, 4, 30.0]
    add = np.zeros(8, bool); add[:3] = True
    st = st._replace(kf=kf_add(st.kf, jnp.asarray(new_x), jnp.ones(8), jnp.asarray(add), kfp))
    st = st._replace(age=jnp.asarray([5, 3, 1, 0, 0, 0, 0, 0]),
                     ids=jnp.asarray([10, 11, 12, -1, -1, -1, -1, -1]))
    # phi_over=0 disables overlap pruning entirely? cfg.phi_over>0 guard:
    # use small boxes so footprint IoU = 0 anyway
    cfg = TrackerConfig(max_tracks=8, x_range=(0.0, 2000.0), merge_dist_ft=12.0)
    out = lifecycle(st, jnp.asarray(0.0), kfp, cfg)
    mask = np.asarray(out.kf.mask)
    assert mask[0] and not mask[1] and mask[2], mask[:3]


def test_mc_clip_step_matches_sequential(toy_cameras3):
    """The fused cadence clip (one scan, detect/crop/skip switch) must equal
    per-frame step calls on identical s2d frames."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.resnet import space_to_depth
    from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params

    reg = toy_cameras3["registry"]
    cameras = list(toy_cameras3["ranges"].keys())
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry

    cfg = TrackerConfig(
        max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
        f_init=1, det_step=3, skip_step=1, cd_max=8, cs=32, crop_slots=8,
        estimate_ts_bias=True,
    )
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")

    clip = make_mc_clip_step(
        det_params, 18, bank, centers, kfp, cfg,
        crop_params=crop_params, crop_depth=18, stem="s2d", crop_stem="s2d",
    )

    rng = np.random.default_rng(3)
    T, C = 6, len(cameras)
    raw = rng.uniform(-1, 1, (T, C, 64, 96, 3)).astype(np.float32)
    s2d = np.asarray(jax.jit(space_to_depth)(jnp.asarray(raw.reshape(T * C, 64, 96, 3)))).reshape(
        T, C, 16, 24, 48
    )
    cam_times = (np.arange(T)[:, None] / 30.0 + np.zeros((1, C))).astype(np.float32)

    state0 = init_track_state(cfg.max_tracks)
    bias0 = jnp.zeros((C,), jnp.float32)
    state_c, bias_c, snaps = clip(
        state0, bias0, jnp.asarray(s2d), jnp.asarray(cam_times), jnp.int32(0)
    )

    # sequential reference with the same cadence
    from playground3d_tpu.pipeline.multi_cam import make_crop_step, make_mc_detect_step

    det_step = make_mc_detect_step(det_params, 18, bank, kfp, cfg, stem="s2d")
    crop_step = make_crop_step(
        crop_params, 18, bank, centers, kfp, cfg, stem="s2d", frame_stem="s2d"
    )
    state, bias = state0, bias0
    seq_snaps = []
    for i in range(T):
        f = jnp.asarray(s2d[i])
        t = jnp.asarray(cam_times[i])
        if i % cfg.det_step == 0:
            state, snap, bias = det_step(state, f, t, bias)
        else:
            state, snap = crop_step(state, f, t, bias)
        seq_snaps.append(snap)

    np.testing.assert_allclose(
        np.asarray(snaps.states7), np.stack([np.asarray(s.states7) for s in seq_snaps]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(snaps.raw_mask), np.stack([np.asarray(s.raw_mask) for s in seq_snaps])
    )
    np.testing.assert_allclose(np.asarray(bias_c), np.asarray(bias), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_c.kf.x), np.asarray(state.kf.x), rtol=1e-4, atol=1e-4
    )


def test_mc_clip_batched_detects_matches_unbatched(toy_cameras3):
    """batch_detects=True hoists the detector forwards out of the scan as one
    vmapped pass; outputs must be identical to the sequential clip (the
    hoisted stages depend only on pixels, never on tracker state)."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.resnet import space_to_depth
    from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params

    reg = toy_cameras3["registry"]
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry

    cfg = TrackerConfig(
        max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
        f_init=1, det_step=3, skip_step=1, cd_max=8, cs=32, crop_slots=8,
        estimate_ts_bias=True,
    )
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")

    kw = dict(crop_params=crop_params, crop_depth=18, stem="s2d", crop_stem="s2d")
    clip = make_mc_clip_step(det_params, 18, bank, centers, kfp, cfg, **kw)
    clip_b = make_mc_clip_step(
        det_params, 18, bank, centers, kfp, cfg, batch_detects=True, **kw
    )

    rng = np.random.default_rng(3)
    T, C = 6, len(toy_cameras3["ranges"])
    raw = rng.uniform(-1, 1, (T, C, 64, 96, 3)).astype(np.float32)
    s2d = np.asarray(
        jax.jit(space_to_depth)(jnp.asarray(raw.reshape(T * C, 64, 96, 3)))
    ).reshape(T, C, 16, 24, 48)
    cam_times = (np.arange(T)[:, None] / 30.0 + np.zeros((1, C))).astype(np.float32)

    state0 = init_track_state(cfg.max_tracks)
    bias0 = jnp.zeros((C,), jnp.float32)
    out_a = clip(state0, bias0, jnp.asarray(s2d), jnp.asarray(cam_times), jnp.int32(0))
    out_b = clip_b(state0, bias0, jnp.asarray(s2d), jnp.asarray(cam_times), jnp.int32(0))

    np.testing.assert_allclose(
        np.asarray(out_a[2].states7), np.asarray(out_b[2].states7), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_a[2].raw_mask), np.asarray(out_b[2].raw_mask)
    )
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(out_b[1]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_a[0].kf.x), np.asarray(out_b[0].kf.x), rtol=1e-5, atol=1e-5
    )


def test_crop_slots_subset_updates_only_selected(toy_cameras3):
    """With crop_slots < live tracks, only the top-priority live slots are
    attempted (stale-first, oldest on ties), and EVERY live slot without a
    good measurement accumulates fsld — the staleness signal the schedule
    rotates on (see test_scale.py for the no-starvation bound)."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_crop_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params

    reg = toy_cameras3["registry"]
    cfg = TrackerConfig(
        max_tracks=8, x_range=(320.0, 880.0), cd_max=4, cs=32, crop_slots=2,
        sigma_c=2.0,  # force "no good detection" so fsld increments
    )
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")
    step = make_crop_step(
        crop_params, 18, bank, centers, kfp, cfg, stem="s2d", frame_stem="s2d"
    )

    state = init_track_state(cfg.max_tracks)
    # hand-place 4 live tracks with distinct ages
    x = np.zeros((8, 6), np.float32)
    x[:4, 0] = [500.0, 520.0, 540.0, 560.0]
    x[:4, 1] = 60.0
    x[:4, 2:5] = [18, 6, 5]
    mask = np.zeros(8, bool)
    mask[:4] = True
    age = np.array([5, 1, 9, 2, 0, 0, 0, 0], np.int32)
    state = state._replace(
        kf=state.kf._replace(
            x=jnp.asarray(x), mask=jnp.asarray(mask),
            d=jnp.asarray(np.ones(8, np.float32)),
        ),
        age=jnp.asarray(age),
        ids=jnp.asarray(np.arange(8, dtype=np.int32)),
    )
    frames = jnp.asarray(np.zeros((3, 16, 24, 48), np.float32))
    times = jnp.zeros((3,), jnp.float32)
    bias = jnp.zeros((3,), jnp.float32)
    state2, _ = step(state, frames, times, bias)
    fsld = np.asarray(state2.fsld)
    # all fsld tie at 0, so the age tie-break selects slots 2 (age 9) and
    # 0 (age 5); sigma_c=2.0 means no measurement is "good", so every live
    # slot (attempted or skipped) accumulates one frame of staleness
    assert fsld[:4].tolist() == [1, 1, 1, 1]
    # dead slots never accumulate
    assert fsld[4:].tolist() == [0, 0, 0, 0]


def test_mc_clip_camera_sharded_matches_unsharded(toy_cameras3):
    """Camera-axis sharding over a device mesh (SURVEY section 2c) must not
    change results: the same clip advanced sharded vs unsharded."""
    import jax
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.resnet import space_to_depth
    from playground3d_tpu.parallel.mesh import make_mesh
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params

    reg = toy_cameras3["registry"]
    # 3 cameras -> pad the camera axis to 4 by reusing the first camera? No:
    # shard 3 cameras over a 3-device mesh (8 virtual devices available)
    mesh = make_mesh(3)
    cfg = TrackerConfig(
        max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
        f_init=1, det_step=2, skip_step=1, cd_max=8, cs=32, crop_slots=8,
    )
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")

    kw = dict(crop_params=crop_params, crop_depth=18, stem="s2d", crop_stem="s2d")
    clip_plain = make_mc_clip_step(det_params, 18, bank, centers, kfp, cfg, **kw)
    clip_mesh = make_mc_clip_step(det_params, 18, bank, centers, kfp, cfg, mesh=mesh, **kw)

    rng = np.random.default_rng(5)
    T, C = 4, 3
    raw = rng.uniform(-1, 1, (T * C, 64, 96, 3)).astype(np.float32)
    s2d = np.asarray(jax.jit(space_to_depth)(jnp.asarray(raw))).reshape(T, C, 16, 24, 48)
    cam_times = (np.arange(T)[:, None] / 30.0 + np.zeros((1, C))).astype(np.float32)

    state0 = init_track_state(cfg.max_tracks)
    bias0 = jnp.zeros((C,), jnp.float32)
    s1, b1, snaps1 = clip_plain(
        state0, bias0, jnp.asarray(s2d), jnp.asarray(cam_times), jnp.int32(0)
    )
    s2, b2, snaps2 = clip_mesh(state0, bias0, jnp.asarray(s2d), cam_times, 0)

    np.testing.assert_array_equal(np.asarray(snaps1.raw_mask), np.asarray(snaps2.raw_mask))
    np.testing.assert_allclose(
        np.asarray(snaps1.states7), np.asarray(snaps2.states7), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(s1.kf.x), np.asarray(s2.kf.x), rtol=1e-4, atol=1e-4)


def test_track_clips_driver_matches_per_frame(toy_cameras3):
    """The double-buffered clip host loop produces the same rows as the
    per-frame process() loop (d=1, identical frames)."""
    import jax
    from playground3d_tpu.models import retinanet_init

    reg = toy_cameras3["registry"]
    cameras = list(toy_cameras3["ranges"].keys())
    cfg = TrackerConfig(
        max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
        f_init=1, det_step=1, skip_step=1, estimate_ts_bias=False,
    )
    det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")

    def mk_tracker():
        return MultiCameraTracker(
            reg, cameras, cfg=cfg, det_params=det_params, depth=18,
            centers=toy_cameras3["centers"], stem="s2d",
        )

    n_frames = 5
    rng = np.random.default_rng(9)
    frames_all = rng.uniform(-1, 1, (n_frames, 3, 64, 96, 3)).astype(np.float32)

    def sources():
        out = []
        for ci in range(3):
            def gen(ci=ci):
                for f in range(n_frames):
                    yield frames_all[f, ci], 1.6e9 + f / 30.0
            out.append(gen())
        return out

    t1 = mk_tracker()
    t1.track(sources(), per_frame=True)
    t2 = mk_tracker()
    stats = t2.track_clips(sources(), clip_len=3)
    assert stats["frames"] == n_frames
    assert len(t1.rows) == len(t2.rows)
    for r1, r2 in zip(t1.rows, t2.rows):
        assert r1[0] == r2[0]
        np.testing.assert_array_equal(r1[2], r2[2])
        np.testing.assert_allclose(r1[3], r2[3], rtol=1e-4, atol=1e-4)

    # the reference-shaped default API must take the fused clip path, not
    # the per-frame loop (VERDICT r2: a caller following the reference API
    # got the slow path silently)
    t3 = mk_tracker()
    t3.track(sources(), clip_len=3)
    assert len(t3.rows) == len(t2.rows)
    for r2, r3 in zip(t2.rows, t3.rows):
        assert r2[0] == r3[0]
        np.testing.assert_array_equal(r2[2], r3[2])
        np.testing.assert_allclose(r2[3], r3[3], rtol=1e-5, atol=1e-5)


def test_per_frame_passthrough_rows_match_clip(toy_cameras3):
    """At det_step>1 with no crop net, non-cadence frames are passthrough on
    BOTH drivers: per-frame process() must emit the same rolled-forward
    snapshot rows as the clip scan's b_skip branch (it used to skip them,
    so records()/CSV silently disagreed between the two paths)."""
    import jax
    from playground3d_tpu.models import retinanet_init

    reg = toy_cameras3["registry"]
    cameras = list(toy_cameras3["ranges"].keys())
    cfg = TrackerConfig(
        max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
        f_init=1, det_step=3, skip_step=1, estimate_ts_bias=False,
    )
    det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")

    def mk_tracker():
        return MultiCameraTracker(
            reg, cameras, cfg=cfg, det_params=det_params, depth=18,
            centers=toy_cameras3["centers"], stem="s2d",
        )

    n_frames = 6
    rng = np.random.default_rng(10)
    frames_all = rng.uniform(-1, 1, (n_frames, 3, 64, 96, 3)).astype(np.float32)

    def sources():
        out = []
        for ci in range(3):
            def gen(ci=ci):
                for f in range(n_frames):
                    yield frames_all[f, ci], 1.6e9 + f / 30.0
            out.append(gen())
        return out

    t1 = mk_tracker()
    t1.track(sources(), per_frame=True)
    t2 = mk_tracker()
    t2.track_clips(sources(), clip_len=3)
    assert len(t1.rows) == len(t2.rows) == n_frames
    for r1, r2 in zip(t1.rows, t2.rows):
        assert r1[0] == r2[0]
        np.testing.assert_array_equal(r1[2], r2[2])
        np.testing.assert_allclose(r1[3], r2[3], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("emit", ["s2d_u8", "yuv420"])
def test_session_mode_cli_end_to_end(tmp_path, toy_cameras3, emit):
    """Production flow: session directory of y4m recordings -> discovery ->
    decode -> ignore regions -> fused clip tracking -> CSV (apps/track.py
    --mode session; reference MC3D __main__:1469-1651). emit=yuv420 covers
    the on-device color-conversion wiring (yuv_hw plumbed to track_clips)."""
    import os

    from playground3d_tpu.apps import track as track_app
    from playground3d_tpu.data.synthetic import SyntheticScene
    from playground3d_tpu.data.video import SyntheticVideoSource, write_y4m

    reg = toy_cameras3["registry"]
    cameras = list(toy_cameras3["ranges"].keys())

    root = tmp_path / "session"
    (root / "recording").mkdir(parents=True)
    (root / "_SESSION_CONFIG.config").write_text(
        "".join(f"__CAMERA__\nname == {c}\n" for c in cameras)
        + "__PERSISTENT-RECORDING__\n"
        "recording_filename == ./recording/record_{cam_name}_%05d.y4m\n"
    )
    (root / "_SESSION_INFO.txt").write_text("SESSION #1\n")

    scene = SyntheticScene(n_objects=6, seed=2, x_spawn=(380, 820), x_visible=(340, 860))
    H, W = 64, 96
    for ci, cam in enumerate(cameras):
        # two segments of 3 frames each per camera
        src = SyntheticVideoSource(
            scene, reg.P[ci, 0], n_frames=6, t0=1.6e9, height=H, width=W,
            normalized=False, burn_timestamp=False,
        )
        frames = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f, _ in src]
        for seg in range(2):
            write_y4m(
                str(root / "recording" / f"record_{cam}_{seg:05d}.y4m"),
                frames[seg * 3 : (seg + 1) * 3], fps=30,
            )

    reg_path = str(tmp_path / "registry.npz")
    reg.save(reg_path)
    igdir = tmp_path / "ignored_regions"
    igdir.mkdir()
    (igdir / f"{cameras[0]}_ignored.csv").write_text("0,0\n20,0\n20,16\n0,16\n")

    out = str(tmp_path / "out.csv")
    track_app.main(
        [
            "--mode", "session", "--session-dir", str(root),
            "--registry", reg_path, "--ignore-dir", str(igdir),
            "--depth", "18", "--frames", "6", "--clip-len", "3",
            "--det-step", "1", "--height", str(H), "--width", str(W),
            "--emit", emit, "--out", out,
        ]
    )
    assert os.path.exists(out)
    from playground3d_tpu.evaluation.csv_io import load_i24_csv

    headers, _ = load_i24_csv(out)
    assert headers[0] == "Frame #"


def test_mc_clip_unrolled_matches_scan(toy_cameras3):
    """unroll=True replaces the scan+switch with a straight-line program;
    with a clip-aligned frame0 the branch schedule is identical, so the
    outputs must match the scan clip exactly."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.resnet import space_to_depth
    from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry

    reg = toy_cameras3["registry"]
    cfg = TrackerConfig(
        max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
        f_init=1, det_step=3, skip_step=1, cd_max=8, cs=32, crop_slots=8,
        estimate_ts_bias=True,
    )
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")

    kw = dict(crop_params=crop_params, crop_depth=18, stem="s2d", crop_stem="s2d")
    clip = make_mc_clip_step(det_params, 18, bank, centers, kfp, cfg, **kw)
    clip_u = make_mc_clip_step(det_params, 18, bank, centers, kfp, cfg, unroll=True, **kw)

    rng = np.random.default_rng(4)
    T, C = 6, len(toy_cameras3["ranges"])
    raw = rng.uniform(-1, 1, (T, C, 64, 96, 3)).astype(np.float32)
    s2d = np.asarray(
        jax.jit(space_to_depth)(jnp.asarray(raw.reshape(T * C, 64, 96, 3)))
    ).reshape(T, C, 16, 24, 48)
    cam_times = (np.arange(T)[:, None] / 30.0 + np.zeros((1, C))).astype(np.float32)

    state0 = init_track_state(cfg.max_tracks)
    bias0 = jnp.zeros((C,), jnp.float32)
    out_a = clip(state0, bias0, jnp.asarray(s2d), jnp.asarray(cam_times), jnp.int32(0))
    out_u = clip_u(state0, bias0, jnp.asarray(s2d), jnp.asarray(cam_times), jnp.int32(0))

    np.testing.assert_allclose(
        np.asarray(out_a[2].states7), np.asarray(out_u[2].states7), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_a[2].raw_mask), np.asarray(out_u[2].raw_mask)
    )
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(out_u[1]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_a[0].kf.x), np.asarray(out_u[0].kf.x), rtol=1e-5, atol=1e-5
    )


def test_mc_clip_small_candidate_pools(toy_cameras3):
    """cd_max below the anchor count per crop (shipped default 8; sweep
    showed small pools beat large ones) keeps shapes and masks sane."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.resnet import space_to_depth
    from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry

    reg = toy_cameras3["registry"]
    for cd in (4, 8):
        cfg = TrackerConfig(
            max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
            f_init=1, det_step=3, skip_step=1, cd_max=cd, cs=32, crop_slots=8,
        )
        kfp = default_params()
        bank = bank_from_registry(reg)
        centers = jnp.asarray(toy_cameras3["centers"])
        det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
        crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")
        clip = make_mc_clip_step(
            det_params, 18, bank, centers, kfp, cfg,
            crop_params=crop_params, crop_depth=18, stem="s2d", crop_stem="s2d",
        )
        rng = np.random.default_rng(cd)
        T, C = 3, len(toy_cameras3["ranges"])
        raw = rng.uniform(-1, 1, (T, C, 64, 96, 3)).astype(np.float32)
        s2d = np.asarray(
            jax.jit(space_to_depth)(jnp.asarray(raw.reshape(T * C, 64, 96, 3)))
        ).reshape(T, C, 16, 24, 48)
        cam_times = (np.arange(T)[:, None] / 30.0 + np.zeros((1, C))).astype(np.float32)
        st, tb, snaps = clip(
            init_track_state(cfg.max_tracks), jnp.zeros((C,), jnp.float32),
            jnp.asarray(s2d), jnp.asarray(cam_times), jnp.int32(0),
        )
        assert snaps.states7.shape == (T, cfg.max_tracks, 7)
        assert bool(jnp.all(jnp.isfinite(jnp.where(snaps.raw_mask[..., None], snaps.states7, 0.0))))


def test_crop_step_size_nudge_pulls_to_class_mean(toy_cameras3):
    """cfg.size_nudge applies KF measurement model 3 after the crop update:
    live tracks' (l,w,h) move strictly toward their voted class's mean size
    versus the same step without the nudge; position columns are driven by
    the same crop measurement in both programs."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_crop_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.utils.constants import CLASS_DIMS

    reg = toy_cameras3["registry"]
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")

    def run(size_nudge):
        cfg = TrackerConfig(
            max_tracks=8, x_range=(320.0, 880.0), cd_max=4, cs=32,
            size_nudge=size_nudge,
        )
        step = make_crop_step(
            crop_params, 18, bank, centers, kfp, cfg, stem="s2d", frame_stem="s2d"
        )
        state = init_track_state(cfg.max_tracks)
        x = np.zeros((8, 6), np.float32)
        x[:2, 0] = [500.0, 540.0]
        x[:2, 1] = 60.0
        # sizes far from any class mean (drifted over a long crop stretch)
        x[:2, 2:5] = [40.0, 12.0, 11.0]
        mask = np.zeros(8, bool)
        mask[:2] = True
        P = np.tile(np.eye(6, dtype=np.float32)[None] * 5.0, (8, 1, 1))
        votes = np.zeros((8, CLASS_DIMS.shape[0]), np.float32)
        votes[:2, 2] = 3.0  # both tracks voted class 2
        state = state._replace(
            kf=state.kf._replace(
                x=jnp.asarray(x), P=jnp.asarray(P), mask=jnp.asarray(mask),
                d=jnp.asarray(np.ones(8, np.float32)),
            ),
            cls_votes=jnp.asarray(votes),
            ids=jnp.asarray(np.arange(8, dtype=np.int32)),
        )
        frames = jnp.asarray(np.zeros((3, 16, 24, 48), np.float32))
        state2, _ = step(state, frames, jnp.zeros((3,), jnp.float32), jnp.zeros((3,), jnp.float32))
        return np.asarray(state2.kf.x)

    x_plain = run(False)
    x_nudge = run(True)
    target = CLASS_DIMS[2]  # voted class mean (l, w, h)
    d_plain = np.abs(x_plain[:2, 2:5] - target[None])
    d_nudge = np.abs(x_nudge[:2, 2:5] - target[None])
    # strictly closer on every dimension of every live track
    assert np.all(d_nudge < d_plain), (d_plain, d_nudge)
    # dead slots untouched in both
    np.testing.assert_array_equal(x_plain[2:], x_nudge[2:])


def test_crop_conf_gate_blocks_subthreshold_updates(toy_cameras3):
    """cfg.crop_conf_gate: with an untrained crop net (focal-prior init,
    confidences ~0.01 << sigma_c) the gated program must leave live tracks
    coasting on the filter prediction (dt=0 here, so x unchanged), while the
    reference-parity default drags them toward the noise boxes."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_crop_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params

    reg = toy_cameras3["registry"]
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")

    x0 = np.zeros((8, 6), np.float32)
    x0[:2, 0] = [500.0, 540.0]
    x0[:2, 1] = 60.0
    x0[:2, 2:5] = [18.0, 7.0, 6.0]

    def run(gate):
        cfg = TrackerConfig(
            max_tracks=8, x_range=(320.0, 880.0), cd_max=4, cs=32,
            crop_conf_gate=gate,
        )
        step = make_crop_step(
            crop_params, 18, bank, centers, kfp, cfg, stem="s2d", frame_stem="s2d"
        )
        state = init_track_state(cfg.max_tracks)
        mask = np.zeros(8, bool)
        mask[:2] = True
        P = np.tile(np.eye(6, dtype=np.float32)[None] * 5.0, (8, 1, 1))
        state = state._replace(
            kf=state.kf._replace(
                x=jnp.asarray(x0), P=jnp.asarray(P), mask=jnp.asarray(mask),
                d=jnp.asarray(np.ones(8, np.float32)),
            ),
            ids=jnp.asarray(np.arange(8, dtype=np.int32)),
        )
        frames = jnp.asarray(np.zeros((3, 16, 24, 48), np.float32))
        state2, _ = step(
            state, frames, jnp.zeros((3,), jnp.float32), jnp.zeros((3,), jnp.float32)
        )
        return np.asarray(state2.kf.x), np.asarray(state2.fsld)

    x_gated, fsld_gated = run(True)
    x_ref, fsld_ref = run(False)
    # gated: sub-threshold measurement skipped -> pure dt=0 predict = x0
    np.testing.assert_allclose(x_gated[:2, :5], x0[:2, :5], atol=1e-5)
    # reference parity: the noise measurement moves the state
    assert np.abs(x_ref[:2, :5] - x0[:2, :5]).max() > 1e-3
    # fsld bookkeeping identical in both programs (conf-gated in reference too)
    np.testing.assert_array_equal(fsld_gated, fsld_ref)
    assert fsld_gated[:2].min() >= 1


def test_crop_conf_gate_also_gates_size_nudge(toy_cameras3):
    """With crop_conf_gate AND size_nudge enabled, a sub-sigma_c frame must
    coast the WHOLE state — the class-size nudge (measurement model 3) uses
    the same gated mask as the position update, so sizes are not pulled
    toward the class mean while the position coasts."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_crop_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.utils.constants import CLASS_DIMS

    reg = toy_cameras3["registry"]
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    # untrained crop net: confidences sit at the focal prior (~0.01 << sigma_c)
    crop_params = retinanet_init(jax.random.PRNGKey(1), depth=18, stem="s2d")

    cfg = TrackerConfig(
        max_tracks=8, x_range=(320.0, 880.0), cd_max=4, cs=32,
        size_nudge=True, crop_conf_gate=True,
    )
    step = make_crop_step(
        crop_params, 18, bank, centers, kfp, cfg, stem="s2d", frame_stem="s2d"
    )
    state = init_track_state(cfg.max_tracks)
    x0 = np.zeros((8, 6), np.float32)
    x0[:2, 0] = [500.0, 540.0]
    x0[:2, 1] = 60.0
    x0[:2, 2:5] = [40.0, 12.0, 11.0]  # far from every class mean
    mask = np.zeros(8, bool)
    mask[:2] = True
    P = np.tile(np.eye(6, dtype=np.float32)[None] * 5.0, (8, 1, 1))
    votes = np.zeros((8, CLASS_DIMS.shape[0]), np.float32)
    votes[:2, 2] = 3.0
    state = state._replace(
        kf=state.kf._replace(
            x=jnp.asarray(x0), P=jnp.asarray(P), mask=jnp.asarray(mask),
            d=jnp.asarray(np.ones(8, np.float32)),
        ),
        cls_votes=jnp.asarray(votes),
        ids=jnp.asarray(np.arange(8, dtype=np.int32)),
    )
    frames = jnp.asarray(np.zeros((3, 16, 24, 48), np.float32))
    state2, _ = step(
        state, frames, jnp.zeros((3,), jnp.float32), jnp.zeros((3,), jnp.float32)
    )
    x2 = np.asarray(state2.kf.x)
    # dt=0 + gated position + gated nudge -> the whole state coasts
    np.testing.assert_allclose(x2[:2], x0[:2], atol=1e-5)


def test_crop_step_conv7_uint8_frames_normalized(toy_cameras3):
    """conv7 frame path with uint8 transport: the gather crop interpolates
    to float 0-255, so the crop step must ImageNet-normalize before the
    crop net (bilinear commutes with the affine normalization, so results
    must match feeding pre-normalized float frames)."""
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_crop_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

    reg = toy_cameras3["registry"]
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(toy_cameras3["centers"])
    crop_params = retinanet_init(jax.random.PRNGKey(2), depth=18, stem="conv7")
    cfg = TrackerConfig(max_tracks=8, x_range=(320.0, 880.0), cd_max=4, cs=32)
    step = make_crop_step(
        crop_params, 18, bank, centers, kfp, cfg, stem="conv7", frame_stem="conv7"
    )

    state = init_track_state(cfg.max_tracks)
    x0 = np.zeros((8, 6), np.float32)
    x0[:2, 0] = [500.0, 540.0]
    x0[:2, 1] = 60.0
    x0[:2, 2:5] = [18.0, 7.0, 6.0]
    mask = np.zeros(8, bool)
    mask[:2] = True
    P = np.tile(np.eye(6, dtype=np.float32)[None] * 5.0, (8, 1, 1))
    state = state._replace(
        kf=state.kf._replace(
            x=jnp.asarray(x0), P=jnp.asarray(P), mask=jnp.asarray(mask),
            d=jnp.asarray(np.ones(8, np.float32)),
        ),
        ids=jnp.asarray(np.arange(8, dtype=np.int32)),
    )

    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (3, 64, 96, 3), dtype=np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    t = jnp.zeros((3,), jnp.float32)
    s_u8, _ = step(state, jnp.asarray(u8), t, t)
    s_f32, _ = step(state, jnp.asarray(f32), t, t)
    np.testing.assert_allclose(
        np.asarray(s_u8.kf.x)[:2], np.asarray(s_f32.kf.x)[:2], rtol=1e-3, atol=1e-3
    )
    # and the update actually moved the state (crops were not garbage-scaled)
    assert np.isfinite(np.asarray(s_u8.kf.x)[:2]).all()


def test_track_clips_propagates_source_errors(toy_cameras3):
    """A source iterator that dies mid-stream must surface its exception from
    track_clips, not silently truncate the output (the producer runs on a
    background thread; reference FrameLoader workers die visibly)."""
    from playground3d_tpu.models import retinanet_init

    reg = toy_cameras3["registry"]
    cameras = list(toy_cameras3["ranges"].keys())
    cfg = TrackerConfig(
        max_tracks=16, max_dets=16, pre_topk=128, x_range=(320.0, 880.0),
        f_init=1, det_step=1, skip_step=1, estimate_ts_bias=False,
    )
    det_params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
    tracker = MultiCameraTracker(
        reg, cameras, cfg=cfg, det_params=det_params, depth=18,
        centers=toy_cameras3["centers"], stem="s2d",
    )

    rng = np.random.default_rng(3)
    frames_all = rng.uniform(-1, 1, (4, 3, 64, 96, 3)).astype(np.float32)

    def sources():
        out = []
        for ci in range(3):
            def gen(ci=ci):
                for f in range(4):
                    if ci == 1 and f == 2:
                        raise RuntimeError("decoder died")
                    yield frames_all[f, ci], 1.6e9 + f / 30.0
            out.append(gen())
        return out

    with pytest.raises(RuntimeError, match="decoder died"):
        tracker.track_clips(sources(), clip_len=2)


def test_records_and_csv_roundtrip(tmp_path, toy_cameras3, mc_scene):
    """records()/write_results_csv over real tracked rows.

    Regression: the round-4 banked-projection refactor dropped the
    space-footprint source array from records(), which only the e2e apps
    exercised (NameError on the first written row).
    """
    tracker, sources, holder, cameras = build_tracker(toy_cameras3, mc_scene)
    it = [iter(s) for s in sources()]
    for f in range(10):
        holder["f"] = f
        cur = [next(i) for i in it]
        tracker.process(np.stack([c[0] for c in cur]), [c[1] for c in cur], f)

    recs = tracker.records()
    assert len(recs) > 0
    for r in recs[:5]:
        assert r.space_footprint.shape == (4, 2)
        assert np.isfinite(r.space_footprint).all()
        assert r.im_corners.shape == (8, 2)

    path = str(tmp_path / "pred.csv")
    tracker.write_results_csv(path)
    from playground3d_tpu.evaluation.csv_io import load_i24_csv

    _, by_frame = load_i24_csv(path)
    assert sum(len(v) for v in by_frame.values()) == len(recs)
