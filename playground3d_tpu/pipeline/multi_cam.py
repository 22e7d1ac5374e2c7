"""Multi-camera crop tracker (reference ``MC_Crop_Tracker``,
MC3D_crop_tracker.py): tracks in the shared roadway frame across N cameras
with full-frame detection every ``d`` frames, crop-based re-detection in
between, continuous-time Kalman rolls against per-camera clocks, and online
per-camera clock-bias estimation.

TPU-first structure: both branches are single jitted device functions over
the fixed-capacity :class:`TrackState`; the crop branch crops and
re-detects ALL track slots in one batched pass (masked), fusing
roi_align -> crop detector -> best-box selection -> KF update.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from playground3d_tpu.evaluation import geometry_np as G
from playground3d_tpu.evaluation.csv_io import TrackRecord, write_results_csv
from playground3d_tpu.geometry import transforms as T
from playground3d_tpu.models.retinanet import Detections, detect_multiframe, localize
from playground3d_tpu.ops.iou import elementwise_iou, pairwise_iou
from playground3d_tpu.ops.roi_align import crop_and_resize
from playground3d_tpu.pipeline.camera_bank import (
    CameraBank,
    bank_from_registry,
    im_to_state_banked,
    refine_heights_banked,
    state_to_im_banked,
)
from playground3d_tpu.pipeline.tracker_state import (
    parse_detections_pre,
    space_nms_parsed,
    Snapshot,
    TrackState,
    associate_and_update,
    init_track_state,
    lifecycle,
    parse_detections,
    snapshot,
)
from playground3d_tpu.track.kf import KFParams, default_params, kf_predict, kf_update, kf_view
from playground3d_tpu.utils.config import TrackerConfig, camera_centers, tracking_x_range
from playground3d_tpu.utils.constants import CLASS_HEIGHTS, CLASS_NAMES, NUM_CLASSES
from playground3d_tpu.utils.profiling import StageTimers


# ---------------------------------------------------------------------------
# online clock-bias estimation (MC3D_crop_tracker.py:237-316)
# ---------------------------------------------------------------------------


def estimate_ts_bias(
    parsed,
    state: TrackState,
    ts_bias: jnp.ndarray,  # [C]
    kfp: KFParams,
    cfg: TrackerConfig,
) -> jnp.ndarray:
    """EMA update of per-camera clock bias from cross-camera detection pairs.

    For every detection pair (i, j) from different cameras whose roadway
    footprints overlap (same physical vehicle), the observed inter-camera
    x-offset divided by the direction's mean tracked velocity gives an
    observed dt; its deviation from the camera-clock dt is the clock bias
    signal, blended at rate ts_alpha. Camera 0 is the fixed reference.
    The reference iterates pairs sequentially (MC3D:309-315); we apply the
    per-camera mean of all pair updates in one step — same fixed point.
    """
    K = parsed.mask.shape[0]
    C = ts_bias.shape[0]

    # mean tracked speed per direction, falling back to mu_v (MC3D:254-265)
    live = state.kf.mask
    v = state.kf.x[:, 5]
    d = state.kf.d
    eb = live & (d > 0)
    wb = live & (d < 0)
    eb_speed = jnp.where(
        jnp.any(eb), jnp.sum(jnp.where(eb, v, 0.0)) / jnp.clip(jnp.sum(eb), 1), kfp.mu_v
    )
    wb_speed = jnp.where(
        jnp.any(wb), jnp.sum(jnp.where(wb, v, 0.0)) / jnp.clip(jnp.sum(wb), 1), kfp.mu_v
    )

    fp = T.space_footprint_xyxy(T.state_to_space(parsed.state))
    iou = pairwise_iou(fp, fp)
    valid_pair = (
        parsed.mask[:, None]
        & parsed.mask[None, :]
        & (parsed.cam_idx[:, None] != parsed.cam_idx[None, :])
        & (iou > cfg.phi_nms_space)
    )

    # offset of j's position relative to i, per pair (i receives the update)
    dx = parsed.state[None, :, 0] - parsed.state[:, None, 0]  # x_j - x_i
    # signed roadway x-velocity by the pair's direction (MC3D:295-302)
    x_vel = jnp.where(parsed.state[:, 5] > 0, eb_speed, -wb_speed)
    x_vel = jnp.where(jnp.abs(x_vel) > 1.0, x_vel, jnp.sign(x_vel) * 1.0 + (x_vel == 0))
    dt_obs = dx / x_vel[:, None]
    # expected dt from the RAW camera clocks (parsed.times are
    # bias-corrected; undo the correction)  (MC3D:293)
    raw_times = parsed.times - ts_bias[parsed.cam_idx]
    dt_expected = raw_times[None, :] - raw_times[:, None]
    time_error = dt_obs - dt_expected  # [K,K]

    # update target for camera of detection i: -te + ts_bias[cam_j]
    target = -time_error + ts_bias[parsed.cam_idx][None, :]
    cam_i = parsed.cam_idx  # [K]
    w = valid_pair.astype(jnp.float32)
    num = jnp.zeros((C,), jnp.float32).at[cam_i].add(jnp.sum(w * target, axis=1))
    den = jnp.zeros((C,), jnp.float32).at[cam_i].add(jnp.sum(w, axis=1))
    mean_target = num / jnp.clip(den, 1.0)
    has_update = (den > 0) & (jnp.arange(C) != 0)  # cam 0 is reference
    return jnp.where(
        has_update, (1 - cfg.ts_alpha) * ts_bias + cfg.ts_alpha * mean_target, ts_bias
    )


# ---------------------------------------------------------------------------
# crop re-detection branch (MC3D_crop_tracker.py:1146-1254)
# ---------------------------------------------------------------------------


def make_crop_step(
    crop_params,
    depth: int,
    bank: CameraBank,
    centers: jnp.ndarray,  # [C,2] camera view centers in roadway coords
    kfp: KFParams,
    cfg: TrackerConfig,
    stem: str = "conv7",
):
    """Jitted (state, frames [C,H,W,3], cam_times [C]) -> (state', snapshot).

    For every live slot: pick nearest camera, roll to that camera's clock,
    project, crop, re-detect, pick the best candidate box by
    (1-W)*IoU + W*conf, and Kalman-update.
    """

    @jax.jit
    def step(state: TrackState, frames: jnp.ndarray, cam_times: jnp.ndarray, ts_bias: jnp.ndarray):
        N = state.ids.shape[0]
        live = state.kf.mask

        # nearest camera per object (MC3D:1156-1164)
        pre = kf_view(state.kf, jnp.where(live, jnp.mean(cam_times) - state.t_off, 0.0), kfp)
        d2 = (pre[:, 0:1] - centers[None, :, 0]) ** 2 + (pre[:, 1:2] - centers[None, :, 1]) ** 2
        cam_idx = jnp.argmin(d2, axis=1).astype(jnp.int32)  # [N]

        # roll each object to its camera's (bias-corrected) clock (MC3D:1169-1172)
        obj_t = cam_times[cam_idx] + ts_bias[cam_idx]
        dt = jnp.where(live, obj_t - state.t_off, 0.0)
        kf1 = kf_predict(state.kf, dt, kfp)
        t_off = jnp.where(live, obj_t, state.t_off)

        state6 = jnp.concatenate([kf1.x[:, :5], kf1.d[:, None]], axis=1)
        im_objs = state_to_im_banked(bank, state6, cam_idx)  # [N,8,2]

        # square crop boxes, expanded (MC3D get_crop_boxes:920-945)
        hull = T.im_hull_xyxy(im_objs)
        w = hull[:, 2] - hull[:, 0]
        h = hull[:, 3] - hull[:, 1]
        scale = jnp.maximum(w, h) * cfg.crop_expand
        cx = (hull[:, 0] + hull[:, 2]) / 2
        cy = (hull[:, 1] + hull[:, 3]) / 2
        crop_boxes = jnp.stack(
            [cx - scale / 2, cy - scale / 2, cx + scale / 2, cy + scale / 2], axis=1
        )

        crops = crop_and_resize(frames, crop_boxes, cam_idx, out_size=cfg.cs)

        # crop detector (LOCALIZE path)
        reg_boxes, cls = localize(crop_params, crops, depth=depth, stem=stem)
        confs = jnp.max(cls, axis=2)
        classes = jnp.argmax(cls, axis=2).astype(jnp.int32)

        # top cd_max candidates per object (MC3D:1210-1215)
        top_conf, top_idx = jax.lax.top_k(confs, cfg.cd_max)  # [N,cd]
        rows = jnp.arange(N)[:, None]
        cand = reg_boxes[rows, top_idx]  # [N,cd,20]
        cand_cls = classes[rows, top_idx]

        # local crop coords -> global frame coords (MC3D local_to_global:948-971)
        corners = cand[:, :, :16].reshape(N, cfg.cd_max, 8, 2)
        corners = corners * (scale / cfg.cs)[:, None, None, None]
        corners = corners + crop_boxes[:, None, None, 0:2]

        # im -> state with per-candidate camera + height refine (MC3D:1217-1227)
        flat = corners.reshape(N * cfg.cd_max, 8, 2)
        flat_cam = jnp.repeat(cam_idx, cfg.cd_max)
        heights = jnp.asarray(CLASS_HEIGHTS)[cand_cls.reshape(-1)]
        cand_state = im_to_state_banked(bank, flat, flat_cam, heights)
        refined = refine_heights_banked(bank, cand_state, flat_cam, flat, heights)
        refined = jnp.where(jnp.isfinite(refined) & (refined > 0.5), refined, heights)
        cand_state = im_to_state_banked(bank, flat, flat_cam, refined)
        cand_state = cand_state.reshape(N, cfg.cd_max, 6)

        # best box per object: (1-W)*IoU(footprint, a-priori) + W*conf
        # (MC3D select_best_box:974-1028)
        apri_fp = T.space_footprint_xyxy(T.state_to_space(state6))  # [N,4]
        cand_fp = T.space_footprint_xyxy(
            T.state_to_space(cand_state.reshape(N * cfg.cd_max, 6))
        ).reshape(N, cfg.cd_max, 4)
        ious = elementwise_iou(cand_fp, apri_fp[:, None, :])
        score = (1 - cfg.w_conf) * ious + cfg.w_conf * top_conf
        best = jnp.argmax(score, axis=1)
        rowsN = jnp.arange(N)
        best_state = cand_state[rowsN, best]  # [N,6]
        best_conf = top_conf[rowsN, best]
        best_cls = cand_cls[rowsN, best]

        # measurement update with crop measurement model (R2) (MC3D:1235)
        upd = live
        kf2 = kf_update(kf1, best_state[:, :5], upd, kfp, measurement_idx=2)

        # fsld/class bookkeeping (MC3D:1240-1252)
        good = best_conf >= cfg.sigma_c
        fsld = jnp.where(live & good, 0, state.fsld + (live & ~good).astype(jnp.int32))
        votes = state.cls_votes + jnp.where(
            live[:, None], jax.nn.one_hot(best_cls, NUM_CLASSES), 0.0
        )
        conf_sum = state.conf_sum + jnp.where(live, best_conf, 0.0)
        conf_cnt = state.conf_cnt + live.astype(jnp.float32)

        new_state = state._replace(
            kf=kf2,
            fsld=fsld,
            age=state.age + live.astype(jnp.int32),
            cls_votes=votes,
            conf_sum=conf_sum,
            conf_cnt=conf_cnt,
            t_off=t_off,
        )
        t_ref = jnp.mean(cam_times)
        new_state = lifecycle(new_state, t_ref, kfp, cfg)
        snap = snapshot(new_state, t_ref, kfp, cfg)
        return new_state, snap

    return step


def make_mc_detect_step(
    det_params,
    depth: int,
    bank: CameraBank,
    kfp: KFParams,
    cfg: TrackerConfig,
    stem: str = "conv7",
):
    """Jitted multi-camera full-frame detection step with clock-bias
    estimation (MC3D track() detect branch :1068-1139)."""

    @jax.jit
    def step(
        state: TrackState,
        frames: jnp.ndarray,
        cam_times: jnp.ndarray,
        ts_bias: jnp.ndarray,
    ):
        det = detect_multiframe(
            det_params, frames, depth=depth, pre_topk=cfg.pre_topk,
            max_dets=cfg.max_dets, stem=stem,
        )
        corrected = cam_times + ts_bias
        pre = parse_detections_pre(det, bank, corrected, cfg)
        if cfg.estimate_ts_bias:
            ts_bias2 = estimate_ts_bias(pre, state, ts_bias, kfp, cfg)
        else:
            ts_bias2 = ts_bias
        parsed = space_nms_parsed(pre, cfg)
        t_ref = jnp.mean(cam_times)
        state, _, _ = associate_and_update(state, parsed, t_ref, kfp, cfg)
        state = lifecycle(state, t_ref, kfp, cfg)
        snap = snapshot(state, t_ref, kfp, cfg)
        return state, snap, ts_bias2

    return step


class MultiCameraTracker:
    """Host driver for N-camera tracking with crop re-detection.

    ``sources`` is a list of per-camera frame iterators yielding
    (frame [H,W,3] float32 normalized, t_abs float64). Detection/crop
    functions are pluggable like the single-camera driver.
    """

    def __init__(
        self,
        registry,
        cameras: Sequence[str],
        cfg: Optional[TrackerConfig] = None,
        kf_params: Optional[KFParams] = None,
        det_params=None,
        crop_params=None,
        depth: int = 50,
        detect_fn: Optional[Callable] = None,
        centers: Optional[np.ndarray] = None,
        stem: str = "conv7",
        crop_stem: str = "conv7",
    ):
        self.registry = registry
        self.cameras = list(cameras)
        self.cam_rows = [registry.index(c) for c in self.cameras]
        if cfg is None:
            try:
                x_range = tracking_x_range(self.cameras)
            except KeyError:
                x_range = (0.0, 2000.0)
            cfg = TrackerConfig(x_range=x_range)
        self.cfg = cfg
        self.kfp = kf_params if kf_params is not None else default_params()
        self.bank = bank_from_registry(registry)
        if centers is None:
            centers = np.asarray(camera_centers(self.cameras), np.float32)
        self.centers = jnp.asarray(centers)

        self.detect_fn = detect_fn
        if detect_fn is None:
            assert det_params is not None
            self._detect_step = make_mc_detect_step(
                det_params, depth, self.bank, self.kfp, cfg, stem=stem
            )
        else:
            self._parsed_step = make_mc_detect_step_from_detections(self.bank, self.kfp, cfg)
        if crop_params is not None:
            self._crop_step = make_crop_step(
                crop_params, depth, self.bank, self.centers, self.kfp, cfg,
                stem=crop_stem,
            )
        else:
            self._crop_step = None

        self.state = init_track_state(cfg.max_tracks)
        self.ts_bias = jnp.zeros((len(self.cameras),), jnp.float32)
        self.epoch: Optional[float] = None
        self.rows: List[tuple] = []
        self.ts_bias_log: List[np.ndarray] = []
        self.timers = StageTimers(["detect", "crop", "stage", "drain"])

    def process(self, frames: np.ndarray, times: Sequence[float], frame_num: int):
        """frames [C,H,W,3]; times: per-camera absolute times."""
        if self.epoch is None:
            self.epoch = float(min(times))
        cam_times = jnp.asarray(
            np.asarray([t - self.epoch for t in times], np.float32)
        )
        frames_j = jnp.asarray(frames)

        if frame_num % self.cfg.det_step == 0:
            with self.timers("detect"):
                if self.detect_fn is None:
                    self.state, snap, self.ts_bias = self._detect_step(
                        self.state, frames_j, cam_times, self.ts_bias
                    )
                else:
                    det = self.detect_fn(frames_j, frame_num)
                    self.state, snap, self.ts_bias = self._parsed_step(
                        self.state, det, cam_times, self.ts_bias
                    )
                jax.block_until_ready(snap.states7)
        elif self._crop_step is not None and frame_num % self.cfg.skip_step == 0:
            with self.timers("crop"):
                self.state, snap = self._crop_step(
                    self.state, frames_j, cam_times, self.ts_bias
                )
                jax.block_until_ready(snap.states7)
        else:
            return None

        with self.timers("drain"):
            ids = np.asarray(snap.ids)
            mask = np.asarray(snap.raw_mask)
            states = np.asarray(snap.states7)
            classes = np.asarray(snap.classes)
            self.rows.append(
                (
                    frame_num,
                    float(self.epoch + float(snap.t)),
                    ids[mask],
                    states[mask],
                    classes[mask],
                )
            )
            self.ts_bias_log.append(np.asarray(self.ts_bias))
        return snap

    def track(self, sources: List[Iterable], cutoff: int = 10**9, sync_ms: float = 20.0):
        """Pull frames from per-camera sources with time synchronization:
        cameras lagging the latest timestamp by >= sync_ms skip frames
        (MC3D time_sync_cameras:219-235)."""
        iters = [iter(s) for s in sources]
        start = time.time()
        n = 0
        cur = []
        try:
            cur = [next(it) for it in iters]
        except StopIteration:
            return {"frames": 0, "fps": 0.0}
        for frame_num in range(cutoff):
            times = [c[1] for c in cur]
            latest = max(times)
            try:
                for i in range(len(iters)):
                    while latest - cur[i][1] >= sync_ms / 1000.0:
                        cur[i] = next(iters[i])
            except StopIteration:
                break
            frames = np.stack([c[0] for c in cur])
            self.process(frames, [c[1] for c in cur], frame_num)
            n += 1
            try:
                cur = [next(it) for it in iters]
            except StopIteration:
                break
        wall = time.time() - start
        return {"frames": n, "fps": n / max(wall, 1e-9), **self.timers.totals()}

    # -- output --------------------------------------------------------------
    def records(self, camera: Optional[str] = None) -> List[TrackRecord]:
        cam = camera or self.cameras[0]
        c = self.registry.index(cam)
        out = []
        for k, (frame_num, t_abs, ids, states, classes) in enumerate(self.rows):
            if len(ids) == 0:
                continue
            space = G.state_to_space(states)
            use_wb = states[:, 1] > 60.0
            im_eb = G.space_to_im(space, self.registry.P[c, 0])
            im_wb = G.space_to_im(space, self.registry.P[c, 1])
            im = np.where(use_wb[:, None, None], im_wb, im_eb)
            bias = list(np.round(self.ts_bias_log[k], 6)) if self.ts_bias_log else None
            for i in range(len(ids)):
                out.append(
                    TrackRecord(
                        frame=frame_num,
                        timestamp=t_abs,
                        obj_id=int(ids[i]),
                        class_name=CLASS_NAMES[int(classes[i])],
                        state7=states[i],
                        im_corners=im[i],
                        space_footprint=space[i, 0:4, :2],
                        camera=cam,
                        ts_bias=bias,
                    )
                )
        return out

    def write_results_csv(self, path: str, camera: Optional[str] = None) -> None:
        write_results_csv(path, self.records(camera), ts_bias_cameras=self.cameras)


def make_mc_detect_step_from_detections(bank: CameraBank, kfp: KFParams, cfg: TrackerConfig):
    """Detect-branch step taking precomputed Detections (for oracle tests)."""

    @jax.jit
    def step(state: TrackState, det: Detections, cam_times: jnp.ndarray, ts_bias: jnp.ndarray):
        corrected = cam_times + ts_bias
        pre = parse_detections_pre(det, bank, corrected, cfg)
        if cfg.estimate_ts_bias:
            ts_bias2 = estimate_ts_bias(pre, state, ts_bias, kfp, cfg)
        else:
            ts_bias2 = ts_bias
        parsed = space_nms_parsed(pre, cfg)
        t_ref = jnp.mean(cam_times)
        state, _, _ = associate_and_update(state, parsed, t_ref, kfp, cfg)
        state = lifecycle(state, t_ref, kfp, cfg)
        snap = snapshot(state, t_ref, kfp, cfg)
        return state, snap, ts_bias2

    return step
