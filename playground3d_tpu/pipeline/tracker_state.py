"""On-device tracker state and the fused per-frame update kernels.

The reference tracker bounces between GPU (detector) and CPU (parse, KF,
Hungarian, bookkeeping) every frame (SURVEY.md section 3.1). Here the ENTIRE
tracker lives on device as fixed-capacity arrays — Kalman slots, track ids,
frames-since-last-detection counters, class votes, per-slot timestamps — and
one jitted function advances it per frame batch. The host only stages frames
and drains output snapshots.

Time is float32 *offsets from a host-held epoch* (UNIX absolute times exceed
f32; offsets within a sequence don't).

Components (reference parity noted per function):
  * :func:`parse_detections`  — confidence cutoff, per-camera image NMS,
    im->state with EB/WB dispatch, two-pass height refinement, cross-camera
    space NMS (MC3D_crop_tracker.py:319-383)
  * :func:`associate_and_update` — continuous-time match/update/birth
    (MC3D_crop_tracker.py:1099-1137 + manage_tracks:385-461)
  * :func:`lifecycle` — death by fsld, anomaly and overlap pruning
    (MC3D_crop_tracker.py:463-556)
  * :func:`snapshot` — roll all tracks to a common clock time for output
    (MC3D_crop_tracker.py:1266-1282)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from playground3d_tpu.geometry import transforms as T
from playground3d_tpu.models.retinanet import Detections
from playground3d_tpu.ops.assignment import assign_auction
from playground3d_tpu.ops.iou import pairwise_iou
from playground3d_tpu.ops.nms import batched_nms, nms
from playground3d_tpu.pipeline.camera_bank import (
    CameraBank,
    im_to_state_refined,
)
from playground3d_tpu.track.kf import (
    KFParams,
    KFSlots,
    init_slots,
    kf_add,
    kf_predict,
    kf_update,
    kf_view,
)
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.utils.constants import CLASS_HEIGHTS, NUM_CLASSES


class TrackState(NamedTuple):
    kf: KFSlots
    ids: jnp.ndarray  # [N] int32, -1 = free
    fsld: jnp.ndarray  # [N] int32 frames since last detected
    # failed update ATTEMPTS since the last good measurement. Distinct from
    # fsld under a crop budget (cfg.crop_slots < live tracks): a slot the
    # budget skipped was never attempted, so it must not advance toward the
    # f_max death rule — only fsld (true staleness, which drives the
    # stale-first rotation and the ghost re-id window) grows. With no budget
    # pressure the two counters are identical, matching the reference's
    # single fsld (MC3D_crop_tracker.py:463-477 death, :1240-1252 growth).
    misses: jnp.ndarray  # [N] int32
    age: jnp.ndarray  # [N] int32 frames alive
    cls_votes: jnp.ndarray  # [N, NUM_CLASSES] float32
    conf_sum: jnp.ndarray  # [N] float32
    conf_cnt: jnp.ndarray  # [N] float32
    t_off: jnp.ndarray  # [N] float32: last KF roll time (epoch offset, s)
    next_id: jnp.ndarray  # [] int32


class ParsedDetections(NamedTuple):
    state: jnp.ndarray  # [K,6] x,y,l,w,h,dir
    scores: jnp.ndarray  # [K]
    classes: jnp.ndarray  # [K] int32
    cam_idx: jnp.ndarray  # [K] int32
    times: jnp.ndarray  # [K] float32 epoch offsets
    mask: jnp.ndarray  # [K] bool


class Snapshot(NamedTuple):
    states7: jnp.ndarray  # [N,7] x,y,l,w,h,dir,v at snapshot time
    ids: jnp.ndarray  # [N]
    classes: jnp.ndarray  # [N] dominant class votes
    mask: jnp.ndarray  # [N] valid AND past burn-in (age > f_init)
    raw_mask: jnp.ndarray  # [N] valid
    t: jnp.ndarray  # [] snapshot time offset


def init_track_state(capacity: int) -> TrackState:
    return TrackState(
        kf=init_slots(capacity),
        ids=jnp.full((capacity,), -1, jnp.int32),
        fsld=jnp.zeros((capacity,), jnp.int32),
        misses=jnp.zeros((capacity,), jnp.int32),
        age=jnp.zeros((capacity,), jnp.int32),
        cls_votes=jnp.zeros((capacity, NUM_CLASSES), jnp.float32),
        conf_sum=jnp.zeros((capacity,), jnp.float32),
        conf_cnt=jnp.zeros((capacity,), jnp.float32),
        t_off=jnp.zeros((capacity,), jnp.float32),
        next_id=jnp.asarray(0, jnp.int32),
    )


def _state6(kf: KFSlots) -> jnp.ndarray:
    """KF state [N,6] (x,y,l,w,h,v) -> geometric state [N,6] with direction."""
    return jnp.concatenate([kf.x[:, :5], kf.d[:, None]], axis=1)


def _footprints(state6: jnp.ndarray) -> jnp.ndarray:
    return T.space_footprint_xyxy(T.state_to_space(state6))


# ---------------------------------------------------------------------------
# detection parsing
# ---------------------------------------------------------------------------


def parse_detections_pre(
    det: Detections,
    bank: CameraBank,
    cam_times: jnp.ndarray,  # [C] per-camera frame times (epoch offsets)
    cfg: TrackerConfig,
) -> ParsedDetections:
    """Parsing stages BEFORE cross-camera fusion: confidence cutoff,
    per-camera image NMS, im->state with EB/WB dispatch, two-pass height
    refinement (MC3D_crop_tracker.py:334-370). The result still contains
    duplicate observations of the same vehicle from overlapping cameras —
    exactly what the clock-bias estimator needs."""
    K = det.scores.shape[0]
    keep = det.mask & (det.scores > cfg.sigma_d)

    corners = det.boxes[:, :16].reshape(K, 8, 2)
    hulls = T.im_hull_xyxy(corners)

    # drop detections whose box center falls in the camera's ignored region
    # (reference ignored_regions/*.csv, corrected_3D_dataset.py:53-63)
    if bank.ignore is not None:
        from playground3d_tpu.pipeline.camera_bank import ignore_hits

        centers = jnp.stack(
            [(hulls[:, 0] + hulls[:, 2]) / 2, (hulls[:, 1] + hulls[:, 3]) / 2], axis=1
        )
        keep = keep & ~ignore_hits(bank, centers, det.cam_idx)

    # image-space NMS within each camera (groups = camera index)
    idx1, mask1 = batched_nms(
        hulls, det.scores, det.cam_idx, keep, cfg.phi_nms_im, max_keep=K
    )
    corners = corners[idx1]
    scores = det.scores[idx1]
    classes = det.classes[idx1]
    cam_idx = det.cam_idx[idx1]

    heights = jnp.asarray(CLASS_HEIGHTS)[classes]
    # two-pass height refine folded into one projection (see
    # camera_bank.im_to_state_refined — bitwise-equal to the two-pass form)
    state = im_to_state_refined(bank, corners, cam_idx, heights)

    return ParsedDetections(
        state=state,
        scores=scores,
        classes=classes,
        cam_idx=cam_idx,
        times=cam_times[cam_idx],
        mask=mask1,
    )


def space_nms_parsed(parsed: ParsedDetections, cfg: TrackerConfig) -> ParsedDetections:
    """Cross-camera roadway-plane NMS: duplicate observations of one vehicle
    from overlapping cameras collapse to the highest-scoring one
    (MC3D_crop_tracker.py:376-381)."""
    K = parsed.mask.shape[0]
    fp = _footprints(parsed.state)
    idx2, mask2 = nms(fp, parsed.scores, parsed.mask, cfg.phi_nms_space, max_keep=K)
    return ParsedDetections(
        state=parsed.state[idx2],
        scores=parsed.scores[idx2],
        classes=parsed.classes[idx2],
        cam_idx=parsed.cam_idx[idx2],
        times=parsed.times[idx2],
        mask=mask2,
    )


def parse_detections(
    det: Detections,
    bank: CameraBank,
    cam_times: jnp.ndarray,
    cfg: TrackerConfig,
) -> ParsedDetections:
    """Full reference parse pipeline (MC3D_crop_tracker.py:319-383)."""
    return space_nms_parsed(parse_detections_pre(det, bank, cam_times, cfg), cfg)


# ---------------------------------------------------------------------------
# association + measurement update + births
# ---------------------------------------------------------------------------


def associate_and_update(
    state: TrackState,
    parsed: ParsedDetections,
    t_ref: jnp.ndarray,  # [] matching reference time (mean frame time)
    kfp: KFParams,
    cfg: TrackerConfig,
) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Match detections to tracks on roadway IoU, roll matched tracks to
    their detection times, update, and start new tracks in free slots.

    Returns (new_state, col_of_row [N], matched_col_mask [K]).
    """
    N = state.ids.shape[0]
    K = parsed.mask.shape[0]

    # a-priori track boxes at the common reference time
    dt_view = jnp.where(state.kf.mask, t_ref - state.t_off, 0.0)
    pre_x = kf_view(state.kf, dt_view, kfp)
    pre6 = jnp.concatenate([pre_x[:, :5], state.kf.d[:, None]], axis=1)
    track_fp = _footprints(pre6)
    det_fp = _footprints(parsed.state)

    iou = pairwise_iou(track_fp, det_fp)  # [N,K]
    iou = jnp.where(state.kf.mask[:, None] & parsed.mask[None, :], iou, 0.0)

    # Pre-gate rows/cols whose best IoU is below phi_match. This is an
    # INTENTIONAL approximation, not an exact equivalence: a below-gate row
    # can hold a column in the global optimum and evicting it can reroute
    # another row's match (e.g. iou(r,c)=.45, iou(r',c)=.6, iou(r',c2)=.55,
    # gate .5: unmasked optimum pairs r'->c2, masked pairs r'->c), changing
    # which matches survive and which tracks are born. We keep it because a
    # below-gate row's own assignment is always discarded, forcing gated
    # rows toward their best-IoU columns is at worst neutral for tracking
    # (e2e quality was A/B'd), and leaving them in makes the auction churn
    # through dummy bid wars (measured 15.8 ms worst-case on a sparse
    # 48x64 benefit).
    row_hope = jnp.max(iou, axis=1) >= cfg.phi_match
    col_hope = jnp.max(iou, axis=0) >= cfg.phi_match
    col_of_row = assign_auction(iou, state.kf.mask & row_hope, parsed.mask & col_hope)
    col_safe = jnp.clip(col_of_row, 0, K - 1)
    match_iou = iou[jnp.arange(N), col_safe]
    matched_row = (col_of_row >= 0) & (match_iou >= cfg.phi_match)
    col_of_row = jnp.where(matched_row, col_of_row, -1)
    col_safe = jnp.clip(col_of_row, 0, K - 1)

    # roll matched tracks to their detection's timestamp, then update
    det_time_row = parsed.times[col_safe]
    dt_pred = jnp.where(matched_row, det_time_row - state.t_off, 0.0)
    kf1 = kf_predict(state.kf, dt_pred, kfp)
    z = parsed.state[col_safe][:, :5]
    kf2 = kf_update(kf1, z, matched_row, kfp, measurement_idx=1)

    t_off = jnp.where(matched_row, det_time_row, state.t_off)
    fsld_grow = state.kf.mask
    if cfg.ghost_frames > 0:
        # ghost slots (dead, id retained) keep counting frames so their
        # re-id window expires on a true frame clock
        fsld_grow = fsld_grow | ((~state.kf.mask) & (state.ids >= 0))
    fsld = jnp.where(matched_row, 0, state.fsld + fsld_grow.astype(jnp.int32))
    # full-frame detection attempts every live track, so misses tracks fsld
    # exactly here (ghost slots are already dead; misses is a death counter)
    misses = jnp.where(matched_row, 0, state.misses + state.kf.mask.astype(jnp.int32))
    det_cls_row = parsed.classes[col_safe]
    votes = state.cls_votes + (
        matched_row[:, None] * jax.nn.one_hot(det_cls_row, NUM_CLASSES)
    )
    conf_sum = state.conf_sum + jnp.where(matched_row, parsed.scores[col_safe], 0.0)
    conf_cnt = state.conf_cnt + matched_row.astype(jnp.float32)

    # ---- births ------------------------------------------------------------
    matched_col = jnp.zeros((K,), bool).at[col_safe].max(matched_row)

    if cfg.ghost_frames > 0:
        # ghost re-identification (extension, see TrackerConfig.ghost_frames):
        # an unmatched detection within ghost_r_ft of a dead-but-remembered
        # track's constant-velocity prediction (same direction) is reborn in
        # that slot with the old id. One det per ghost, nearest wins.
        ghost = (~state.kf.mask) & (state.ids >= 0)
        gdt = jnp.where(ghost, t_ref - state.t_off, 0.0)
        # kf_view zeroes dt on dead slots; ghosts must roll, so view with a
        # mask that temporarily includes them
        gx = kf_view(state.kf._replace(mask=state.kf.mask | ghost), gdt, kfp)
        dist = jnp.hypot(
            gx[:, 0:1] - parsed.state[None, :, 0],
            gx[:, 1:2] - parsed.state[None, :, 1],
        )
        same_dir = (state.kf.d[:, None] * parsed.state[None, :, 5]) > 0
        free_det = parsed.mask & ~matched_col
        cand = ghost[:, None] & free_det[None, :] & same_dir & (dist < cfg.ghost_r_ft)
        BIG = jnp.float32(1e9)
        # tiny slot-index epsilon makes the det-conflict tie-break unique
        cost = jnp.where(cand, dist, BIG) + jnp.arange(N)[:, None] * 1e-6
        det_pick = jnp.argmin(cost, axis=1)  # [N]
        det_cost = jnp.min(cost, axis=1)
        ok = det_cost < BIG
        best_for_det = (
            jnp.full((K,), BIG, jnp.float32)
            .at[det_pick]
            .min(jnp.where(ok, det_cost, BIG))
        )
        reb = ok & (det_cost <= best_for_det[det_pick])
        det_r = jnp.clip(det_pick, 0, K - 1)
        reb_det6 = parsed.state[det_r]
        # keep the ghost's own velocity: re-id asserts it is the same
        # vehicle, and the coasted velocity beats the class prior
        reb_x = jnp.concatenate([reb_det6[:, :5], state.kf.x[:, 5:6]], axis=1)
        kf2 = kf_add(kf2, reb_x, reb_det6[:, 5], reb, kfp, class_ids=parsed.classes[det_r])
        t_off = jnp.where(reb, parsed.times[det_r], t_off)
        fsld = jnp.where(reb, 0, fsld)
        misses = jnp.where(reb, 0, misses)
        votes = votes + jnp.where(
            reb[:, None], jax.nn.one_hot(parsed.classes[det_r], NUM_CLASSES), 0.0
        )
        conf_sum = conf_sum + jnp.where(reb, parsed.scores[det_r], 0.0)
        conf_cnt = conf_cnt + reb.astype(jnp.float32)
        matched_col = matched_col.at[det_r].max(reb)

    unmatched = parsed.mask & ~matched_col

    free = ~kf2.mask
    if cfg.ghost_frames > 0:
        # recycle never-used / expired slots before live ghosts
        rank = (~free).astype(jnp.int32) * 2 + (free & (state.ids >= 0)).astype(
            jnp.int32
        )
        free_order = jnp.argsort(rank)
    else:
        free_order = jnp.argsort(~free)  # free slots first, ascending index
    det_rank = jnp.cumsum(unmatched) - 1  # rank of each unmatched det
    n_free = jnp.sum(free)
    can_place = unmatched & (det_rank < n_free)
    slot_for_det = free_order[jnp.clip(det_rank, 0, N - 1)]  # [K]

    add_mask = jnp.zeros((N,), bool).at[slot_for_det].max(can_place)
    # per-slot gather of its new detection (scatter det index)
    det_for_slot = (
        jnp.zeros((N,), jnp.int32)
        .at[slot_for_det]
        .max(jnp.where(can_place, jnp.arange(K, dtype=jnp.int32), 0))
    )
    new_det = parsed.state[det_for_slot]  # [N,6]
    new_x = jnp.concatenate(
        [new_det[:, :5], jnp.full((N, 1), kfp.mu_v, jnp.float32)], axis=1
    )
    new_d = new_det[:, 5]
    new_cls = parsed.classes[det_for_slot]

    kf3 = kf_add(kf2, new_x, new_d, add_mask, kfp, class_ids=new_cls)

    ids = jnp.where(
        add_mask,
        state.next_id + (jnp.cumsum(add_mask) - 1).astype(jnp.int32),
        state.ids,
    )
    next_id = state.next_id + jnp.sum(add_mask).astype(jnp.int32)
    fsld = jnp.where(add_mask, 0, fsld)
    misses = jnp.where(add_mask, 0, misses)
    age = jnp.where(add_mask, 0, state.age)
    votes = jnp.where(
        add_mask[:, None], jax.nn.one_hot(new_cls, NUM_CLASSES), votes
    )
    conf_sum = jnp.where(add_mask, parsed.scores[det_for_slot], conf_sum)
    conf_cnt = jnp.where(add_mask, 1.0, conf_cnt)
    t_off = jnp.where(add_mask, parsed.times[det_for_slot], t_off)

    keep_id = kf3.mask
    if cfg.ghost_frames > 0:
        # unexpired ghosts keep their ids through the dead period
        keep_id = keep_id | (
            (~kf3.mask)
            & (state.ids >= 0)
            & (fsld < cfg.f_max + cfg.ghost_frames)
        )
    new_state = TrackState(
        kf=kf3,
        ids=jnp.where(keep_id, ids, -1),
        fsld=fsld,
        misses=misses,
        age=age + kf3.mask.astype(jnp.int32),
        cls_votes=votes,
        conf_sum=conf_sum,
        conf_cnt=conf_cnt,
        t_off=t_off,
        next_id=next_id,
    )
    return new_state, col_of_row, matched_col


# ---------------------------------------------------------------------------
# lifecycle: deaths, anomalies, overlaps
# ---------------------------------------------------------------------------


def lifecycle(
    state: TrackState, t_ref: jnp.ndarray, kfp: KFParams, cfg: TrackerConfig
) -> TrackState:
    """Prune tracks: fsld death (MC3D:463-477), anomaly bounds (MC3D:520-556),
    and overlap NMS with age-as-score (MC3D:482-518)."""
    live = state.kf.mask

    # detection-gap death: f_max failed ATTEMPTS (MC3D:463-477). Counting
    # attempts rather than frames means a track the crop budget skipped
    # (crop_slots < live) is never killed for starvation it did not cause;
    # with no budget pressure misses == fsld and this is the reference rule.
    die_fsld = live & (state.misses >= cfg.f_max)
    die = die_fsld
    if cfg.tentative_age > 0:
        # tentative-kill (see TrackerConfig.tentative_age): one failed
        # attempt while age <= tentative_age is fatal. Not part of
        # die_fsld on purpose — a tentative death is for-cause (the
        # track was never confirmed) and must not leave a re-id ghost.
        die = die | (
            live & (state.age <= cfg.tentative_age) & (state.misses >= 1)
        )

    # anomalies, evaluated on states rolled to t_ref
    dt = jnp.where(live, t_ref - state.t_off, 0.0)
    x = kf_view(state.kf, dt, kfp)
    y, l, w, h, v = x[:, 1], x[:, 2], x[:, 3], x[:, 4], x[:, 5]
    max_l, max_w, max_h = cfg.max_size
    bad = (
        (y > cfg.y_range[1]) | (y < cfg.y_range[0])
        | (l > max_l) | (l < 0) | (w > max_w) | (w < 0) | (h > max_h) | (h < 0)
        | (v > cfg.v_max) | (v < -cfg.v_max)
        | (x[:, 0] < cfg.x_range[0]) | (x[:, 0] > cfg.x_range[1])
    )
    die = die | (live & bad)

    # overlap pruning: keep older track when footprints overlap > phi_over
    state6 = jnp.concatenate([x[:, :5], state.kf.d[:, None]], axis=1)
    fp = _footprints(state6)
    alive = live & ~die
    keep_idx, keep_mask = nms(
        fp, state.age.astype(jnp.float32), alive, cfg.phi_over, max_keep=fp.shape[0]
    )
    kept = jnp.zeros_like(alive).at[keep_idx].max(keep_mask)
    die = die | (alive & ~kept)

    if cfg.merge_dist_ft > 0:
        # duplicate merge (extension): same-direction tracks whose centers
        # sit within merge_dist_ft along x (half that in y) are one vehicle
        # seen by two cameras — greedily keep the older. Expressed as
        # age-scored NMS over synthetic center boxes (overlap iff within the
        # merge radius; direction as the group): reusing the chain-safe
        # fixed-point NMS avoids one-shot suppression killing a track whose
        # only beater itself dies in the same pass (A-B-C chains).
        alive = live & ~die
        half_x = cfg.merge_dist_ft / 2.0
        half_y = cfg.merge_dist_ft / 4.0
        merge_boxes = jnp.stack(
            [x[:, 0] - half_x, x[:, 1] - half_y, x[:, 0] + half_x, x[:, 1] + half_y],
            axis=1,
        )
        groups = (state.kf.d > 0).astype(jnp.int32)
        m_idx, m_mask = batched_nms(
            merge_boxes, state.age.astype(jnp.float32), groups, alive,
            iou_threshold=1e-6, max_keep=merge_boxes.shape[0],
        )
        m_kept = jnp.zeros_like(alive).at[m_idx].max(m_mask)
        die = die | (alive & ~m_kept)

    new_mask = live & ~die
    keep_id = new_mask
    fsld = state.fsld
    if cfg.ghost_frames > 0:
        # fsld deaths (a detection gap) leave a re-id ghost: id and last
        # state persist in the dead slot. For-cause deaths (anomaly /
        # overlap / merge) clear fully — their state is not trustworthy.
        ghost_new = die_fsld & ~(live & bad)
        ghost_old = (~live) & (state.ids >= 0) & (
            state.fsld < cfg.f_max + cfg.ghost_frames
        )
        keep_id = keep_id | ghost_new | ghost_old
        # under budget pressure a track can die with fsld >> f_max (frames
        # skipped, attempts missed); pin new ghosts to f_max so the re-id
        # window is always exactly ghost_frames frames from death
        fsld = jnp.where(ghost_new, jnp.minimum(fsld, cfg.f_max), fsld)
    return state._replace(
        kf=state.kf._replace(mask=new_mask),
        ids=jnp.where(keep_id, state.ids, -1),
        fsld=fsld,
    )


def snapshot(
    state: TrackState, t_out: jnp.ndarray, kfp: KFParams, cfg: TrackerConfig
) -> Snapshot:
    """Roll every live track to a common clock time for output
    (MC3D_crop_tracker.py:1266-1282)."""
    live = state.kf.mask
    dt = jnp.where(live, t_out - state.t_off, 0.0)
    x = kf_view(state.kf, dt, kfp)
    states7 = jnp.concatenate(
        [x[:, :5], state.kf.d[:, None], x[:, 5:6]], axis=1
    )
    return Snapshot(
        states7=states7,
        ids=state.ids,
        classes=jnp.argmax(state.cls_votes, axis=1).astype(jnp.int32),
        mask=live & (state.age > cfg.f_init),
        raw_mask=live,
        t=t_out,
    )
