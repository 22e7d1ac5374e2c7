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
from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d, max_crop_span_s2d
from playground3d_tpu.ops.roi_align import crop_and_resize
from playground3d_tpu.pipeline.camera_bank import (
    CameraBank,
    bank_from_registry,
    im_to_state_refined,
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
from playground3d_tpu.utils.constants import (
    CLASS_HEIGHTS,
    CLASS_NAMES,
    IMAGENET_MEAN,
    IMAGENET_STD,
    NUM_CLASSES,
)
from playground3d_tpu.utils.profiling import StageTimers


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("hw",))
def yuv420_flat_to_s2d(buf: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """[T,C,H*W*3//2] uint8 planar YUV420 -> [T,C,H/4,W/4,48] uint8 s2d RGB,
    ON DEVICE. BT.601 limited range, same float math as the host y4m decoder
    (data/video.py _rgb_from_planes) within +-1 LSB.

    Hosts ship 1.5 B/px instead of the 3 B/px s2d layout — half the
    host->device bytes — and the conversion is pointwise VPU work the
    compiler fuses; on link-constrained paths (PCIe contention, or the
    tunneled dev box at ~30 MB/s) this doubles the feedable frame rate."""
    h, w = hw
    t, c, L = buf.shape
    n = t * c
    flat = buf.reshape(n, L)
    ysz, csz = h * w, (h * w) // 4
    Y = flat[:, :ysz].reshape(n, h, w).astype(jnp.float32)
    U = flat[:, ysz : ysz + csz].reshape(n, h // 2, w // 2).astype(jnp.float32)
    V = flat[:, ysz + csz :].reshape(n, h // 2, w // 2).astype(jnp.float32)
    y = (Y - 16.0) * (255.0 / 219.0)
    u = jnp.repeat(jnp.repeat((U - 128.0) * (255.0 / 224.0), 2, 1), 2, 2)
    v = jnp.repeat(jnp.repeat((V - 128.0) * (255.0 / 224.0), 2, 1), 2, 2)
    rgb = jnp.stack(
        [y + 1.402 * v, y - 0.344136 * u - 0.714136 * v, y + 1.772 * u], -1
    )
    rgb = jnp.clip(rgb + 0.5, 0.0, 255.0).astype(jnp.uint8)
    from playground3d_tpu.models.resnet import space_to_depth

    return space_to_depth(rgb).reshape(t, c, h // 4, w // 4, 48)


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


def select_crop_slots(
    live: jnp.ndarray, fsld: jnp.ndarray, age: jnp.ndarray, K: int
) -> jnp.ndarray:
    """Stale-first crop schedule: the K live slots that have gone longest
    without a detection (fsld), oldest-first on ties.

    The reference crops EVERY object every frame (MC3D_crop_tracker.py:
    1146-1254); under a fixed crop budget this is the fair schedule — every
    live slot is attempted at least once per ceil(live/K) frames, so young
    tracks are never starved by a full pool of elders (age-only priority
    starves them indefinitely). fsld*1024+age stays within f32's
    exact-integer range for fsld <= ~16k; death rides the misses counter
    (attempts, not frames), but the rotation itself bounds an unattempted
    streak to ~ceil(live/K) frames, so fsld at death is at most about
    f_max * ceil(capacity/K) — e.g. 5 * 16 = 80 at a 256-pool/16-slot
    worst case, far inside the 16k exactness bound."""
    pri = jnp.where(
        live,
        fsld.astype(jnp.float32) * 1024.0
        + jnp.minimum(age, 1023).astype(jnp.float32),
        -1.0,
    )
    _, sel = jax.lax.top_k(pri, K)
    return sel.astype(jnp.int32)


def make_crop_step(
    crop_params,
    depth: int,
    bank: CameraBank,
    centers: jnp.ndarray,  # [C,2] camera view centers in roadway coords
    kfp: KFParams,
    cfg: TrackerConfig,
    stem: str = "conv7",
    frame_stem: str = "conv7",
):
    """Jitted (state, frames, cam_times, ts_bias) -> (state', snapshot).

    ``frames`` is [C,H,W,3] when ``frame_stem=="conv7"`` or s2d-packed
    [C,H/4,W/4,48] (uint8 or float) when ``frame_stem=="s2d"`` — the s2d
    path crops with the MXU separable-matmul kernel
    (:func:`playground3d_tpu.ops.crop_mxu.crop_and_resize_s2d`).

    For each of the ``cfg.crop_slots`` highest-priority live slots (all
    slots when 0): pick nearest camera, roll to that camera's clock,
    project, crop, re-detect, pick the best candidate box by
    (1-W)*IoU + W*conf, and Kalman-update.
    """
    cs = cfg.cs

    @jax.jit
    def step(state: TrackState, frames: jnp.ndarray, cam_times: jnp.ndarray, ts_bias: jnp.ndarray):
        N = state.ids.shape[0]
        live = state.kf.mask
        K = cfg.crop_slots if (cfg.crop_slots and cfg.crop_slots < N) else N

        pre = kf_view(state.kf, jnp.where(live, jnp.mean(cam_times) - state.t_off, 0.0), kfp)
        if K < N:
            sel = select_crop_slots(live, state.fsld, state.age, K)
        else:
            sel = jnp.arange(N, dtype=jnp.int32)
        live_k = live[sel]

        # nearest camera per selected object (MC3D:1156-1164)
        pre_k = pre[sel]
        d2 = (pre_k[:, 0:1] - centers[None, :, 0]) ** 2 + (pre_k[:, 1:2] - centers[None, :, 1]) ** 2
        cam_k = jnp.argmin(d2, axis=1).astype(jnp.int32)  # [K]

        # roll each selected object to its camera's (bias-corrected) clock
        # (MC3D:1169-1172); unselected slots keep dt=0 (identity predict)
        obj_t = cam_times[cam_k] + ts_bias[cam_k]
        dt_k = jnp.where(live_k, obj_t - state.t_off[sel], 0.0)
        dt = jnp.zeros((N,), jnp.float32).at[sel].set(dt_k)
        kf1 = kf_predict(state.kf, dt, kfp)
        t_off = state.t_off.at[sel].set(jnp.where(live_k, obj_t, state.t_off[sel]))

        state6_k = jnp.concatenate([kf1.x[sel, :5], kf1.d[sel, None]], axis=1)
        im_objs = state_to_im_banked(bank, state6_k, cam_k)  # [K,8,2]

        # square crop boxes, expanded (MC3D get_crop_boxes:920-945)
        hull = T.im_hull_xyxy(im_objs)
        w = hull[:, 2] - hull[:, 0]
        h = hull[:, 3] - hull[:, 1]
        scale = jnp.maximum(w, h) * cfg.crop_expand
        if frame_stem == "s2d":
            # the MXU crop kernel cannot represent boxes beyond the coarsest
            # pyramid window (992 px at defaults) — samples past it would be
            # silently black. Clamp BEFORE building crop_boxes so the
            # local->global mapping below stays consistent with the pixels
            # actually cropped; a huge near-field vehicle loses a sliver of
            # context, not crop integrity.
            scale = jnp.minimum(scale, max_crop_span_s2d())
        cx = (hull[:, 0] + hull[:, 2]) / 2
        cy = (hull[:, 1] + hull[:, 3]) / 2
        crop_boxes = jnp.stack(
            [cx - scale / 2, cy - scale / 2, cx + scale / 2, cy + scale / 2], axis=1
        )

        if frame_stem == "s2d":
            crops = crop_and_resize_s2d(
                frames, crop_boxes, cam_k, out_size=cs,
                layout="s2d" if stem == "s2d" else "hwc",
                normalize=frames.dtype == jnp.uint8,
            )
        else:
            # uint8 frame transport: the gather crop interpolates to float
            # 0-255, which normalize_on_device inside the crop net would
            # pass through untouched (it only rescales uint8 inputs) — so
            # normalize here, mirroring the s2d branch's normalize= flag
            was_u8 = frames.dtype == jnp.uint8
            crops = crop_and_resize(
                frames.astype(jnp.float32) if was_u8 else frames,
                crop_boxes, cam_k, out_size=cs,
            )
            if was_u8:
                mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
                std = jnp.asarray(IMAGENET_STD, jnp.float32)
                crops = (crops / 255.0 - mean) / std

        # crop detector (LOCALIZE path)
        reg_boxes, cls = localize(crop_params, crops, depth=depth, stem=stem)
        confs = jnp.max(cls, axis=2)
        classes = jnp.argmax(cls, axis=2).astype(jnp.int32)

        # top cd_max candidates per object (MC3D:1210-1215)
        top_conf, top_idx = jax.lax.top_k(confs, cfg.cd_max)  # [K,cd]
        rows = jnp.arange(K)[:, None]
        cand = reg_boxes[rows, top_idx]  # [K,cd,20]
        cand_cls = classes[rows, top_idx]

        # local crop coords -> global frame coords (MC3D local_to_global:948-971)
        corners = cand[:, :, :16].reshape(K, cfg.cd_max, 8, 2)
        corners = corners * (scale / cs)[:, None, None, None]
        corners = corners + crop_boxes[:, None, None, 0:2]

        # im -> state with per-candidate camera + height refine (MC3D:1217-1227)
        flat = corners.reshape(K * cfg.cd_max, 8, 2)
        flat_cam = jnp.repeat(cam_k, cfg.cd_max)
        heights = jnp.asarray(CLASS_HEIGHTS)[cand_cls.reshape(-1)]
        cand_state = im_to_state_refined(bank, flat, flat_cam, heights)
        cand_state = cand_state.reshape(K, cfg.cd_max, 6)

        # best box per object: (1-W)*IoU(footprint, a-priori) + W*conf
        # (MC3D select_best_box:974-1028)
        apri_fp = T.space_footprint_xyxy(T.state_to_space(state6_k))  # [K,4]
        cand_fp = T.space_footprint_xyxy(
            T.state_to_space(cand_state.reshape(K * cfg.cd_max, 6))
        ).reshape(K, cfg.cd_max, 4)
        ious = elementwise_iou(cand_fp, apri_fp[:, None, :])
        score = (1 - cfg.w_conf) * ious + cfg.w_conf * top_conf
        best = jnp.argmax(score, axis=1)
        rowsK = jnp.arange(K)
        best_state = cand_state[rowsK, best]  # [K,6]
        best_conf = top_conf[rowsK, best]
        best_cls = cand_cls[rowsK, best]

        # measurement update with crop measurement model (R2) (MC3D:1235),
        # scattered back to the full pool. The reference updates every
        # attempted track regardless of confidence; crop_conf_gate skips
        # sub-sigma_c measurements so occluded tracks coast on the filter
        # prediction instead of being dragged toward noise boxes.
        meas = jnp.zeros((N, 5), jnp.float32).at[sel].set(
            best_state[:, :5].astype(jnp.float32)
        )
        upd = jnp.zeros((N,), bool).at[sel].set(live_k)
        good = jnp.zeros((N,), bool).at[sel].set(live_k & (best_conf >= cfg.sigma_c))
        kf_upd = (upd & good) if cfg.crop_conf_gate else upd
        kf2 = kf_update(kf1, meas, kf_upd, kfp, measurement_idx=2)

        if cfg.size_nudge:
            # class-size nudge (KF measurement model 3): measure each live
            # track's voted-class mean (l,w,h) with covariance R3, pulling
            # dimensions toward the class prior. This counters the size
            # drift that accumulates over long crop-only stretches (large
            # det_step) — the reference ships the machinery as
            # tweak_sizes (minimal_3D_track.py:626-640, kf.py:350-361).
            voted = jnp.argmax(state.cls_votes, axis=1)
            z_size = kfp.class_size[voted]  # [N,3]
            # under crop_conf_gate a sub-sigma_c frame coasts on the
            # prediction — the size nudge must coast too, or sizes get
            # pulled toward the class mean while position does not
            kf2 = kf_update(kf2, z_size, kf_upd, kfp, measurement_idx=3)

        # fsld/class bookkeeping (MC3D:1240-1252). Every live slot that did
        # not land a good measurement this frame accumulates staleness —
        # including live slots the crop budget skipped (they were not
        # detected this frame, and the stale-first schedule above needs the
        # signal to rotate them in; with attempt-only increments a skipped
        # slot could coast forever below the f_max death rule).
        # Ghost slots do NOT age here: re-identification can only fire on
        # full-frame detect frames (associate_and_update), so the ghost
        # window must expire in re-id OPPORTUNITIES — aging it on crop
        # frames would let a window shorter than det_step expire with zero
        # chances to re-id (d>=6 regimes made the flag silently inert).
        fsld = jnp.where(good, 0, state.fsld + (live & ~good).astype(jnp.int32))
        # the f_max death counter only advances on ATTEMPTED slots (upd):
        # a slot the crop budget skipped was never given the chance to be
        # re-detected, so it coasts without moving toward death, while its
        # growing fsld pushes it up the stale-first schedule
        misses = jnp.where(good, 0, state.misses + (upd & ~good).astype(jnp.int32))
        # only CONFIDENT crop measurements vote for the class: during a long
        # occlusion the best candidate is a sub-sigma_c noise box whose
        # argmax class would otherwise swamp the real votes and (with
        # size_nudge) drag the coasting track's dimensions toward the wrong
        # class prior
        good_k = live_k & (best_conf >= cfg.sigma_c)
        votes = state.cls_votes.at[sel].add(
            jnp.where(good_k[:, None], jax.nn.one_hot(best_cls, NUM_CLASSES), 0.0)
        )
        conf_sum = state.conf_sum.at[sel].add(jnp.where(live_k, best_conf, 0.0))
        conf_cnt = state.conf_cnt.at[sel].add(live_k.astype(jnp.float32))

        new_state = state._replace(
            kf=kf2,
            fsld=fsld,
            misses=misses,
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
            max_dets=cfg.max_dets, stem=stem, approx_topk=cfg.approx_topk,
            min_level=cfg.det_min_level,
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


def make_mc_clip_step(
    det_params,
    depth: int,
    bank: CameraBank,
    centers: jnp.ndarray,
    kfp: KFParams,
    cfg: TrackerConfig,
    crop_params=None,
    crop_depth: Optional[int] = None,
    stem: str = "s2d",
    crop_stem: str = "s2d",
    mesh=None,
    batch_detects: bool = False,
    unroll: bool = False,
):
    """Fused multi-camera clip tracker with detection cadence: ONE device
    call advances T frames, running the full-frame detect branch on frames
    where ``i % cfg.det_step == 0``, the crop re-detection branch on frames
    where ``i % cfg.skip_step == 0``, and a passthrough snapshot otherwise —
    the reference's ``track()`` cadence loop (MC3D_crop_tracker.py:1051-1254)
    as a single ``lax.scan`` with a 3-way ``lax.switch`` per step.

    With ``batch_detects=True`` (requires clip-aligned cadence: ``frame0``
    and the clip length both multiples of ``cfg.det_step``), the detector
    forwards + decode + top-k + NMS of ALL detect frames in the clip run as
    one batched pass BEFORE the scan — they depend only on pixels, never on
    tracker state, so hoisting them is numerically identical while giving
    the MXU a T/d-deep batch instead of T/d sequential single-frame calls.
    Only parse/association/KF (state-dependent) stay sequential.

    With a ``mesh``, the CAMERA axis of the frame stack is sharded over the
    mesh's 'data' axis (SURVEY §2c: the reference's per-GPU tracker placement
    becomes one camera pool shard per chip); detector forwards run sharded
    and XLA inserts the cross-device gathers at the fusion stage. Tracker
    state and parameters are replicated.

    Returns jitted (state, ts_bias, frames [T,C,...], cam_times [T,C],
    frame0 scalar) -> (state', ts_bias', snapshots stacked over T).
    """
    detect_step = make_mc_detect_step(det_params, depth, bank, kfp, cfg, stem=stem)
    parsed_step = make_mc_detect_step_from_detections(bank, kfp, cfg)
    if crop_params is not None:
        crop_step = make_crop_step(
            crop_params, crop_depth if crop_depth is not None else depth,
            bank, centers, kfp, cfg, stem=crop_stem, frame_stem=stem,
        )
    else:
        crop_step = None
    d, s = cfg.det_step, cfg.skip_step

    if unroll and mesh is not None:
        raise ValueError(
            "make_mc_clip_step: unroll=True is not supported together with a "
            "mesh (the sharded program is built from the scan+switch variant); "
            "pass unroll=False, or shard the unrolled clip yourself."
        )

    def _check_aligned(frame0, need_s: bool):
        # batch_detects pairs hoisted detections by clip-local index (li//d)
        # and the unrolled clip branches on clip-local i, so both are only
        # correct when the clip starts on a detect boundary (and, for the
        # unrolled crop branch, on a skip boundary). frame0 is concrete on
        # the host here — fail loudly instead of silently mis-cadencing.
        f0 = int(frame0)
        if f0 % d != 0:
            raise ValueError(
                f"clip frame0={f0} must be a multiple of det_step={d} for the "
                "batch_detects/unroll clip variants (clip-local cadence)"
            )
        if need_s and f0 % s != 0:
            raise ValueError(
                f"clip frame0={f0} must be a multiple of skip_step={s} for the "
                "unrolled clip's crop cadence"
            )

    if unroll:
        # Straight-line variant: with a clip-aligned frame0 (frame0 % d == 0
        # — the same precondition batch_detects has) the branch taken at
        # each clip position is STATIC, so the scan+switch can be unrolled
        # into a single branch-free program. lax.switch puts a conditional
        # boundary around every frame, which blocks cross-frame fusion and
        # DMA/compute overlap (~0.4-0.5 ms/frame measured on both
        # branches); the unrolled form lets XLA schedule across frames.
        # Costs one bigger compile (cached on disk).

        @jax.jit
        def clip_unrolled(
            state: TrackState,
            ts_bias: jnp.ndarray,
            frames: jnp.ndarray,
            cam_times: jnp.ndarray,
            frame0: jnp.ndarray,  # accepted for API parity; must be % d == 0
        ):
            T_len = frames.shape[0]
            st, tb = state, ts_bias
            snaps = []
            for i in range(T_len):
                f, t = frames[i], cam_times[i]
                if i % d == 0:
                    st, snap, tb = detect_step(st, f, t, tb)
                elif crop_step is not None and i % s == 0:
                    st, snap = crop_step(st, f, t, tb)
                else:
                    snap = snapshot(st, jnp.mean(t), kfp, cfg)
                snaps.append(snap)
            snaps = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *snaps)
            return st, tb, snaps

        def run_unrolled(state, ts_bias, frames, cam_times, frame0):
            _check_aligned(frame0, need_s=crop_step is not None)
            return clip_unrolled(state, ts_bias, frames, cam_times, frame0)

        return run_unrolled

    @jax.jit
    def clip(
        state: TrackState,
        ts_bias: jnp.ndarray,
        frames: jnp.ndarray,  # [T,C,H,W,3] or s2d-packed [T,C,H/4,W/4,48]
        cam_times: jnp.ndarray,  # [T,C]
        frame0: jnp.ndarray,  # scalar int32: global index of frames[0]
    ):
        T_len = frames.shape[0]
        fidx = frame0 + jnp.arange(T_len, dtype=jnp.int32)

        if batch_detects:
            # one batched detector pass over the clip's detect frames
            dets = jax.vmap(
                lambda f: detect_multiframe(
                    det_params, f, depth=depth, pre_topk=cfg.pre_topk,
                    max_dets=cfg.max_dets, stem=stem, approx_topk=cfg.approx_topk,
                    min_level=cfg.det_min_level,
                )
            )(frames[::d])  # Detections stacked on a [ceil(T/d)] axis

            def b_detect(op):
                st, tb, f, t, j = op
                det_j = jax.tree_util.tree_map(lambda a: a[j], dets)
                st2, snap, tb2 = parsed_step(st, det_j, t, tb)
                return st2, tb2, snap
        else:

            def b_detect(op):
                st, tb, f, t, j = op
                st2, snap, tb2 = detect_step(st, f, t, tb)
                return st2, tb2, snap

        def b_crop(op):
            st, tb, f, t, j = op
            st2, snap = crop_step(st, f, t, tb)
            return st2, tb, snap

        def b_skip(op):
            st, tb, f, t, j = op
            return st, tb, snapshot(st, jnp.mean(t), kfp, cfg)

        branches = [b_detect, b_crop if crop_step is not None else b_skip, b_skip]
        li = jnp.arange(T_len, dtype=jnp.int32)  # clip-local index

        def body(carry, xt):
            st, tb = carry
            f, t, i, j = xt
            which = jnp.where(i % d == 0, 0, jnp.where(i % s == 0, 1, 2))
            st2, tb2, snap = jax.lax.switch(which, branches, (st, tb, f, t, j))
            return (st2, tb2), snap

        (state2, tb2), snaps = jax.lax.scan(
            body, (state, ts_bias), (frames, cam_times, fidx, li // d)
        )
        return state2, tb2, snaps

    if mesh is None:
        if not batch_detects:
            return clip

        def run_batched(state, ts_bias, frames, cam_times, frame0):
            _check_aligned(frame0, need_s=False)
            return clip(state, ts_bias, frames, cam_times, frame0)

        return run_batched

    from jax.sharding import NamedSharding, PartitionSpec as P

    cam_sh = NamedSharding(mesh, P(None, "data"))  # [T, C_sharded, ...]
    repl = NamedSharding(mesh, P())
    sharded = jax.jit(
        clip.__wrapped__ if hasattr(clip, "__wrapped__") else clip,
        in_shardings=(repl, repl, cam_sh, repl, repl),
        out_shardings=(repl, repl, repl),
    )

    def run(state, ts_bias, frames, cam_times, frame0):
        if batch_detects:
            _check_aligned(frame0, need_s=False)
        return sharded(
            state, ts_bias, frames, jnp.asarray(cam_times), jnp.asarray(frame0, jnp.int32)
        )

    return run


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
        crop_depth: Optional[int] = None,
        detect_fn: Optional[Callable] = None,
        centers: Optional[np.ndarray] = None,
        stem: str = "conv7",
        crop_stem: str = "conv7",
        ignore_polygons=None,
        image_hw: Tuple[int, int] = (1080, 1920),
        on_frame: Optional[Callable] = None,
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
        self.bank = bank_from_registry(
            registry, ignore_polygons=ignore_polygons, image_hw=image_hw
        )
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
        self.stem = stem
        self.crop_stem = crop_stem
        self.depth = depth
        self.crop_depth = crop_depth
        self._det_params = det_params
        self._crop_params = crop_params
        self._clip_cache = {}
        if crop_params is not None:
            self._crop_step = make_crop_step(
                crop_params, crop_depth if crop_depth is not None else depth,
                self.bank, self.centers, self.kfp, cfg,
                stem=crop_stem, frame_stem=stem,
            )
        else:
            self._crop_step = None
        # device-side s2d packing for raw [C,H,W,3] inputs on the s2d path
        from playground3d_tpu.models.resnet import space_to_depth

        self._pack = jax.jit(space_to_depth)
        # passthrough snapshot for per-frame process() on non-cadence frames
        # (clip-path b_skip equivalent)
        self._snapshot_step = jax.jit(
            lambda st, t: snapshot(st, t, self.kfp, self.cfg)
        )

        self.state = init_track_state(cfg.max_tracks)
        self.ts_bias = jnp.zeros((len(self.cameras),), jnp.float32)
        self.epoch: Optional[float] = None
        self.rows: List[tuple] = []
        self.ts_bias_log: List[np.ndarray] = []
        self.timers = StageTimers(["detect", "crop", "stage", "drain"])
        # opt-in live observability (reference overlay loop MC3D:733-917):
        # called (frame_num, frames [C,H,W,3], snap, ts_bias [C]) after each
        # per-frame step — see tools.visualize.TrackOverlayWriter
        self.on_frame = on_frame

    def process(self, frames: np.ndarray, times: Sequence[float], frame_num: int):
        """frames [C,H,W,3]; times: per-camera absolute times."""
        if self.epoch is None:
            self.epoch = float(min(times))
        cam_times = jnp.asarray(
            np.asarray([t - self.epoch for t in times], np.float32)
        )
        frames_j = jnp.asarray(frames)
        if self.stem == "s2d" and frames_j.shape[-1] == 3:
            frames_j = self._pack(frames_j)

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
            # passthrough: record a rolled-forward snapshot so the per-frame
            # driver emits one output row per frame, exactly like the clip
            # scan's b_skip branch — records()/CSV agree between the paths
            snap = self._snapshot_step(self.state, jnp.mean(cam_times))
            jax.block_until_ready(snap.states7)

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
        if self.on_frame is not None:
            self.on_frame(frame_num, frames, snap, np.asarray(self.ts_bias))
        return snap

    def _synced_frames(self, sources: List[Iterable], cutoff: int, sync_ms: float):
        """Yield (frames [C,H,W,3], times [C]) with time synchronization:
        cameras lagging the latest timestamp by >= sync_ms skip frames
        (MC3D time_sync_cameras:219-235)."""
        iters = [iter(s) for s in sources]
        try:
            cur = [next(it) for it in iters]
        except StopIteration:
            return
        for _ in range(cutoff):
            times = [c[1] for c in cur]
            latest = max(times)
            try:
                for i in range(len(iters)):
                    while latest - cur[i][1] >= sync_ms / 1000.0:
                        cur[i] = next(iters[i])
            except StopIteration:
                return
            yield np.stack([c[0] for c in cur]), [c[1] for c in cur]
            try:
                cur = [next(it) for it in iters]
            except StopIteration:
                return

    def track(
        self,
        sources: List[Iterable],
        cutoff: int = 10**9,
        sync_ms: float = 20.0,
        per_frame: bool = False,
        clip_len: int = 24,
        mesh=None,
        yuv_hw: Optional[Tuple[int, int]] = None,
    ):
        """Track all sources to exhaustion (reference ``MC_Crop_Tracker.track``,
        MC3D_crop_tracker.py:1051).

        Delegates to the fused clip-scan path (:meth:`track_clips`) — one
        device call per ``clip_len`` frames — whenever the detector params
        are available. Pass ``per_frame=True`` for the one-device-call-per-
        frame loop (needed when a host-side ``detect_fn`` drives detection,
        and useful for latency-sensitive streaming)."""
        if not per_frame and self.detect_fn is None and self._det_params is not None:
            return self.track_clips(
                sources, clip_len=clip_len, cutoff=cutoff, sync_ms=sync_ms,
                mesh=mesh, yuv_hw=yuv_hw,
            )
        start = time.time()
        n = 0
        for frame_num, (frames, times) in enumerate(
            self._synced_frames(sources, cutoff, sync_ms)
        ):
            self.process(frames, times, frame_num)
            n += 1
        wall = time.time() - start
        return {"frames": n, "fps": n / max(wall, 1e-9), **self.timers.totals()}

    def _clip_fn(self, mesh=None):
        key = id(mesh) if mesh is not None else None
        if key not in self._clip_cache:
            assert self._det_params is not None, "clip mode needs det_params"
            self._clip_cache[key] = make_mc_clip_step(
                self._det_params, self.depth, self.bank, self.centers, self.kfp,
                self.cfg, crop_params=self._crop_params, crop_depth=self.crop_depth,
                stem=self.stem, crop_stem=self.crop_stem, mesh=mesh,
            )
        return self._clip_cache[key]

    def track_clips(
        self,
        sources: List[Iterable],
        clip_len: int = 24,
        cutoff: int = 10**9,
        sync_ms: float = 20.0,
        mesh=None,
        yuv_hw: Optional[Tuple[int, int]] = None,
    ):
        """Clip-scan host loop: ONE device call per ``clip_len`` frames, with
        the next clip staged (packed + device_put, camera-sharded when a mesh
        is given) by a background thread while the device advances the
        current one — the double-buffered replacement for the reference's
        per-frame queue pulls (MC3D_crop_tracker.py:197-218).

        ``yuv_hw``: frame (H, W) when sources emit flat planar YUV420 bytes
        (``VideoFrameSource(emit="yuv420")``) — color conversion + s2d
        packing then run on device (:func:`yuv420_flat_to_s2d`), halving
        host->device bytes."""
        import queue as _queue
        import threading

        if yuv_hw is not None and self.stem != "s2d":
            # yuv420_flat_to_s2d produces s2d-packed frames; a conv7-stem
            # tracker would otherwise die deep inside the detector on a
            # 48-vs-3 channel mismatch, far from the misconfiguration
            raise ValueError(
                "track_clips(yuv_hw=...) requires stem='s2d' (on-device YUV "
                f"conversion emits s2d-packed frames); this tracker has "
                f"stem={self.stem!r}"
            )
        clip = self._clip_fn(mesh)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            frames_sh = NamedSharding(mesh, P(None, "data"))
        else:
            frames_sh = None

        def stage(batch_np, times_np):
            fj = jnp.asarray(batch_np)
            if yuv_hw is not None and fj.ndim == 3:
                # flat planar YUV420 [T,C,L] -> s2d uint8 on device
                fj = yuv420_flat_to_s2d(fj, (int(yuv_hw[0]), int(yuv_hw[1])))
            elif self.stem == "s2d" and fj.shape[-1] == 3:
                t, c = fj.shape[0], fj.shape[1]
                fj = self._pack(fj.reshape((t * c,) + fj.shape[2:]))
                fj = fj.reshape((t, c) + fj.shape[1:])
            if frames_sh is not None:
                fj = jax.device_put(fj, frames_sh)
            return fj, jnp.asarray(times_np)

        q: _queue.Queue = _queue.Queue(maxsize=2)
        DONE = object()
        producer_err: list = []  # re-raised on the consumer side, not swallowed

        def producer():
            buf_f, buf_t = [], []
            frame0 = 0
            try:
                for frames, times in self._synced_frames(sources, cutoff, sync_ms):
                    if self.epoch is None:
                        self.epoch = float(min(times))
                    buf_f.append(frames)
                    buf_t.append([t - self.epoch for t in times])
                    if len(buf_f) == clip_len:
                        q.put(
                            (stage(np.stack(buf_f), np.asarray(buf_t, np.float32)), frame0)
                        )
                        frame0 += clip_len
                        buf_f, buf_t = [], []
                if buf_f:
                    q.put(
                        (stage(np.stack(buf_f), np.asarray(buf_t, np.float32)), frame0)
                    )
            except BaseException as e:  # noqa: BLE001 — crossing a thread boundary
                producer_err.append(e)
            finally:
                q.put(DONE)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        start = time.time()
        n = 0
        # Async pipelining: clip k+1 is ENQUEUED while clip k executes — the
        # host never blocks between clips (JAX async dispatch keeps the
        # device queue full), and result snapshots are fetched with a
        # bounded lag so per-call host<->device latency (PCIe, or seconds of
        # RTT on remote/tunneled devices) is paid once, not per clip.
        # ``drain_lag`` bounds in-flight clips (device memory for staged
        # inputs + snapshots).
        drain_lag = 3
        pending: list = []  # (snaps, frame0, ts_bias_at_clip)

        def drain_one():
            nonlocal n
            snaps, frame0, bias_ref = pending.pop(0)
            with self.timers("drain"):
                # ONE batched device->host fetch per clip (the per-array
                # np.asarray form issues 6 transfers, each paying a full
                # round trip on remote/tunneled devices)
                ids, mask, states, classes, ts, bias_now = jax.device_get(
                    (snaps.ids, snaps.raw_mask, snaps.states7, snaps.classes,
                     snaps.t, bias_ref)
                )
            for k in range(ids.shape[0]):
                self.rows.append(
                    (
                        frame0 + k,
                        float(self.epoch + float(ts[k])),
                        ids[k][mask[k]],
                        states[k][mask[k]],
                        classes[k][mask[k]],
                    )
                )
                self.ts_bias_log.append(bias_now)
            n += ids.shape[0]

        while True:
            item = q.get()
            if item is DONE:
                break
            (fj, tj), frame0 = item
            with self.timers("detect"):
                self.state, self.ts_bias, snaps = clip(
                    self.state, self.ts_bias, fj, tj, jnp.asarray(frame0, jnp.int32)
                )
            pending.append((snaps, frame0, self.ts_bias))
            while len(pending) > drain_lag:
                drain_one()
        while pending:
            drain_one()
        thread.join(timeout=10)
        if producer_err:
            raise producer_err[0]
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
            im = G.state_to_im_banked(
                states, self.registry.P[c, 0], self.registry.P[c, 1]
            )
            space = G.state_to_space(states)
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
