"""Single-camera 3D tracker (reference ``KIOU_Tracker``, minimal_3D_track.py).

The per-frame pipeline — detect, parse to roadway state, associate
(roadway-IoU auction), Kalman update, births/deaths/pruning, snapshot — is
ONE jitted device function over fixed-capacity arrays; the host loop only
stages frames and drains [N,7]-sized snapshots.

Detection is pluggable: the real jitted RetinaNet, or any callable producing
a :class:`playground3d_tpu.models.retinanet.Detections` (tests inject an
oracle detector so the tracker logic is exercised without trained weights).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from playground3d_tpu.evaluation import geometry_np as G
from playground3d_tpu.evaluation.csv_io import TrackRecord, write_results_csv
from playground3d_tpu.models.retinanet import Detections, detect_multiframe
from playground3d_tpu.pipeline.camera_bank import CameraBank
from playground3d_tpu.pipeline.tracker_state import (
    Snapshot,
    TrackState,
    associate_and_update,
    init_track_state,
    lifecycle,
    parse_detections,
    snapshot,
)
from playground3d_tpu.track.kf import KFParams, default_params
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.utils.constants import CLASS_NAMES
from playground3d_tpu.utils.profiling import StageTimers


def make_track_step(bank: CameraBank, kfp: KFParams, cfg: TrackerConfig):
    """Jitted (state, detections, cam_times) -> (state', snapshot)."""

    @jax.jit
    def step(state: TrackState, det: Detections, cam_times: jnp.ndarray):
        parsed = parse_detections(det, bank, cam_times, cfg)
        t_ref = jnp.mean(cam_times)
        state, _, _ = associate_and_update(state, parsed, t_ref, kfp, cfg)
        state = lifecycle(state, t_ref, kfp, cfg)
        snap = snapshot(state, t_ref, kfp, cfg)
        return state, snap

    return step


def make_full_step(
    det_params,
    depth: int,
    bank: CameraBank,
    kfp: KFParams,
    cfg: TrackerConfig,
    stem: str = "conv7",
):
    """Jitted (state, frames [C,H,W,3] or s2d-packed [C,H/4,W/4,48],
    cam_times [C]) -> (state', snapshot): detector + tracker fused into one
    device call."""

    @jax.jit
    def step(state: TrackState, frames: jnp.ndarray, cam_times: jnp.ndarray):
        det = detect_multiframe(
            det_params,
            frames,
            depth=depth,
            pre_topk=cfg.pre_topk,
            max_dets=cfg.max_dets,
            stem=stem,
            approx_topk=cfg.approx_topk,
            min_level=cfg.det_min_level,
        )
        parsed = parse_detections(det, bank, cam_times, cfg)
        t_ref = jnp.mean(cam_times)
        state, _, _ = associate_and_update(state, parsed, t_ref, kfp, cfg)
        state = lifecycle(state, t_ref, kfp, cfg)
        snap = snapshot(state, t_ref, kfp, cfg)
        return state, snap

    return step


def make_clip_step(
    det_params,
    depth: int,
    bank: CameraBank,
    kfp: KFParams,
    cfg: TrackerConfig,
    stem: str = "conv7",
):
    """Jitted clip tracker: (state, frames [T,C,H,W,ch], cam_times [T,C]) ->
    (state', stacked snapshots over T frames).

    A ``lax.scan`` over the fused per-frame step — the whole clip advances in
    ONE device call, so per-frame host dispatch disappears entirely. Stage a
    clip in HBM, scan, drain T snapshots at once.
    """
    step = make_full_step(det_params, depth, bank, kfp, cfg, stem=stem)

    @jax.jit
    def clip(state: TrackState, frames: jnp.ndarray, cam_times: jnp.ndarray):
        def body(s, xt):
            f, t = xt
            s2, snap = step(s, f, t)
            return s2, snap

        state, snaps = jax.lax.scan(body, state, (frames, cam_times))
        return state, snaps

    return clip


class SingleCameraTracker:
    """Host driver: stages frames, drains snapshots, writes the 46-col CSV.

    Parameters
    ----------
    registry : CameraRegistry with the camera's correspondence
    camera : camera name (e.g. "p1c1")
    cfg : TrackerConfig
    kf_params : KFParams (defaults mirror the reference)
    detect_fn : None to use the real detector via ``det_params``+``depth``;
        otherwise a callable (frames [1,H,W,3], ) -> Detections
    """

    def __init__(
        self,
        registry,
        camera: str,
        cfg: TrackerConfig = TrackerConfig(),
        kf_params: Optional[KFParams] = None,
        det_params=None,
        depth: int = 50,
        detect_fn: Optional[Callable] = None,
        stem: str = "conv7",
        on_frame: Optional[Callable] = None,
    ):
        from playground3d_tpu.pipeline.camera_bank import bank_from_registry

        self.registry = registry
        self.camera = camera
        self.cam_idx = registry.index(camera)
        self.cfg = cfg
        self.kfp = kf_params if kf_params is not None else default_params()
        self.bank = bank_from_registry(registry)
        self.depth = depth

        if detect_fn is not None:
            self._detect = detect_fn
            self._step = make_track_step(self.bank, self.kfp, cfg)
            self._fused = False
        else:
            assert det_params is not None
            self._full = make_full_step(
                det_params, depth, self.bank, self.kfp, cfg, stem=stem
            )
            self._fused = True

        self.state = init_track_state(cfg.max_tracks)
        self.epoch: Optional[float] = None
        self.rows: List[tuple] = []  # (frame, t_abs, ids, states7, classes)
        self.timers = StageTimers(["detect+track", "stage", "drain"])
        # opt-in live observability: called (frame_num, frames [1,H,W,3],
        # snap, None) after each frame — tools.visualize.TrackOverlayWriter
        self.on_frame = on_frame

    def process_frame(self, frame: np.ndarray, t_abs: float, frame_num: int) -> Snapshot:
        """frame [H,W,3] float32 (normalized); t_abs float64 UNIX seconds."""
        if self.epoch is None:
            self.epoch = float(t_abs)
        t_off = np.float32(t_abs - self.epoch)
        cam_times = jnp.asarray([t_off])

        with self.timers("stage"):
            frames = jnp.asarray(frame[None])

        with self.timers("detect+track"):
            if self._fused:
                self.state, snap = self._full(self.state, frames, cam_times)
            else:
                det = self._detect(frames)
                self.state, snap = self._step(self.state, det, cam_times)
            jax.block_until_ready(snap.states7)

        with self.timers("drain"):
            ids = np.asarray(snap.ids)
            mask = np.asarray(snap.raw_mask)
            states = np.asarray(snap.states7)
            classes = np.asarray(snap.classes)
            self.rows.append(
                (frame_num, float(self.epoch + float(snap.t)), ids[mask], states[mask], classes[mask])
            )
        if self.on_frame is not None:
            self.on_frame(frame_num, frame[None], snap, None)
        return snap

    def track(self, frames: Iterable[Tuple[np.ndarray, float]], cutoff: int = 10**9):
        start = time.time()
        n = 0
        for frame_num, (frame, t_abs) in enumerate(frames):
            if frame_num >= cutoff:
                break
            self.process_frame(frame, t_abs, frame_num)
            n += 1
        wall = time.time() - start
        return {"frames": n, "fps": n / max(wall, 1e-9), **self.timers.totals()}

    # -- output --------------------------------------------------------------
    def records(self) -> List[TrackRecord]:
        c = self.cam_idx
        H_eb = self.registry.H[c, 0]
        out = []
        for frame_num, t_abs, ids, states, classes in self.rows:
            if len(ids) == 0:
                continue
            space = G.state_to_space(states)
            use_wb = states[:, 1] > 60.0
            im_eb = G.space_to_im(space, self.registry.P[c, 0])
            im_wb = G.space_to_im(space, self.registry.P[c, 1])
            im = np.where(use_wb[:, None, None], im_wb, im_eb)
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
                        camera=self.camera,
                    )
                )
        return out

    def write_results_csv(self, path: str) -> None:
        write_results_csv(path, self.records())
