"""Central configuration dataclasses.

The reference scatters hyperparameters across params dicts with inline
defaults (MC3D_crop_tracker.py:62-87), hardcoded __main__ constants
(camera range tables, MC3D_crop_tracker.py:1489-1509), and repeated class
dicts. Here one dataclass layer holds the canonical values, with the
reference's defaults.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass(frozen=True)
class TrackerConfig:
    """Tracker hyperparameters (reference MC3D_crop_tracker.py:62-87 and
    KIOU defaults minimal_3D_track.py:32-46)."""

    sigma_d: float = 0.1  # min detection confidence
    sigma_c: float = 0.1  # min crop-detection confidence
    sigma_min: float = 0.5  # min confidence for object persistence
    f_init: int = 5  # frames before an object is permanent
    phi_nms_space: float = 0.2  # roadway-plane NMS IoU during parsing
    phi_nms_im: float = 0.3  # image-space NMS IoU during parsing
    phi_match: float = 0.1  # required IoU for detection -> track match
    phi_over: float = 0.1  # post-update track overlap pruning IoU
    w_conf: float = 0.5  # crop best-box weight: (1-W)*IoU + W*conf
    cd_max: int = 50  # top-k crop candidates per object
    f_max: int = 5  # frames-since-last-detection before death
    cs: int = 112  # crop size
    crop_expand: float = 1.25  # square crop expansion ratio (b)
    det_step: int = 1  # full-frame detection every d frames
    skip_step: int = 1  # crop re-detection every s frames
    crop_slots: int = 0  # crop branch: max live slots cropped per step (0 = all)
    max_size: Tuple[float, float, float] = (100.0, 15.0, 15.0)  # L,W,H ft
    x_range: Tuple[float, float] = (0.0, 2000.0)
    y_range: Tuple[float, float] = (-10.0, 120.0)  # anomaly bounds on y
    v_max: float = 150.0  # |speed| bound ft/s
    match_iou_nms: float = 0.5  # detector-internal NMS IoU
    matching_cutoff: float = 0.95  # single-cam KIOU match distance cutoff
    det_conf_cutoff: float = 0.3  # single-cam KIOU confidence cutoff
    fsld_max: int = 3  # single-cam KIOU death counter
    iou_cutoff: float = 0.1  # single-cam overlap pruning
    ts_alpha: float = 0.05  # clock-bias EMA rate
    estimate_ts_bias: bool = True
    # extension beyond the reference: kill the younger of two same-direction
    # tracks whose centers are within this roadway distance (ft); catches
    # cross-camera duplicates whose footprints fall below phi_over IoU.
    # 0 disables (reference behavior).
    merge_dist_ft: float = 0.0
    # class-size nudge in the crop branch (KF measurement model 3,
    # reference tweak_sizes minimal_3D_track.py:626-640): counters size
    # drift over long crop-only stretches (large det_step)
    size_nudge: bool = False
    # extension beyond the reference: skip the crop-branch KF update for
    # tracks whose best candidate confidence is below sigma_c. The
    # reference updates the filter unconditionally (MC3D:1235) and only
    # gates fsld, so an occluded track is dragged toward noise boxes for
    # f_lost frames before deletion; gating stops that drift. Off by
    # default (reference parity) — a cadence-gate A/B candidate for d>=6.
    crop_conf_gate: bool = False
    # extension beyond the reference: ghost re-identification. A track that
    # dies by fsld (a detection gap — occlusion/NMS suppression) leaves a
    # "ghost" for this many further RE-ID OPPORTUNITIES (full-frame detect
    # frames — crop frames cannot re-identify, so they do not age the
    # window; at det_step=d the window spans ~d*ghost_frames wall-clock
    # frames): its id, last state and velocity
    # persist in the dead slot, and a new detection that appears within
    # ghost_r_ft of the ghost's constant-velocity prediction (same
    # direction) is REBORN with the old id instead of a fresh one. Cuts
    # occlusion fragmentation (the reference fragments on any gap beyond
    # fsld_max, MC3D:463-477) without delaying true deaths the way a large
    # f_max does. 0 disables (reference behavior).
    ghost_frames: int = 0
    ghost_r_ft: float = 15.0
    # extension beyond the reference: tentative-kill. While a track is
    # younger than this (frames), its FIRST failed re-detection attempt
    # kills it outright instead of letting it ride misses up to f_max.
    # Junk tracks born from a single false detection die within 1-2
    # frames (inside the f_init output burn-in, so they never reach the
    # CSV) instead of surviving ~f_max attempts; a confirmed track's
    # coverage is untouched because confirmation == its first attempts
    # succeeded. Dies for-cause: no re-id ghost is left. 0 disables
    # (reference behavior: MC3D:463-477 applies f_max uniformly).
    tentative_age: int = 0

    # capacities (fixed shapes on device)
    max_tracks: int = 128
    max_dets: int = 128
    pre_topk: int = 4096
    # TPU-optimized approximate top-k for the detection candidate pool
    # (recall 0.99; exact on CPU backends — see models/retinanet.py)
    approx_topk: bool = False
    # lowest pyramid level the full-frame detector runs heads on
    # (reference parity 3; 4 drops the stride-8 level = ~75% of anchors —
    # a speed knob for scale bands without small objects)
    det_min_level: int = 3


@dataclass(frozen=True)
class DetectorConfig:
    depth: int = 50
    num_classes: int = 8
    frame_height: int = 1080
    frame_width: int = 1920


# Per-camera visible roadway range [xmin, xmax, y_center] in feet
# (reference MC3D_crop_tracker.py:1489-1509 camera_space_range).
CAMERA_SPACE_RANGE: Dict[str, Tuple[float, float, float]] = {
    "p1c1": (280, 450, 60), "p1c2": (420, 650, 60), "p1c3": (640, 780, 80),
    "p1c4": (640, 780, 40), "p1c5": (740, 890, 60), "p1c6": (840, 1000, 60),
    "p2c1": (920, 1120, 60), "p2c2": (1050, 1180, 60), "p2c3": (1130, 1270, 24),
    "p2c4": (1140, 1320, 80), "p2c5": (1240, 1350, 60), "p2c6": (1290, 1440, 60),
    "p3c1": (1440, 1580, 60), "p3c2": (1570, 1670, 60), "p3c3": (1640, 1770, 80),
    "p3c4": (1640, 1770, 40), "p3c5": (1760, 1960, 60), "p3c6": (1920, 2100, 60),
}


def camera_centers(cameras: List[str]) -> List[Tuple[float, float]]:
    """[(x_center, y_center)] per camera (MC3D_crop_tracker.py:1517-1527)."""
    out = []
    for cam in cameras:
        rmin, rmax, yc = CAMERA_SPACE_RANGE[cam]
        out.append(((rmin + rmax) / 2.0, yc))
    return out


def tracking_x_range(cameras: List[str], margin: float = 100.0) -> Tuple[float, float]:
    lo = min(CAMERA_SPACE_RANGE[c][0] for c in cameras) - margin
    hi = max(CAMERA_SPACE_RANGE[c][1] for c in cameras) + margin
    return lo, hi
