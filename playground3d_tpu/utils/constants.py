"""Canonical class tables and state-vector conventions.

Single source of truth for the vehicle-class priors that the reference repo
duplicates across >=6 files (reference: homography.py:191-235,
MC3D_crop_tracker.py:1538-1555, datareader.py:117, ...).

State vector convention (identical to the reference, kf.py:37-39 and
homography.py:274-320):

    state  = [x, y, l, w, h, v]            (filter-internal, 6)
    state7 = [x, y, l, w, h, dir, v]       (with direction, 7)

* ``x``   roadway-axis coordinate of the **rear center bottom** of the
          vehicle, in feet;
* ``y``   lane-transverse coordinate of the vehicle center, in feet;
* ``l/w/h`` length / width / height in feet;
* ``dir`` +1 if travelling in +x (EB), -1 otherwise (WB);
* ``v``   signed speed along the roadway axis, ft/s.

Space ("LMCS") boxes are [d, 8, 3] corner arrays ordered
fbr, fbl, bbr, bbl, ftr, ftl, btr, btl (front/back, top/bottom, right/left),
z negative upward for the top corners (reference homography.py:305-320).
Image boxes are [d, 8, 2] pixel arrays in the same corner order.
"""

from __future__ import annotations

import numpy as np

# int -> class name (reference homography.py:218-235)
CLASS_NAMES = (
    "sedan",
    "midsize",
    "van",
    "pickup",
    "semi",
    "truck (other)",
    "motorcycle",
    "trailer",
)

NUM_CLASSES = len(CLASS_NAMES)  # 8

# name -> int, including the "truck" alias (reference homography.py:218-226)
CLASS_IDS = {name: i for i, name in enumerate(CLASS_NAMES)}
CLASS_IDS["truck"] = CLASS_IDS["truck (other)"]

# Bi-directional dict matching the reference's class_dict exactly
# (MC3D_crop_tracker.py:1538-1555).
CLASS_DICT = {**CLASS_IDS, **{i: name for i, name in enumerate(CLASS_NAMES)}}

# Height prior per class, feet (reference homography.py:191-202).
_CLASS_HEIGHTS = {
    "sedan": 4.0,
    "midsize": 5.0,
    "van": 6.0,
    "pickup": 5.0,
    "semi": 12.0,
    "truck (other)": 12.0,
    "truck": 12.0,
    "motorcycle": 4.0,
    "trailer": 3.0,
    "other": 5.0,
}

# [L, W, H] prior per class, feet (reference homography.py:205-216).
_CLASS_DIMS = {
    "sedan": [16.0, 6.0, 4.0],
    "midsize": [18.0, 6.5, 5.0],
    "van": [20.0, 6.0, 6.5],
    "pickup": [20.0, 6.0, 5.0],
    "semi": [55.0, 9.0, 12.0],
    "truck (other)": [25.0, 9.0, 12.0],
    "truck": [25.0, 9.0, 12.0],
    "motorcycle": [7.0, 3.0, 4.0],
    "trailer": [16.0, 7.0, 3.0],
    "other": [18.0, 6.5, 5.0],
}

# Dense arrays indexed by class id — these are what on-device code uses.
CLASS_HEIGHTS = np.array(
    [_CLASS_HEIGHTS[name] for name in CLASS_NAMES], dtype=np.float32
)
CLASS_DIMS = np.array([_CLASS_DIMS[name] for name in CLASS_NAMES], dtype=np.float32)
DEFAULT_HEIGHT = np.float32(_CLASS_HEIGHTS["other"])

# Corner bookkeeping ----------------------------------------------------------
# Corner order: 0 fbr, 1 fbl, 2 bbr, 3 bbl, 4 ftr, 5 ftl, 6 btr, 7 btl
BOTTOM_CORNERS = (0, 1, 2, 3)
TOP_CORNERS = (4, 5, 6, 7)
FRONT_CORNERS = (0, 1, 4, 5)
BACK_CORNERS = (2, 3, 6, 7)
RIGHT_CORNERS = (0, 2, 4, 6)
LEFT_CORNERS = (1, 3, 5, 7)

# The Homography_Wrapper dispatches between the EB-fit and WB-fit homography
# based on roadway-transverse coordinate y > 60 ft (reference
# homography.py:845,854,874,887).
EB_WB_Y_SPLIT_FT = 60.0

# Frame geometry used throughout the reference (1080p processing resolution).
FRAME_WIDTH = 1920
FRAME_HEIGHT = 1080

# ImageNet normalization used by the frame loaders (mp_loader.py:237-239).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# Nominal camera frame period (reference kf.py:39).
DT_DEFAULT = 1.0 / 30.0


def class_heights_for(labels) -> np.ndarray:
    """[d] height priors for integer class ids or string names
    (reference homography.py:502-517 ``guess_heights``)."""
    out = np.empty(len(labels), dtype=np.float32)
    for i, lab in enumerate(labels):
        if isinstance(lab, str):
            out[i] = _CLASS_HEIGHTS.get(lab, _CLASS_HEIGHTS["other"])
        else:
            out[i] = CLASS_HEIGHTS[int(lab)]
    return out
