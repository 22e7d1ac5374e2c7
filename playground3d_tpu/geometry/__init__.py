from playground3d_tpu.geometry.homography import (
    CameraRegistry,
    build_projection,
    find_vanishing_point,
    fit_homography,
    scale_P_z,
)
from playground3d_tpu.geometry.transforms import (
    height_from_template,
    im_hull_xyxy,
    im_to_space,
    im_to_state,
    select_eb_wb,
    space_footprint_xyxy,
    space_to_im,
    space_to_state,
    state_to_im,
    state_to_space,
)

__all__ = [
    "CameraRegistry",
    "build_projection",
    "find_vanishing_point",
    "fit_homography",
    "scale_P_z",
    "height_from_template",
    "im_hull_xyxy",
    "im_to_space",
    "im_to_state",
    "select_eb_wb",
    "space_footprint_xyxy",
    "space_to_im",
    "space_to_state",
    "state_to_im",
    "state_to_space",
]
