from playground3d_tpu.ops.assignment import (
    assign_auction,
    assign_hungarian,
    matches_from_assignment,
)
from playground3d_tpu.ops.iou import elementwise_iou, pairwise_iou
from playground3d_tpu.ops.nms import batched_nms, nms
from playground3d_tpu.ops.roi_align import crop_and_resize

__all__ = [
    "assign_auction",
    "assign_hungarian",
    "matches_from_assignment",
    "elementwise_iou",
    "pairwise_iou",
    "batched_nms",
    "nms",
    "crop_and_resize",
]
