from playground3d_tpu.models.anchors import anchors_for_shape, num_anchors_for_shape
from playground3d_tpu.models.decode import decode_regression
from playground3d_tpu.models.retinanet import (
    Detections,
    detect_multiframe,
    detect_singleframe,
    forward_raw,
    localize,
    retinanet_init,
)
from playground3d_tpu.models.nn import load_params, save_params, tree_size

__all__ = [
    "anchors_for_shape",
    "num_anchors_for_shape",
    "decode_regression",
    "Detections",
    "detect_multiframe",
    "detect_singleframe",
    "forward_raw",
    "localize",
    "retinanet_init",
    "load_params",
    "save_params",
    "tree_size",
]
