"""Directional RetinaNet: ResNet + FPN + heads, with fused decode and NMS.

TPU-first re-design of the reference detector (reference
pytorch_retinanet_detector_directional/retinanet/model.py). The reference's
four forward behaviors map to:

  training       -> :func:`forward_raw` (losses applied by the caller;
                    see playground3d_tpu.losses)
  MULTI_FRAME    -> :func:`detect_multiframe` — batched multi-camera decode
                    + camera-grouped NMS, fixed-capacity masked outputs
                    (model.py:311-344)
  LOCALIZE       -> :func:`localize` — raw decoded boxes + class scores per
                    crop (model.py:362-363)
  default        -> :func:`detect_singleframe` — per-class NMS outputs
                    (model.py:365-397)

The reference's adaptive score-threshold loop (model.py:322-328: raise the
threshold until <=10k anchors survive) is a data-dependent ``while`` that
cannot compile; its purpose — bound the NMS workload — is served exactly by
a fixed top-k over anchor scores, which is what we do.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from playground3d_tpu.models.anchors import anchors_for_shape
from playground3d_tpu.models.decode import decode_regression
from playground3d_tpu.models.fpn import fpn_apply, fpn_init
from playground3d_tpu.models.heads import head_apply, head_init
from playground3d_tpu.models.nn import Params
from playground3d_tpu.models.resnet import fpn_sizes, resnet_apply, resnet_init
from playground3d_tpu.ops.nms import batched_nms, nms

DEFAULT_NUM_CLASSES = 8

# ImageNet constants tiled for s2d-packed channel counts
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_on_device(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 frames -> ImageNet-normalized float32 on device. Hosts can ship
    frames as uint8 (4x less transfer than f32); channel constants tile to
    any s2d-packed channel count (c % 3 is the color)."""
    if images.dtype != jnp.uint8:
        return images
    ch = images.shape[-1]
    reps = ch // 3
    mean = jnp.asarray(np.tile(_IMAGENET_MEAN, reps))
    std = jnp.asarray(np.tile(_IMAGENET_STD, reps))
    return (images.astype(jnp.float32) / 255.0 - mean) / std


class Detections(NamedTuple):
    """Fixed-capacity masked detection set."""

    scores: jnp.ndarray  # [K]
    classes: jnp.ndarray  # [K] int32
    boxes: jnp.ndarray  # [K,20] (16 corner coords + 2D box)
    cam_idx: jnp.ndarray  # [K] int32 source image index
    mask: jnp.ndarray  # [K] bool


def retinanet_init(
    key,
    num_classes: int = DEFAULT_NUM_CLASSES,
    depth: int = 50,
    stem: str = "conv7",
    tower_depth: int = 4,
    shared_tower: bool = False,
    feature_size: int = 256,
) -> Params:
    """``feature_size`` sets the FPN/head channel width (reference parity is
    256, model.py:59,120); the apply path is shape-driven, so slimmer heads
    need no other change. Head FLOPs scale ~quadratically with it."""
    kb, kf, kh = jax.random.split(key, 3)
    c3, c4, c5 = fpn_sizes(depth)
    return {
        "backbone": resnet_init(kb, depth, stem=stem),
        "fpn": fpn_init(kf, c3, c4, c5, feature_size=feature_size),
        "heads": head_init(
            kh, num_classes, feature_size=feature_size,
            tower_depth=tower_depth, shared_tower=shared_tower,
        ),
    }


def forward_raw(
    params: Params,
    images: jnp.ndarray,
    depth: int = 50,
    num_classes: int = DEFAULT_NUM_CLASSES,
    dtype=jnp.bfloat16,
    apply_sigmoid: bool = True,
    stem: str = "conv7",
    compact: bool = False,
    min_level: int = 3,
    score_path: bool = False,
    constrain=None,
) -> Tuple[jnp.ndarray, ...]:
    """NHWC images -> (classification [N,A,K] (sigmoided), regression [N,A,12]).

    With stem="s2d" the input may be host-packed [N,H/4,W/4,48]; uint8
    inputs are normalized on device (see normalize_on_device).

    ``compact=True``: bf16 logits/regression, no sigmoid, no f32
    materialization of the full anchor set (see heads.head_apply).
    ``min_level``: run the heads only on pyramid levels >= this (the
    anchor set must be generated with the same subset; inference knob,
    training keeps 3).
    ``constrain``: optional per-tensor sharding-constraint callable applied
    to each pyramid level before the heads (see
    parallel.mesh.spatial_constrainer) — under GSPMD spatial partitioning
    this pins deep levels whose extent no longer divides the mesh axis to
    an explicit (cheap) replication instead of the partitioner's
    involuntary full rematerialization inside the head convs."""
    images = normalize_on_device(images)
    from playground3d_tpu.models.quant import (
        is_quantized,
        quant_conv,
        resnet_apply_int8_chained,
    )

    if is_quantized(params["backbone"]):
        c3, c4, c5 = resnet_apply_int8_chained(params["backbone"], images, depth, stem=stem)
    else:
        c3, c4, c5 = resnet_apply(params["backbone"], images, depth, dtype, stem=stem)
    # fpn/heads dispatch per-conv on the ``wq`` key, so a mixed tree (e.g.
    # quantized towers, bf16 output convs) runs each conv on its right path
    heads_q = is_quantized(params["heads"])
    tail_conv = quant_conv if is_quantized(params["fpn"]) or heads_q else None
    fkw = {} if tail_conv is None else {"conv": tail_conv}
    feats = fpn_apply(params["fpn"], c3, c4, c5, dtype, **fkw)
    if min_level > 3:
        feats = feats[min_level - 3:]
    if constrain is not None:
        feats = [constrain(f) for f in feats]
    if compact and heads_q:
        # chained-int8 towers (activations stay int8 between tower convs)
        from playground3d_tpu.models.quant import head_apply_int8_chained

        return head_apply_int8_chained(
            params["heads"], feats, num_classes, score_path=score_path
        )
    return head_apply(
        params["heads"], feats, num_classes, dtype=dtype,
        apply_sigmoid=apply_sigmoid, compact=compact, score_path=score_path,
        **fkw
    )


def _image_shape_of(images: jnp.ndarray, stem: str) -> Tuple[int, int]:
    """Pixel-space (H, W) for anchor generation, accounting for host-packed
    space-to-depth inputs ([N,H/4,W/4,48])."""
    h, w = images.shape[1:3]
    if stem == "s2d" and images.shape[-1] == 48:
        return h * 4, w * 4
    return h, w


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "num_classes", "pre_topk", "max_dets", "stem", "approx_topk",
        "min_level",
    ),
)
def detect_multiframe(
    params: Params,
    images: jnp.ndarray,
    depth: int = 50,
    num_classes: int = DEFAULT_NUM_CLASSES,
    score_threshold: float = 1e-7,
    nms_iou: float = 0.5,
    pre_topk: int = 4096,
    max_dets: int = 256,
    stem: str = "conv7",
    approx_topk: bool = False,
    min_level: int = 3,
) -> Detections:
    """Batched multi-camera detection (reference MULTI_FRAME path,
    model.py:311-344).

    All N frames' anchors are flattened together; scores are per-anchor max
    over classes; top-k bounds the candidate pool; NMS is grouped by source
    image (boxes from different cameras never suppress each other) on the 2D
    box columns 16:20 with IoU 0.5 — the reference's exact pipeline with the
    adaptive-threshold loop replaced by top-k.
    """
    n = images.shape[0]
    levels = tuple(range(min_level, 8))
    anchors = jnp.asarray(anchors_for_shape(_image_shape_of(images, stem), levels))
    # compact: bf16 logits, sigmoid deferred to the top-k survivors — the
    # full-anchor f32 sigmoid+max used to cost more than the whole
    # decode/top-k/NMS tail (~1.2 ms at 1080p); values are identical (the
    # head convs emit bf16 either way, sigmoid is monotonic)
    # score_path: the heads reduce over classes per level at the conv's
    # natural layout — the full [N*A, K] class tensor is never concatenated
    # or reduce_max'd (measured ~0.5 ms/frame of pure data movement at
    # 1080p in the device profile); argmax-class comes along for free
    cls_max, cls_arg, reg = forward_raw(
        params, images, depth, num_classes, stem=stem, compact=True,
        min_level=min_level, score_path=True,
    )

    a = anchors.shape[0]
    logits = cls_max.reshape(-1).astype(jnp.float32)  # [N*A]

    # top-k FIRST, then decode/argmax/sigmoid only the k survivors —
    # decoding all N*A anchors to 20 coords costs more than the whole NMS
    # stage. approx_topk uses the TPU-optimized approx_max_k (recall 0.99
    # within the candidate pool; ~2x faster than exact top_k at 1080p
    # anchor counts) — misses land in the score tail, far below the NMS
    # keep set; non-TPU backends fall back to exact sorting, so CPU tests
    # are exact.
    k = min(pre_topk, n * a)
    if approx_topk:
        top_logits, top_idx = jax.lax.approx_max_k(logits, k, recall_target=0.99)
    else:
        top_logits, top_idx = jax.lax.top_k(logits, k)
    top_scores = jax.nn.sigmoid(top_logits)
    anchor_idx = top_idx % a
    top_cam = (top_idx // a).astype(jnp.int32)
    top_reg = reg.reshape(n * a, -1)[top_idx].astype(jnp.float32)
    top_boxes = decode_regression(top_reg, anchors[anchor_idx])  # [k,20]
    top_classes = cls_arg.reshape(n * a)[top_idx]
    valid = top_scores > score_threshold

    keep_idx, keep_mask = batched_nms(
        top_boxes[:, 16:20], top_scores, top_cam, valid, nms_iou, max_keep=max_dets
    )
    return Detections(
        scores=top_scores[keep_idx],
        classes=top_classes[keep_idx],
        boxes=top_boxes[keep_idx],
        cam_idx=top_cam[keep_idx],
        mask=keep_mask,
    )


@functools.partial(
    jax.jit, static_argnames=("depth", "num_classes", "pre_topk", "max_dets", "stem")
)
def detect_singleframe(
    params: Params,
    image: jnp.ndarray,
    depth: int = 50,
    num_classes: int = DEFAULT_NUM_CLASSES,
    score_threshold: float = 1e-25,
    nms_iou: float = 0.5,
    pre_topk: int = 4096,
    max_dets: int = 256,
    stem: str = "conv7",
) -> Detections:
    """Single-frame per-class NMS (reference default path, model.py:365-397):
    every (anchor, class) score above threshold competes in class-grouped NMS.
    """
    anchors = jnp.asarray(anchors_for_shape(_image_shape_of(image[None], stem)))
    cls, reg = forward_raw(params, image[None], depth, num_classes, stem=stem)
    cls = cls[0]  # [A,K]
    reg = reg[0]  # [A,12]

    a = anchors.shape[0]
    # flatten (anchor, class) pairs; box repeats across classes via index
    # math; decode only the k anchors that survive the top-k
    flat_scores = cls.reshape(-1)  # [A*K]
    k = min(pre_topk, a * num_classes)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    anchor_idx = top_idx // num_classes
    class_idx = (top_idx % num_classes).astype(jnp.int32)
    top_boxes = decode_regression(reg[anchor_idx], anchors[anchor_idx])
    valid = top_scores > score_threshold

    keep_idx, keep_mask = batched_nms(
        top_boxes[:, 16:20], top_scores, class_idx, valid, nms_iou, max_keep=max_dets
    )
    return Detections(
        scores=top_scores[keep_idx],
        classes=class_idx[keep_idx],
        boxes=top_boxes[keep_idx],
        cam_idx=jnp.zeros_like(keep_idx),
        mask=keep_mask,
    )


@functools.partial(jax.jit, static_argnames=("depth", "num_classes", "stem"))
def localize(
    params: Params,
    crops: jnp.ndarray,
    depth: int = 50,
    num_classes: int = DEFAULT_NUM_CLASSES,
    stem: str = "conv7",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop-detector LOCALIZE path (reference model.py:362-363): NHWC crops
    -> (decoded boxes [n, A, 20], class scores [n, A, K]); no NMS — the
    tracker's best-box selection consumes the raw candidates."""
    anchors = jnp.asarray(anchors_for_shape(_image_shape_of(crops, stem)))
    cls, reg = forward_raw(params, crops, depth, num_classes, stem=stem)
    boxes = decode_regression(reg, anchors)
    return boxes, cls
