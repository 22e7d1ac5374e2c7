"""Stock 2D RetinaNet variant (reference top-level ``retinanet/`` package).

The reference keeps an unmodified yhenon-style 2D detector beside the
directional 3D one (retinanet/model.py: 4-output regression, standard
(dx,dy,dw,dh) decode with std scaling, 2D focal loss retinanet/losses.py).
This module provides the same capability on the shared backbone/FPN:
a 4-channel regression head, the classic box decode, and a 2D focal loss.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from playground3d_tpu.models.anchors import anchors_for_shape
from playground3d_tpu.models.fpn import fpn_apply, fpn_init
from playground3d_tpu.models.nn import Params, conv_apply, conv_init
from playground3d_tpu.models.resnet import fpn_sizes, resnet_apply, resnet_init
from playground3d_tpu.ops.nms import batched_nms

# standard RetinaNet decode scaling (reference retinanet/utils.py BBoxTransform)
DECODE_MEAN = jnp.asarray([0.0, 0.0, 0.0, 0.0])
DECODE_STD = jnp.asarray([0.1, 0.1, 0.2, 0.2])


def retinanet2d_init(key, num_classes: int = 80, depth: int = 50) -> Params:
    from playground3d_tpu.models.heads import _tower_init

    kb, kf, kc, kr, kco, kro = jax.random.split(key, 6)
    c3, c4, c5 = fpn_sizes(depth)
    heads = {
        "cls_tower": _tower_init(kc, 256),
        "reg_tower": _tower_init(kr, 256),
        "cls_out": conv_init(kco, 256, 9 * num_classes, 3, bias=True),
        "reg_out": conv_init(kro, 256, 9 * 4, 3, bias=True),
    }
    heads["cls_out"]["w"] = jnp.zeros_like(heads["cls_out"]["w"])
    heads["cls_out"]["b"] = jnp.full_like(
        heads["cls_out"]["b"], -math.log((1.0 - 0.01) / 0.01)
    )
    heads["reg_out"]["w"] = jnp.zeros_like(heads["reg_out"]["w"])
    heads["reg_out"]["b"] = jnp.zeros_like(heads["reg_out"]["b"])
    return {
        "backbone": resnet_init(kb, depth),
        "fpn": fpn_init(kf, c3, c4, c5),
        "heads": heads,
    }


def decode_boxes_2d(regression: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Standard (dx,dy,dw,dh) -> xyxy decode (retinanet/utils.py:102-149)."""
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h
    reg = regression * DECODE_STD + DECODE_MEAN
    pcx = cx + reg[..., 0] * w
    pcy = cy + reg[..., 1] * h
    pw = jnp.exp(reg[..., 2]) * w
    ph = jnp.exp(reg[..., 3]) * h
    return jnp.stack(
        [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], axis=-1
    )


def forward_raw_2d(params, images, depth=50, num_classes=80, dtype=jnp.bfloat16):
    from playground3d_tpu.models.heads import _tower_apply

    c3, c4, c5 = resnet_apply(params["backbone"], images, depth, dtype)
    feats = fpn_apply(params["fpn"], c3, c4, c5, dtype)
    h = params["heads"]
    cls_all, reg_all = [], []
    for f in feats:
        n, hh, ww, _ = f.shape
        c = conv_apply(h["cls_out"], _tower_apply(h["cls_tower"], f, dtype), dtype=dtype)
        r = conv_apply(h["reg_out"], _tower_apply(h["reg_tower"], f, dtype), dtype=dtype)
        cls_all.append(c.reshape(n, hh * ww * 9, num_classes))
        reg_all.append(r.reshape(n, hh * ww * 9, 4))
    cls = jax.nn.sigmoid(jnp.concatenate(cls_all, 1).astype(jnp.float32))
    reg = jnp.concatenate(reg_all, 1).astype(jnp.float32)
    return cls, reg


@functools.partial(jax.jit, static_argnames=("depth", "num_classes", "pre_topk", "max_dets"))
def detect_2d(
    params,
    image: jnp.ndarray,
    depth: int = 50,
    num_classes: int = 80,
    score_threshold: float = 0.05,
    nms_iou: float = 0.5,
    pre_topk: int = 1000,
    max_dets: int = 100,
):
    """Single-image 2D detection with per-class NMS; fixed-capacity masked
    output (scores, classes, boxes_xyxy, mask)."""
    anchors = jnp.asarray(anchors_for_shape(tuple(image.shape[0:2])))
    cls, reg = forward_raw_2d(params, image[None], depth, num_classes)
    boxes = decode_boxes_2d(reg[0], anchors)
    cls = cls[0]

    a = anchors.shape[0]
    flat = cls.reshape(-1)
    k = min(pre_topk, a * num_classes)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    anchor_idx = top_idx // num_classes
    class_idx = (top_idx % num_classes).astype(jnp.int32)
    top_boxes = boxes[anchor_idx]
    valid = top_scores > score_threshold
    keep_idx, keep_mask = batched_nms(
        top_boxes, top_scores, class_idx, valid, nms_iou, max_keep=max_dets
    )
    return (
        top_scores[keep_idx],
        class_idx[keep_idx],
        top_boxes[keep_idx],
        keep_mask,
    )


def focal_loss_2d(
    classification: jnp.ndarray,  # [B,A,K]
    regression: jnp.ndarray,  # [B,A,4]
    annotations: jnp.ndarray,  # [B,M,5] xyxy+class, -1 padded
    anchors: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard 2D focal + smooth-L1 on (dx,dy,dw,dh) targets
    (reference retinanet/losses.py:24-179), vectorized over the batch."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah

    def one(cls, reg, ann):
        valid = ann[:, 4] >= 0
        cls = jnp.clip(cls, 1e-4, 1 - 1e-4)

        def iou_row(box):
            iw = jnp.clip(jnp.minimum(anchors[:, 2], box[2]) - jnp.maximum(anchors[:, 0], box[0]), 0)
            ih = jnp.clip(jnp.minimum(anchors[:, 3], box[3]) - jnp.maximum(anchors[:, 1], box[1]), 0)
            inter = iw * ih
            area = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
            ab = (box[2] - box[0]) * (box[3] - box[1])
            return inter / jnp.clip(area + ab - inter, 1e-8)

        def body(m, carry):
            best, arg = carry
            iou = jnp.where(valid[m], iou_row(ann[m, :4]), -1.0)
            better = iou > best
            return jnp.where(better, iou, best), jnp.where(better, m, arg)

        a = anchors.shape[0]
        best, arg = jax.lax.fori_loop(
            0, ann.shape[0], body, (jnp.full((a,), -1.0), jnp.zeros((a,), jnp.int32))
        )
        assigned = ann[arg]
        has = jnp.any(valid)
        pos = (best >= 0.5) & has
        neg = (best < 0.4) | ~has
        num_pos = jnp.clip(pos.sum().astype(jnp.float32), 1.0)

        k = cls.shape[-1]
        one_hot = jax.nn.one_hot(assigned[:, 4].astype(jnp.int32), k)
        targets = jnp.where(pos[:, None], one_hot, 0.0)
        care = (pos | neg)[:, None]
        alpha_f = jnp.where(targets == 1.0, 0.25, 0.75)
        focal_w = jnp.where(targets == 1.0, 1 - cls, cls)
        bce = -(targets * jnp.log(cls) + (1 - targets) * jnp.log(1 - cls))
        cls_loss = jnp.where(care, alpha_f * focal_w**2 * bce, 0.0).sum() / num_pos

        gw = jnp.clip(assigned[:, 2] - assigned[:, 0], 1.0)
        gh = jnp.clip(assigned[:, 3] - assigned[:, 1], 1.0)
        gcx = assigned[:, 0] + 0.5 * gw
        gcy = assigned[:, 1] + 0.5 * gh
        t = jnp.stack(
            [(gcx - acx) / aw, (gcy - acy) / ah, jnp.log(gw / aw), jnp.log(gh / ah)],
            axis=1,
        ) / DECODE_STD
        diff = jnp.abs(t - reg)
        sl1 = jnp.where(diff <= 1 / 9, 0.5 * 9 * diff**2, diff - 0.5 / 9)
        reg_loss = jnp.where(pos[:, None], sl1, 0.0).sum() / (num_pos * 4.0)
        return cls_loss, reg_loss

    cls_l, reg_l = jax.vmap(one)(classification, regression, annotations)
    return cls_l.mean(), reg_l.mean()
