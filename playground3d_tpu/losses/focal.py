"""Detector losses: focal classification + corner smooth-L1 + vp-angle.

Fully-vectorized re-design of the reference ``FocalLoss``
(pytorch_retinanet_detector_directional/retinanet/losses.py:27-362), which
loops over batch images in Python (losses.py:47) — here a single fused
computation over [B, A, ...] with masked annotations.

Labels are [B, M, 21] per image: 16 corner pixel coords (x,y interleaved,
corner order matching the decode sign matrix), 4-value 2D box, class id;
padded rows have class = -1. (The reference appends 6 vp coordinates to
every label, corrected_3D_dataset.py:494-497, but the loss never actually
uses them — the sign terms are commented out, losses.py:229-301 — so we
drop them from the schema.)

Semantics reproduced:
  * anchor assignment by IoU of anchor vs 2D hull of the 16 GT corners:
    positive >= 0.5, negative < 0.4, in-between ignored (losses.py:93-131)
  * focal loss alpha=0.25 gamma=2, sum / max(num_positives, 1)
    (losses.py:133-152)
  * regression: smooth-L1 (beta = 1/9) between the +-composed predicted
    corners and anchor-normalized targets, top-corner coords x0.5
    (losses.py:310-349)
  * vp loss: mean over three (1 - cos angle) terms aligning the regressed
    l'/w'/h' vectors with the GT box axis vectors in pixel space
    (losses.py:214-304)

The anchor-assignment IoU is computed as a streaming max over the M GT
objects (O(A) memory instead of the reference's [A, M] matrix).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA = 0.25
GAMMA = 2.0
TOP_WEIGHT = 0.5
SL1_BETA = 1.0 / 9.0
POS_IOU = 0.5
NEG_IOU = 0.4
CLS_CLAMP = 1e-4

# corner-column index groups of the flat 16-coord layout (x at even cols)
_X_FRONT = (0, 2, 8, 10)  # corners 0,1,4,5
_X_BACK = (4, 6, 12, 14)  # corners 2,3,6,7
_X_LEFTG = (0, 4, 8, 12)  # corners 0,2,4,6  (S[:,1] == -1 group)
_X_RIGHTG = (2, 6, 10, 14)  # corners 1,3,5,7  (S[:,1] == +1 group)
_X_BOT = (0, 2, 4, 6)  # corners 0..3
_X_TOP = (8, 10, 12, 14)  # corners 4..7


def _hull(ann16: jnp.ndarray) -> jnp.ndarray:
    """[...,16] corner coords -> [...,4] xyxy hull (losses.py:93-107)."""
    xs = ann16[..., 0::2]
    ys = ann16[..., 1::2]
    return jnp.stack(
        [xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)], axis=-1
    )


def _iou_one_vs_all(anchors: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """[A,4] anchors vs [4] box -> [A] IoU (losses.py:5-22)."""
    iw = jnp.clip(
        jnp.minimum(anchors[:, 2], box[2]) - jnp.maximum(anchors[:, 0], box[0]), 0.0
    )
    ih = jnp.clip(
        jnp.minimum(anchors[:, 3], box[3]) - jnp.maximum(anchors[:, 1], box[1]), 0.0
    )
    inter = iw * ih
    area_a = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    area_b = (box[2] - box[0]) * (box[3] - box[1])
    return inter / jnp.clip(area_a + area_b - inter, 1e-8)


def _assign(anchors: jnp.ndarray, ann: jnp.ndarray, valid: jnp.ndarray):
    """Streaming anchor assignment.

    anchors [A,4]; ann [M,21]; valid [M].
    Returns (iou_max [A], argmax [A] int32).
    """
    hulls = _hull(ann[:, :16])  # [M,4]
    a = anchors.shape[0]

    def body(m, carry):
        best, arg = carry
        iou = jnp.where(valid[m], _iou_one_vs_all(anchors, hulls[m]), -1.0)
        better = iou > best
        return jnp.where(better, iou, best), jnp.where(better, m, arg)

    best0 = jnp.full((a,), -1.0, anchors.dtype)
    arg0 = jnp.zeros((a,), jnp.int32)
    return jax.lax.fori_loop(0, ann.shape[0], body, (best0, arg0))


def _compose_corners(reg: jnp.ndarray) -> jnp.ndarray:
    """[...,12] raw regression -> [...,16] anchor-normalized corner coords
    via the +- sign composition (losses.py:310-328)."""
    from playground3d_tpu.models.decode import _SIGNS

    c = reg[..., 0:2]
    lv = reg[..., 2:4]
    wv = reg[..., 4:6]
    hv = reg[..., 6:8]
    S = _SIGNS.astype(reg.dtype)
    corners = (
        c[..., None, :]
        + S[:, 0, None] * lv[..., None, :]
        + S[:, 1, None] * wv[..., None, :]
        + S[:, 2, None] * hv[..., None, :]
    )
    return corners.reshape(corners.shape[:-2] + (16,))


def _axis_vec(t16: jnp.ndarray, plus, minus) -> Tuple[jnp.ndarray, jnp.ndarray]:
    px = sum(t16[..., i] for i in plus) - sum(t16[..., i] for i in minus)
    py = sum(t16[..., i + 1] for i in plus) - sum(t16[..., i + 1] for i in minus)
    return px / 4.0, py / 4.0


def _one_image_loss(cls, reg, ann, anchors, anchor_geom):
    """Losses for one image: cls [A,K], reg [A,12], ann [M,21]."""
    aw, ah, acx, acy = anchor_geom
    valid = ann[:, 20] >= 0

    cls = jnp.clip(cls, CLS_CLAMP, 1.0 - CLS_CLAMP)
    iou_max, iou_arg = _assign(anchors, ann, valid)
    assigned = ann[iou_arg]  # [A,21]

    has_objects = jnp.any(valid)
    positive = (iou_max >= POS_IOU) & has_objects
    negative = (iou_max < NEG_IOU) | ~has_objects
    num_pos = jnp.clip(jnp.sum(positive.astype(jnp.float32)), 1.0)

    # --- focal classification ------------------------------------------------
    k = cls.shape[-1]
    one_hot = jax.nn.one_hot(assigned[:, 20].astype(jnp.int32), k, dtype=cls.dtype)
    targets = jnp.where(positive[:, None], one_hot, 0.0)
    care = (positive | negative)[:, None]

    alpha_f = jnp.where(targets == 1.0, ALPHA, 1.0 - ALPHA)
    focal_w = jnp.where(targets == 1.0, 1.0 - cls, cls)
    bce = -(targets * jnp.log(cls) + (1.0 - targets) * jnp.log(1.0 - cls))
    cls_loss = jnp.where(care, alpha_f * focal_w**GAMMA * bce, 0.0)
    cls_total = cls_loss.sum() / num_pos

    # --- regression ----------------------------------------------------------
    t16 = assigned[:, :16]
    t2d = assigned[:, 16:20]

    # vp-angle terms in raw pixel space (losses.py:214-304)
    def cos_term(reg_vec, plus, minus):
        tx, ty = _axis_vec(t16, plus, minus)
        # eps INSIDE the sqrt: grad of sqrt(x^2+y^2) at 0 is NaN, and the NaN
        # would leak through the positive-mask where() into the total grad
        rn = jnp.sqrt(reg_vec[:, 0] ** 2 + reg_vec[:, 1] ** 2 + 1e-12)
        tn = jnp.sqrt(tx**2 + ty**2 + 1e-12)
        cos = (reg_vec[:, 0] * tx + reg_vec[:, 1] * ty) / (rn * tn)
        return 1.0 - cos

    vp = (
        cos_term(reg[:, 2:4], _X_BACK, _X_FRONT)
        + cos_term(reg[:, 4:6], _X_RIGHTG, _X_LEFTG)
        + cos_term(reg[:, 6:8], _X_BOT, _X_TOP)
    ) / 3.0
    vp_total = jnp.sum(jnp.where(positive, vp, 0.0)) / num_pos

    # corner composition and anchor-normalized targets (losses.py:310-343)
    preds20 = jnp.concatenate([_compose_corners(reg), reg[:, 8:12]], axis=-1)
    t20 = jnp.concatenate([t16, t2d], axis=-1)
    norm_x = (t20[:, 0::2] - acx[:, None]) / aw[:, None]
    norm_y = (t20[:, 1::2] - acy[:, None]) / ah[:, None]
    t20n = jnp.stack([norm_x, norm_y], axis=-1).reshape(t20.shape)

    diff = jnp.abs(t20n - preds20)
    diff = diff.at[:, 8:16].multiply(TOP_WEIGHT)
    sl1 = jnp.where(diff <= SL1_BETA, 0.5 / SL1_BETA * diff**2, diff - 0.5 * SL1_BETA)
    reg_total = jnp.sum(jnp.where(positive[:, None], sl1, 0.0)) / (num_pos * 20.0)

    return cls_total, reg_total, vp_total


@functools.partial(jax.jit, static_argnames=())
def detection_loss(
    classification: jnp.ndarray,  # [B,A,K] sigmoided scores
    regression: jnp.ndarray,  # [B,A,12]
    annotations: jnp.ndarray,  # [B,M,21], class=-1 padding
    anchors: jnp.ndarray,  # [A,4]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batch losses -> (cls, reg, vp) scalars (means over images,
    losses.py:362)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    geom = (aw, ah, acx, acy)

    cls_l, reg_l, vp_l = jax.vmap(
        lambda c, r, a: _one_image_loss(c, r, a, anchors, geom)
    )(classification, regression, annotations)
    return cls_l.mean(), reg_l.mean(), vp_l.mean()
