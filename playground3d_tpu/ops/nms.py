"""Masked fixed-capacity non-maximum suppression (XLA).

TPU-native replacement for ``torchvision.ops.nms`` (used at reference
model.py:56,336,383 and MC3D_crop_tracker.py:507,614,634). Dynamic survivor
counts are replaced by a fixed ``max_keep`` and a validity mask; suppression
runs as a bounded ``lax.scan`` of argmax-select / suppress rounds, entirely
on device.

Per-class / per-group NMS uses the same coordinate-offset trick as the
reference's ``batched_nms`` (model.py:49-56).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from playground3d_tpu.ops.iou import pairwise_iou

__all__ = ["nms", "batched_nms"]

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("max_keep",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    iou_threshold: float,
    max_keep: int = 100,
):
    """Greedy score-ordered NMS.

    boxes  [N,4] xyxy; scores [N]; mask [N] valid flags.
    Returns (keep_idx [max_keep] int32, keep_mask [max_keep] bool) — the
    selected indices in decreasing-score order, padded with 0s where
    keep_mask is False. Semantics match torchvision ``nms``: a box is
    suppressed iff IoU with an already-kept higher-scoring box > threshold.

    Each of the ``max_keep`` rounds picks the live argmax and kills every box
    with IoU > threshold against it — O(max_keep * N) vectorized work with no
    data-dependent shapes.
    """
    n = boxes.shape[0]
    live_scores = jnp.where(mask, scores, NEG_INF)

    def body(carry, _):
        live = carry
        i = jnp.argmax(live)
        valid = live[i] > NEG_INF / 2
        ref = boxes[i][None, :]
        iou_row = pairwise_iou(ref, boxes)[0]  # [N]
        kill = (iou_row > iou_threshold) | (
            jnp.arange(n) == i
        )  # self is consumed too
        live = jnp.where(valid & kill, NEG_INF, live)
        return live, (jnp.where(valid, i, 0).astype(jnp.int32), valid)

    _, (keep_idx, keep_mask) = jax.lax.scan(body, live_scores, None, length=max_keep)
    return keep_idx, keep_mask


@functools.partial(jax.jit, static_argnames=("max_keep",))
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    groups: jnp.ndarray,
    mask: jnp.ndarray,
    iou_threshold: float,
    max_keep: int = 100,
):
    """Per-group NMS via coordinate offsets (reference model.py:49-56).

    ``groups`` [N] int — boxes in different groups never suppress each other
    (group = class id, or camera index for the multi-camera tracker).
    """
    max_c = jnp.max(jnp.where(mask, jnp.max(boxes, axis=1), 0.0))
    offset = groups.astype(boxes.dtype) * (max_c + 1.0)
    shifted = boxes + offset[:, None]
    return nms(shifted, scores, mask, iou_threshold, max_keep=max_keep)
