"""Batched IoU primitives (XLA, fully vectorized).

Replaces the reference's assorted IoU helpers: ``calc_iou`` (losses.py:5-22),
``md_iou`` (MC3D_crop_tracker.py:1030-1049), and the O(n^2) python double
loops in the evaluator (mot_evaluator.py:219-222).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pairwise_iou", "elementwise_iou"]


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[n,4] x [m,4] xyxy boxes -> [n,m] IoU matrix.

    Matches reference ``calc_iou`` (losses.py:5-22): intersection clamped at
    0, union clamped at eps.
    """
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    iw = jnp.minimum(a[:, None, 2], b[None, :, 2]) - jnp.maximum(a[:, None, 0], b[None, :, 0])
    ih = jnp.minimum(a[:, None, 3], b[None, :, 3]) - jnp.maximum(a[:, None, 1], b[None, :, 1])
    iw = jnp.clip(iw, 0.0)
    ih = jnp.clip(ih, 0.0)
    inter = iw * ih
    union = jnp.clip(area_a[:, None] + area_b[None, :] - inter, eps)
    return inter / union


def elementwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[...,4] x [...,4] xyxy boxes -> [...] IoU, broadcasting elementwise
    (reference ``md_iou``, MC3D_crop_tracker.py:1030-1049)."""
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    iw = jnp.clip(jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]), 0.0)
    ih = jnp.clip(jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]), 0.0)
    inter = iw * ih
    union = area_a + area_b - inter
    return inter / jnp.where(union > 0, union, 1.0)
