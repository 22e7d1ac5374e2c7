"""Batched crop-and-resize (bilinear ROI align) — XLA gather formulation.

TPU-native replacement for ``torchvision.ops.roi_align`` as used by the
crop re-detection loop (reference MC3D_crop_tracker.py:1185: 112x112 crops of
tracked objects, each taken from the frame of its assigned camera).

The output grid samples the box at bin centers with bilinear interpolation —
equivalent to roi_align with sampling_ratio=1, aligned=True (half-pixel
centers). One gather of 4*out_h*out_w points per crop; XLA lowers this to a
single fused gather + FMA, which is bandwidth-optimal for this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["crop_and_resize"]


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_and_resize(
    frames: jnp.ndarray,  # [C,H,W,ch] (NHWC)
    boxes: jnp.ndarray,  # [n,4] xyxy in pixel coords
    frame_idx: jnp.ndarray,  # [n] int — which frame each box crops from
    out_size: int = 112,
) -> jnp.ndarray:
    """Returns [n, out_size, out_size, ch] bilinear crops."""
    H, W = frames.shape[1], frames.shape[2]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = (x2 - x1) / out_size
    bh = (y2 - y1) / out_size

    j = jnp.arange(out_size, dtype=boxes.dtype)
    # bin-center sample coordinates, half-pixel convention; clamped to the
    # frame so out-of-bounds samples replicate the border (clamping indices
    # alone would blend pixels 0/1 with a stale fractional weight)
    xs = x1[:, None] + (j[None, :] + 0.5) * bw[:, None] - 0.5  # [n,S]
    ys = y1[:, None] + (j[None, :] + 0.5) * bh[:, None] - 0.5  # [n,S]
    xs = jnp.clip(xs, 0.0, W - 1.0)
    ys = jnp.clip(ys, 0.0, H - 1.0)

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    # values at the 4 neighbors, each [n,S,S,ch]
    def gather(yi, xi):
        # yi [n,S] rows, xi [n,S] cols -> [n,S,S,ch]
        return frames[frame_idx[:, None, None], yi[:, :, None], xi[:, None, :], :]

    p00 = gather(y0i, x0i)
    p01 = gather(y0i, x1i)
    p10 = gather(y1i, x0i)
    p11 = gather(y1i, x1i)

    wx = fx[:, None, :, None]  # [n,1,S,1]
    wy = fy[:, :, None, None]  # [n,S,1,1]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy
