"""Pallas TPU kernel: batched bilinear crop-and-resize.

The XLA formulation in :mod:`playground3d_tpu.ops.roi_align` builds four
[n, S, S, ch] advanced-indexing gathers; XLA lowers those to generic gather
HLOs that move each sample point through HBM individually. This kernel
instead processes one crop per grid step: it DMAs only the frame *rows* the
crop touches into VMEM (dynamic row slice via scalar prefetch), then does
the column gather + bilinear blend on-chip.

Grid: one program per crop. Scalar-prefetch operands carry the per-crop
frame index and box, so the input BlockSpec can select the right frame and
row window before the kernel body runs (pltpu.PrefetchScalarGridSpec).

Falls back transparently to the XLA path when Pallas is unavailable (CPU
tests run with interpret=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["crop_and_resize_pallas"]


def _crop_kernel(cols_ref, wy_ref, wx_ref, rows_ref, out_ref):
    """One crop per program. Block shapes (leading dim = this crop):
    cols [1,2,S] int32; wy/wx [1,1,S]; rows [1,2S,W,ch]; out [1,S,S,ch].
    """
    S = out_ref.shape[1]

    cols0 = cols_ref[0, 0, :]  # [S] x0 indices
    cols1 = cols_ref[0, 1, :]  # [S] x1 indices
    fx = wx_ref[0, 0, :]  # [S]
    fy = wy_ref[0, 0, :]  # [S]

    r0 = rows_ref[0, 0:S]  # [S, W, ch] y0 row per output row
    r1 = rows_ref[0, S : 2 * S]

    # column gathers: [S, S, ch]
    p00 = jnp.take(r0, cols0, axis=1)
    p01 = jnp.take(r0, cols1, axis=1)
    p10 = jnp.take(r1, cols0, axis=1)
    p11 = jnp.take(r1, cols1, axis=1)

    wx = fx[None, :, None]
    wy = fy[:, None, None]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    out_ref[0, :, :, :] = top * (1 - wy) + bot * wy


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def crop_and_resize_pallas(
    frames: jnp.ndarray,  # [C,H,W,ch]
    boxes: jnp.ndarray,  # [n,4] xyxy
    frame_idx: jnp.ndarray,  # [n] int32
    out_size: int = 112,
    interpret: bool = False,
) -> jnp.ndarray:
    """[n, out_size, out_size, ch] bilinear crops (one grid step per crop)."""
    C, H, W, ch = frames.shape
    n = boxes.shape[0]
    S = out_size

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = (x2 - x1) / S
    bh = (y2 - y1) / S
    j = jnp.arange(S, dtype=boxes.dtype)
    xs = x1[:, None] + (j[None, :] + 0.5) * bw[:, None] - 0.5  # [n,S]
    ys = y1[:, None] + (j[None, :] + 0.5) * bh[:, None] - 0.5
    # border-replicating clamp (must match ops/roi_align.py)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    ys = jnp.clip(ys, 0.0, H - 1.0)

    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = (xs - x0f).astype(frames.dtype)
    fy = (ys - y0f).astype(frames.dtype)
    x0i = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    # flatten frames to [C*H, W, ch] so the row gather is (frame, row) -> row
    flat = frames.reshape(C * H, W, ch)
    base = frame_idx[:, None] * H  # [n,1]
    row_idx = jnp.concatenate([base + y0i, base + y1i], axis=1)  # [n, 2S]
    cols = jnp.stack([x0i, x1i], axis=1)  # [n, 2, S]

    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            # per-crop column indices and weights, one row per program
            pl.BlockSpec((1, 2, S), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0)),
            # the 2S frame rows this crop touches: gathered outside and
            # blocked per program
            pl.BlockSpec((1, 2 * S, W, ch), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, S, ch), lambda i: (i, 0, 0, 0)),
    )

    # pre-gather the row windows [n, 2S, W, ch]: a contiguous-row DMA per
    # crop (XLA lowers a take along the leading axis to efficient dynamic
    # slices), leaving only column gathers + blends for the kernel
    rows = jnp.take(flat, row_idx, axis=0)  # [n, 2S, W, ch]

    out = pl.pallas_call(
        _crop_kernel,
        out_shape=jax.ShapeDtypeStruct((n, S, S, ch), frames.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cols, fy[:, None, :], fx[:, None, :], rows)
    return out
