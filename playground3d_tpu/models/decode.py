"""Fused 12-channel directional box decode.

The regression head predicts, per anchor, 12 values:
  [0:2]  object center (x, y)
  [2:4]  half-length vector  l' (center -> front)
  [4:6]  half-width vector   w' (center -> right)
  [6:8]  half-height vector  h' (center -> top... sign composition below)
  [8:12] 2D box (x1, y1, x2, y2)
all in anchor-normalized coordinates.

The 16 3D-corner coordinates come from the +- composition
  corner = c +- l' +- w' +- h'
with the exact sign pattern of the reference (utils.py:102-149
``BBoxTransform.forward`` — and identically losses.py:310-328, which the
training loss must agree with). All 20 outputs are scaled by anchor
width/height and shifted by the anchor center.

Decoded corner order (utils.py comment at losses.py:187):
  0 fbl, 1 fbr, 2 bbl, 3 bbr, 4 ftl, 5 ftr, 6 btl, 7 btr  — i.e. columns
  0..15 pair into 8 (x,y) corners, then columns 16:20 are the 2D box.

One fused einsum-free elementwise op: XLA tiles it onto the VPU alongside
the surrounding ops; there is no reason for a custom kernel here.
"""

from __future__ import annotations

import jax.numpy as jnp

# sign matrix S [8 corners, 3 vectors]: corner_xy = c + S[k,0]*l' + S[k,1]*w' + S[k,2]*h'
# rows follow reference utils.py:114-131
_SIGNS = jnp.asarray(
    [
        [-1.0, -1.0, 1.0],
        [-1.0, 1.0, 1.0],
        [1.0, -1.0, 1.0],
        [1.0, 1.0, 1.0],
        [-1.0, -1.0, -1.0],
        [-1.0, 1.0, -1.0],
        [1.0, -1.0, -1.0],
        [1.0, 1.0, -1.0],
    ]
)


def decode_regression(regression: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """[..., A, 12] raw regression + [A, 4] xyxy anchors -> [..., A, 20].

    Works for any leading batch dims (images, crops).
    """
    reg = regression
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights

    c = reg[..., 0:2]  # [...,A,2]
    lv = reg[..., 2:4]
    wv = reg[..., 4:6]
    hv = reg[..., 6:8]

    # corners [...,A,8,2] = c + s0*l + s1*w + s2*h
    S = _SIGNS.astype(reg.dtype)
    corners = (
        c[..., None, :]
        + S[:, 0, None] * lv[..., None, :]
        + S[:, 1, None] * wv[..., None, :]
        + S[:, 2, None] * hv[..., None, :]
    )

    # scale to frame coordinates by anchor size, shift by anchor center
    wh = jnp.stack([widths, heights], axis=-1).astype(reg.dtype)  # [A,2]
    cxy = jnp.stack([ctr_x, ctr_y], axis=-1).astype(reg.dtype)  # [A,2]
    corners = corners * wh[:, None, :] + cxy[:, None, :]

    box2d = reg[..., 8:12] * jnp.concatenate([wh, wh], axis=-1) + jnp.concatenate(
        [cxy, cxy], axis=-1
    )

    flat_corners = corners.reshape(corners.shape[:-2] + (16,))
    return jnp.concatenate([flat_corners, box2d], axis=-1)
