"""Pure-JAX coordinate transforms: image <-> space (roadway plane) <-> state.

All functions are shape-polymorphic over a leading object dimension ``d`` and
jit/vmap friendly (no data-dependent shapes). Per-object camera matrices are
supported by passing ``H``/``P`` with a leading object dimension (``[d,3,3]``
/ ``[d,3,4]``); a single shared camera uses the unbatched ``[3,3]``/``[3,4]``
forms.

Reference semantics reproduced (file:line in /root/reference):
  * ``space_to_state``  — homography.py:274-303  (i24_space_to_state)
  * ``state_to_space``  — homography.py:305-320  (i24_state_to_space)
  * ``im_to_space``     — homography.py:388-435
  * ``space_to_im``     — homography.py:438-476
  * ``height_from_template`` — homography.py:519-551
  * EB/WB dual-homography dispatch at y > 60 ft — homography.py:840-862
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny (3x3 / 3x4) but operate on ~1e3-magnitude pixel
# and roadway coordinates; the TPU's default matmul precision (bf16 passes)
# would cost ~0.4% relative error (= several px / ft). Pin full fp32.
_PRECISION = jax.lax.Precision.HIGHEST

from playground3d_tpu.utils.constants import EB_WB_Y_SPLIT_FT

__all__ = [
    "space_to_state",
    "state_to_space",
    "im_to_space",
    "space_to_im",
    "im_to_state",
    "state_to_im",
    "height_from_template",
    "select_eb_wb",
    "space_footprint_xyxy",
    "im_hull_xyxy",
]


def space_to_state(points: jnp.ndarray) -> jnp.ndarray:
    """[d,8,3] space corners -> [d,6] state [x,y,l,w,h,dir].

    x = mean x of the two bottom-rear corners; y = mean y of the four bottom
    corners; l/w/h = averaged absolute extents; dir = sign of (front - back)
    along x. (reference homography.py:274-303)
    """
    p = points
    x = (p[:, 2, 0] + p[:, 3, 0]) / 2.0
    y = (p[:, 0, 1] + p[:, 1, 1] + p[:, 2, 1] + p[:, 3, 1]) / 4.0
    front_minus_back = ((p[:, 0, 0] + p[:, 1, 0]) - (p[:, 2, 0] + p[:, 3, 0])) / 2.0
    length = jnp.abs(front_minus_back)
    width = jnp.abs(((p[:, 0, 1] + p[:, 2, 1]) - (p[:, 1, 1] + p[:, 3, 1])) / 2.0)
    height = jnp.mean(jnp.abs(p[:, 0:4, 2] - p[:, 4:8, 2]), axis=1)
    direction = jnp.sign(front_minus_back)
    return jnp.stack([x, y, length, width, height, direction], axis=1)


def state_to_space(state: jnp.ndarray) -> jnp.ndarray:
    """[d,s>=6] state [x,y,l,w,h,dir,(v)] -> [d,8,3] space corners.

    Corner order fbr,fbl,bbr,bbl,ftr,ftl,btr,btl; top corners carry z = -h
    (reference homography.py:305-320).
    """
    x, y, l, w, h, d = (state[:, i] for i in range(6))
    x_front = x + d * l
    x_back = x
    y_right = y - d * w / 2.0  # corners 0,2,4,6
    y_left = y + d * w / 2.0  # corners 1,3,5,7
    zeros = jnp.zeros_like(x)
    z_top = -h

    xs = jnp.stack([x_front, x_front, x_back, x_back, x_front, x_front, x_back, x_back], 1)
    ys = jnp.stack([y_right, y_left, y_right, y_left, y_right, y_left, y_right, y_left], 1)
    zs = jnp.stack([zeros, zeros, zeros, zeros, z_top, z_top, z_top, z_top], 1)
    return jnp.stack([xs, ys, zs], axis=2)


def _apply_h(points_xy: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Apply 3x3 planar homography to [d,m,2] points -> [d,m,2].

    ``H`` is [3,3] (shared) or [d,3,3] (per object).
    """
    ones = jnp.ones(points_xy.shape[:-1] + (1,), dtype=points_xy.dtype)
    homo = jnp.concatenate([points_xy, ones], axis=-1)  # [d,m,3]
    if H.ndim == 2:
        out = jnp.einsum("dmj,kj->dmk", homo, H, precision=_PRECISION)
    else:
        out = jnp.einsum("dmj,dkj->dmk", homo, H, precision=_PRECISION)
    return out[..., :2] / out[..., 2:3]


def im_to_space(points: jnp.ndarray, H: jnp.ndarray, heights: jnp.ndarray) -> jnp.ndarray:
    """[d,8,2] image corners + heights [d] -> [d,8,3] space corners.

    Bottom corners are projected through the ground-plane homography ``H``
    (image -> space); top corners get z = height.  NOTE: like the reference
    (homography.py:404-429), *all 8* image points are projected through the
    ground plane; the top corners' x/y are therefore where the rays hit the
    ground, and only their z carries the height.
    """
    flat = _apply_h(points, H)  # [d,8,2]
    d = points.shape[0]
    z = jnp.zeros((d, 8), dtype=flat.dtype)
    z = z.at[:, 4:8].set(heights[:, None].astype(flat.dtype))
    return jnp.concatenate([flat, z[..., None]], axis=2)


def space_to_im(points: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """[d,m,3] space points -> [d,m,2] image pixels via 3x4 projection ``P``.

    ``P`` is [3,4] (shared) or [d,3,4] (per object).
    (reference homography.py:438-476)
    """
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    homo = jnp.concatenate([points, ones], axis=-1)  # [d,m,4]
    if P.ndim == 2:
        out = jnp.einsum("dmj,kj->dmk", homo, P, precision=_PRECISION)
    else:
        out = jnp.einsum("dmj,dkj->dmk", homo, P, precision=_PRECISION)
    return out[..., :2] / out[..., 2:3]


def im_to_state(points: jnp.ndarray, H: jnp.ndarray, heights: jnp.ndarray) -> jnp.ndarray:
    """[d,8,2] image corners -> [d,6] state. (reference homography.py:491-500)"""
    return space_to_state(im_to_space(points, H, heights))


def state_to_im(state: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """[d,s] state -> [d,8,2] image corners. (reference homography.py:479-488)"""
    return space_to_im(state_to_space(state), P)


def height_from_template(
    template_boxes: jnp.ndarray,
    template_space_heights: jnp.ndarray,
    boxes: jnp.ndarray,
) -> jnp.ndarray:
    """Refine per-object space heights from image-pixel heights.

    Uses the proportionality template_im_height : template_space_height ==
    box_im_height : box_space_height. All boxes are [d,8,2] image corners.
    (reference homography.py:519-551; note the reference sums the per-axis
    |top-bottom| components — sum of |dx| and |dy| — not the L2 norm.)
    """
    t_top = jnp.mean(template_boxes[:, 4:8, :], axis=1)
    t_bot = jnp.mean(template_boxes[:, 0:4, :], axis=1)
    t_im_h = jnp.sum(jnp.sqrt((t_top - t_bot) ** 2), axis=1)
    ratio = t_im_h / template_space_heights

    b_top = jnp.mean(boxes[:, 4:8, :], axis=1)
    b_bot = jnp.mean(boxes[:, 0:4, :], axis=1)
    b_im_h = jnp.sum(jnp.sqrt((b_top - b_bot) ** 2), axis=1)
    return b_im_h / ratio


def select_eb_wb(y: jnp.ndarray, eb_value: jnp.ndarray, wb_value: jnp.ndarray) -> jnp.ndarray:
    """Per-object EB/WB dual-correspondence dispatch on roadway y.

    ``y`` is [d]; values are [d,...]; WB is used where y > 60 ft
    (reference homography.py:845,854).
    """
    mask = (y > EB_WB_Y_SPLIT_FT).reshape((-1,) + (1,) * (eb_value.ndim - 1))
    return jnp.where(mask, wb_value, eb_value)


def space_footprint_xyxy(space_boxes: jnp.ndarray) -> jnp.ndarray:
    """[d,8,3] space corners -> [d,4] axis-aligned ground footprint
    (xmin,ymin,xmax,ymax) over the 4 bottom corners — the form used for
    roadway-plane IoU everywhere in the reference (e.g.
    minimal_3D_track.py:528-534)."""
    bottom = space_boxes[:, 0:4, :2]
    mins = jnp.min(bottom, axis=1)
    maxs = jnp.max(bottom, axis=1)
    return jnp.concatenate([mins, maxs], axis=1)


def im_hull_xyxy(im_boxes: jnp.ndarray) -> jnp.ndarray:
    """[d,8,2] image corners -> [d,4] 2D hull (xmin,ymin,xmax,ymax)
    (reference minimal_3D_track.py:509-514)."""
    mins = jnp.min(im_boxes, axis=1)
    maxs = jnp.max(im_boxes, axis=1)
    return jnp.concatenate([mins, maxs], axis=1)
