"""MXU-native crop-and-resize over space-to-depth-packed frames.

TPU replacement for the crop branch's roi_align (reference
MC3D_crop_tracker.py:1185). The XLA gather formulation
(:mod:`playground3d_tpu.ops.roi_align`) issues ~4*S*S point gathers per crop,
which XLA lowers to scalar HBM gathers (measured 61 ms for 64 crops from
4x1080p). This module avoids point gathers entirely:

1. frames stay in the host-packed s2d layout [C, H/4, W/4, 48] the detector
   already uses (no [H,W,3] lane-padded tensors on the hot path);
2. an on-device **pyramid** (2x2 pixel average pooling expressed as a
   stride-2 conv with a constant 48->48 kernel — pure MXU) bounds every
   crop to a fixed window;
3. each crop's window is one `lax.dynamic_slice` (a block DMA, not a point
   gather) from the level whose scale fits;
4. bilinear resampling is two separable **interpolation matmuls**
   (out = Wy @ window @ Wx^T per channel) — dense MXU work instead of
   gathers. Weight matrices have 2 non-zeros per row, exactly bilinear.

Output layouts: "s2d" [n,S/4,S/4,48] feeds the crop detector directly,
"hwc"/"chw" for tests and visualization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["crop_and_resize_s2d", "s2d_halve"]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _halve_kernel() -> np.ndarray:
    """Constant [2,2,48,48] conv kernel: 2x2 stride-2 conv over s2d cells ==
    2x2 pixel average pool of the underlying image, staying packed."""
    k = np.zeros((2, 2, 48, 48), np.float32)
    for byo in range(4):
        for bxo in range(4):
            for c in range(3):
                co = byo * 12 + bxo * 3 + c
                for ry in range(2):
                    for rx in range(2):
                        iy, ix = 2 * byo + ry, 2 * bxo + rx
                        ky, byi = divmod(iy, 4)
                        kx, bxi = divmod(ix, 4)
                        k[ky, kx, byi * 12 + bxi * 3 + c, co] += 0.25
    return k


@functools.partial(jax.jit, static_argnames=("dtype",))
def s2d_halve(frames: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[C,Hs,Ws,48] s2d frames -> half-resolution s2d frames
    [C,Hs//2,Ws//2,48] (2x2 pixel box filter), one small MXU conv."""
    k = jnp.asarray(_halve_kernel(), dtype)
    x = frames.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


def _unpack_chw(window: jnp.ndarray) -> jnp.ndarray:
    """s2d window [n,hc,wc,48] -> pixel tensor [n,3,hc*4,wc*4]."""
    n, hc, wc, _ = window.shape
    x = window.reshape(n, hc, wc, 4, 4, 3)
    x = x.transpose(0, 5, 1, 3, 2, 4)  # n, c, hc, by, wc, bx
    return x.reshape(n, 3, hc * 4, wc * 4)


def max_crop_span_s2d(win_cells: int = 64, n_levels: int = 3) -> float:
    """Largest box span (px) :func:`crop_and_resize_s2d` can represent at the
    given window/pyramid config; larger boxes must be clamped by the caller
    (see the level-selection note in the kernel)."""
    return float((win_cells * 4 - 8) * 2 ** (n_levels - 1))


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "win_cells", "n_levels", "layout", "dtype", "normalize"),
)
def crop_and_resize_s2d(
    frames_s2d: jnp.ndarray,  # [C, Hs, Ws, 48] uint8 or float s2d-packed
    boxes: jnp.ndarray,  # [n,4] xyxy in PIXEL coords (level 0)
    cam_idx: jnp.ndarray,  # [n] int32
    out_size: int = 112,
    win_cells: int = 64,
    n_levels: int = 3,
    layout: str = "s2d",
    dtype=jnp.bfloat16,
    normalize: bool = False,
) -> jnp.ndarray:
    """Bilinear crops from s2d-packed frames (see module docstring).

    Crops whose pixel extent exceeds the window (win_cells*4 px) sample from
    a 2x-downscaled pyramid level — pre-filtered subsampling, at least as
    good as strided bilinear for large boxes. Level-0 crops match
    :func:`playground3d_tpu.ops.roi_align.crop_and_resize` numerics (up to
    the compute dtype).

    ``normalize=True`` applies ImageNet normalization after cropping
    (uint8 frame transport; colors repeat every 3 s2d channels).
    """
    C, Hs, Ws, ch = frames_s2d.shape
    assert ch == 48, "expects s2d-packed frames [C,H/4,W/4,48]"
    n = boxes.shape[0]
    S = out_size
    win_px = win_cells * 4
    cap = float(win_px - 8)  # sample span must fit the window + cell slack

    # ---- pyramid (level k = 2^k downscale), padded to common cell width ----
    levels = [frames_s2d.astype(dtype)]
    for _ in range(n_levels - 1):
        levels.append(s2d_halve(levels[-1], dtype=dtype))
    wp = max(max(l.shape[2] for l in levels), win_cells)
    flat_parts, bases, hp_list, hl_list, wl_list = [], [], [], [], []
    base = 0
    for l in levels:
        hl, wl = l.shape[1], l.shape[2]
        hp = max(hl, win_cells)
        l = jnp.pad(l, ((0, 0), (0, hp - hl), (0, wp - wl), (0, 0)))
        flat_parts.append(l.reshape(C * hp, wp, ch))
        bases.append(base)
        hp_list.append(hp)
        hl_list.append(hl)
        wl_list.append(wl)
        base += C * hp
    flat = jnp.concatenate(flat_parts, axis=0)  # [Rtot, wp, 48]
    bases = jnp.asarray(bases, jnp.int32)
    hps = jnp.asarray(hp_list, jnp.int32)
    h_px = jnp.asarray([h * 4 for h in hl_list], jnp.float32)  # valid px
    w_px = jnp.asarray([w * 4 for w in wl_list], jnp.float32)

    # ---- per-crop level selection ----
    # NOTE: a box bigger than the coarsest level's window
    # (cap * 2^(n_levels-1) = 992 px at defaults) cannot be represented:
    # samples past the window get all-zero bilinear weights and the crop's
    # far rows/columns silently come out black. Callers must clamp their
    # box span to ``max_crop_span_s2d()`` BEFORE building the local->global
    # coordinate mapping (make_crop_step does) — the kernel cannot shrink
    # boxes itself without desynchronizing that mapping.
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    span = jnp.maximum(jnp.maximum(x2 - x1, y2 - y1), 1.0)
    level = jnp.clip(
        jnp.ceil(jnp.log2(span / cap)).astype(jnp.int32), 0, n_levels - 1
    )
    ls = jnp.exp2(level.astype(jnp.float32))  # 2^level

    # ---- sample coordinates in level-pixel space (roi_align convention) ----
    j = jnp.arange(S, dtype=jnp.float32)
    bw = (x2 - x1) / S / ls
    bh = (y2 - y1) / S / ls
    xs = x1[:, None] / ls[:, None] + (j[None, :] + 0.5) * bw[:, None] - 0.5
    ys = y1[:, None] / ls[:, None] + (j[None, :] + 0.5) * bh[:, None] - 0.5
    xs = jnp.clip(xs, 0.0, w_px[level][:, None] - 1.0)  # border replicate
    ys = jnp.clip(ys, 0.0, h_px[level][:, None] - 1.0)

    # ---- window origin (cell-aligned) and row index into flat ----
    def origin(smin, n_valid_cells):
        c0 = jnp.floor(smin / 4.0).astype(jnp.int32)
        return jnp.clip(c0, 0, jnp.maximum(n_valid_cells - win_cells, 0))

    hl_cells = jnp.asarray(hl_list, jnp.int32)[level]
    wl_cells = jnp.asarray(wl_list, jnp.int32)[level]
    cy0 = origin(ys[:, 0], hl_cells)
    cx0 = origin(xs[:, 0], wl_cells)
    r0 = bases[level] + cam_idx.astype(jnp.int32) * hps[level] + cy0

    # ---- block DMA per crop (dynamic_slice, not a point gather) ----
    # statically unrolled: vmap(dynamic_slice) lowers to a sequential
    # `while` on TPU (measured 0.26 ms for 32 crops in the device profile
    # — loop overhead, not DMA); n independent slice ops let the scheduler
    # overlap the block DMAs, and n is small and static here
    if n <= 64:
        windows = jnp.stack(
            [
                jax.lax.dynamic_slice(
                    flat, (r0[i], cx0[i], 0), (win_cells, win_cells, ch)
                )
                for i in range(n)
            ]
        )
    else:
        windows = jax.vmap(
            lambda r, c: jax.lax.dynamic_slice(
                flat, (r, c, 0), (win_cells, win_cells, ch)
            )
        )(r0, cx0)  # [n, win, win, 48]
    pix = _unpack_chw(windows)  # [n, 3, win_px, win_px]

    if normalize:
        mean = jnp.asarray(_IMAGENET_MEAN, dtype).reshape(1, 3, 1, 1)
        std = jnp.asarray(_IMAGENET_STD, dtype).reshape(1, 3, 1, 1)
        pix = (pix / jnp.asarray(255.0, dtype) - mean) / std

    # ---- separable bilinear as two matmuls (weights built in f32) ----
    yr = ys - (cy0[:, None] * 4).astype(jnp.float32)
    xr = xs - (cx0[:, None] * 4).astype(jnp.float32)
    grid = jnp.arange(win_px, dtype=jnp.float32)
    wy = jnp.clip(1.0 - jnp.abs(yr[:, :, None] - grid), 0.0, 1.0).astype(dtype)
    wx = jnp.clip(1.0 - jnp.abs(xr[:, :, None] - grid), 0.0, 1.0).astype(dtype)

    t1 = jnp.einsum("nsy,ncyx->ncsx", wy, pix, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "ntx,ncsx->ncst", wx, t1.astype(dtype), preferred_element_type=jnp.float32
    )  # [n, 3, S, S]
    out = out.astype(jnp.float32)

    if layout == "chw":
        return out
    if layout == "hwc":
        return out.transpose(0, 2, 3, 1)
    assert layout == "s2d" and S % 4 == 0
    x = out.reshape(n, 3, S // 4, 4, S // 4, 4)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # n, hc, wc, by, bx, c
    return x.reshape(n, S // 4, S // 4, 48)
