"""Device-side camera bank: per-object homography dispatch as gathers.

Wraps the stacked correspondence arrays from
:class:`playground3d_tpu.geometry.homography.CameraRegistry` for use inside
jitted tracker steps: each detection carries a camera index; its H/P
matrices are gathered, and the EB/WB dual-correspondence selection
(reference Homography_Wrapper, homography.py:793-862) happens per object on
roadway y.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from playground3d_tpu.geometry import transforms as T
from playground3d_tpu.utils.constants import EB_WB_Y_SPLIT_FT


class CameraBank(NamedTuple):
    H: jnp.ndarray  # [C,2,3,3]  image->space; bank 0 EB, 1 WB
    P: jnp.ndarray  # [C,2,3,4]  space->image
    # optional per-camera ignore-region grid (reference ignored_regions/*,
    # corrected_3D_dataset.py:53-63): [C,GH,GW] bool, cell size ignore_cell px
    ignore: jnp.ndarray = None
    ignore_cell: float = 8.0


def bank_from_registry(registry, ignore_polygons=None, image_hw=(1080, 1920), ignore_cell=8) -> CameraBank:
    arrs = registry.device_arrays(np.float32)
    ignore = None
    if ignore_polygons:
        from playground3d_tpu.data.regions import ignore_grid

        ignore = jnp.asarray(
            ignore_grid(
                ignore_polygons, registry.names, image_hw[0], image_hw[1], ignore_cell
            )
        )
    return CameraBank(
        H=jnp.asarray(arrs["H"]), P=jnp.asarray(arrs["P"]),
        ignore=ignore, ignore_cell=float(ignore_cell),
    )


def ignore_hits(bank: CameraBank, centers_px: jnp.ndarray, cam_idx: jnp.ndarray) -> jnp.ndarray:
    """[n,2] box centers (px) + [n] camera indices -> bool [n]: True where
    the center falls in the camera's ignored region. All-False without a
    grid."""
    if bank.ignore is None:
        return jnp.zeros(centers_px.shape[0], bool)
    gh, gw = bank.ignore.shape[1], bank.ignore.shape[2]
    cx = jnp.clip((centers_px[:, 0] / bank.ignore_cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((centers_px[:, 1] / bank.ignore_cell).astype(jnp.int32), 0, gh - 1)
    return bank.ignore[cam_idx, cy, cx]


def im_to_state_banked(
    bank: CameraBank, points: jnp.ndarray, cam_idx: jnp.ndarray, heights: jnp.ndarray
) -> jnp.ndarray:
    """[d,8,2] image corners + [d] camera indices -> [d,6] state with per-
    object EB/WB selection: where the EB-projected space y of corner 0
    exceeds 60 ft use the WB homography instead (reference
    homography.py:840-847). The dispatch needs only corner 0's EB
    projection, so the selected matrix is gathered and the 8 corners are
    projected ONCE (vs projecting through both banks and masking)."""
    H_eb = bank.H[cam_idx, 0]
    y0 = T._apply_h(points[:, 0:1, :], H_eb)[:, 0, 1]
    use_wb = (y0 > EB_WB_Y_SPLIT_FT).astype(jnp.int32)
    H = bank.H[cam_idx, use_wb]
    return T.space_to_state(T.im_to_space(points, H, heights))


def im_to_state_refined(
    bank: CameraBank, points: jnp.ndarray, cam_idx: jnp.ndarray, heights: jnp.ndarray
) -> jnp.ndarray:
    """im_to_state_banked with the reference's two-pass height refinement
    (minimal_3D_track.py:486-490) folded into ONE projection pass.

    ``im_to_space`` projects all 8 corners through the ground-plane
    homography regardless of height (the height enters only as the top
    corners' z), and ``space_to_state``'s height column is exactly that z —
    so re-running the projection with the refined heights equals the first
    pass with column 4 swapped. Bitwise-equal to the two-pass form
    (MC3D_crop_tracker.py:1217-1227) at one projection instead of two."""
    state = im_to_state_banked(bank, points, cam_idx, heights)
    refined = refine_heights_banked(bank, state, cam_idx, points, heights)
    # guard degenerate refinements (zero pixel height)
    refined = jnp.where(jnp.isfinite(refined) & (refined > 0.5), refined, heights)
    return state.at[:, 4].set(refined)


def state_to_im_banked(
    bank: CameraBank, state: jnp.ndarray, cam_idx: jnp.ndarray
) -> jnp.ndarray:
    """[d,s] states + [d] camera indices -> [d,8,2], WB bank where state
    y > 60 ft (reference homography.py:849-856); the selected projection
    matrix is gathered so the corners are projected once."""
    use_wb = (state[:, 1] > EB_WB_Y_SPLIT_FT).astype(jnp.int32)
    P = bank.P[cam_idx, use_wb]
    return T.space_to_im(T.state_to_space(state), P)


def refine_heights_banked(
    bank: CameraBank,
    state: jnp.ndarray,
    cam_idx: jnp.ndarray,
    im_corners: jnp.ndarray,
    heights: jnp.ndarray,
) -> jnp.ndarray:
    """Two-pass height refinement (reference minimal_3D_track.py:486-490):
    reproject the guessed-height state to the image, scale the class-prior
    height by observed/reprojected pixel-height ratio."""
    repro = state_to_im_banked(bank, state, cam_idx)
    return T.height_from_template(repro, heights, im_corners)
