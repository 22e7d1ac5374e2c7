"""Homography fitting and the per-camera correspondence registry.

Fitting is offline host-side math (normalized DLT via SVD, numpy float64 —
replacing the reference's ``cv2.findHomography``, homography.py:354-355);
*applying* the transforms is on-device matmul (see
:mod:`playground3d_tpu.geometry.transforms`).

A correspondence (reference homography.py:187-188) per camera is:
  * ``H``     [3,3]  image -> space ground-plane homography
  * ``H_inv`` [3,3]  space -> image
  * ``P``     [3,4]  space (x,y,z,1) -> image projection, built from the
                     columns of ``H_inv`` plus the z-vanishing-point column
                     scaled by 0.01 (reference homography.py:358-371)
  * ``vps``   [3,2]  vanishing points for the space x/y/z axes

:class:`CameraRegistry` stacks correspondences for C cameras into dense
arrays so that per-object camera dispatch is a gather, and the whole registry
ships to device as one pytree. Persistence is ``.npz`` (no pickle).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

__all__ = [
    "fit_homography",
    "build_projection",
    "find_vanishing_point",
    "scale_P_z",
    "CameraRegistry",
]


def _normalization(points: np.ndarray) -> np.ndarray:
    """Similarity transform that zero-means points and scales mean norm to
    sqrt(2) (Hartley normalization for a numerically stable DLT)."""
    centroid = points.mean(axis=0)
    d = np.sqrt(((points - centroid) ** 2).sum(axis=1)).mean()
    s = np.sqrt(2.0) / max(d, 1e-12)
    T = np.array(
        [[s, 0.0, -s * centroid[0]], [0.0, s, -s * centroid[1]], [0.0, 0.0, 1.0]]
    )
    return T


def fit_homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares planar homography H with dst ~ H @ src (both [n,2]).

    Normalized DLT: for each correspondence two rows of the 2n x 9 design
    matrix; H is the right singular vector of the smallest singular value.
    Equivalent to ``cv2.findHomography(src, dst)`` with method=0 (all points,
    no RANSAC), which is what the reference uses (homography.py:354-355).
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    if src.shape[0] < 4:
        raise ValueError("homography fit requires >= 4 correspondences")

    Ts, Td = _normalization(src), _normalization(dst)
    ones = np.ones((src.shape[0], 1))
    s = (np.concatenate([src, ones], axis=1) @ Ts.T)
    d = (np.concatenate([dst, ones], axis=1) @ Td.T)

    n = src.shape[0]
    A = np.zeros((2 * n, 9))
    A[0::2, 0:3] = s
    A[0::2, 6:9] = -d[:, 0:1] * s
    A[1::2, 3:6] = s
    A[1::2, 6:9] = -d[:, 1:2] * s

    _, _, vt = np.linalg.svd(A)
    Hn = vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ Hn @ Ts
    return H / H[2, 2]


def build_projection(H_inv: np.ndarray, vp_z: Sequence[float]) -> np.ndarray:
    """Build the 3x4 projection P from the space->image homography and the
    z-axis vanishing point (reference homography.py:358-371).

    Columns 0,1,3 of P are columns 0,1,2 of H_inv (the ground-plane mapping);
    column 2 is [vp_z_x, vp_z_y, 1] * 0.01, later refined by
    :func:`scale_P_z`.
    """
    P = np.zeros((3, 4))
    P[:, 0] = H_inv[:, 0]
    P[:, 1] = H_inv[:, 1]
    P[:, 3] = H_inv[:, 2]
    P[:, 2] = np.array([vp_z[0], vp_z[1], 1.0]) * 0.01
    return P


def find_vanishing_point(lines: np.ndarray) -> np.ndarray:
    """Best (least sum of squared point-line distances) vanishing point for a
    set of lines [n,4] = (x0,y0,x1,y1).

    The reference grid-searches 31x31 grids refined 10x per iteration
    (homography.py:96-154). Here we solve the equivalent least-squares
    problem in closed form: each line contributes a squared-distance term
    ((dy)x - (dx)y + c)^2 / (dx^2+dy^2); minimizing over (x, y) is a 2x2
    normal-equation solve — exact, vectorized, and O(n).
    """
    lines = np.asarray(lines, dtype=np.float64)
    dx = lines[:, 2] - lines[:, 0]
    dy = lines[:, 3] - lines[:, 1]
    norm2 = dx**2 + dy**2 + 1e-12
    # line: dy*x - dx*y + (dx*y0 - dy*x0) = 0
    a = dy / np.sqrt(norm2)
    b = -dx / np.sqrt(norm2)
    c = (dx * lines[:, 1] - dy * lines[:, 0]) / np.sqrt(norm2)
    # minimize sum (a x + b y + c)^2
    A = np.array([[np.sum(a * a), np.sum(a * b)], [np.sum(a * b), np.sum(b * b)]])
    rhs = -np.array([np.sum(a * c), np.sum(b * c)])
    return np.linalg.solve(A, rhs)


def scale_P_z(
    P: np.ndarray,
    boxes_im: np.ndarray,
    heights: np.ndarray,
    H: np.ndarray,
    granularity: float = 1e-6,
    max_scale: float = 10.0,
) -> np.ndarray:
    """Find the scale C for P's z column minimizing mean reprojection error.

    Mirrors the reference's iterative 10-point grid refinement
    (homography.py:607-666) but evaluates the whole grid vectorized: for each
    candidate C, project im->space->im through (H, P_C) and accumulate the
    top+bottom corner pixel error; shrink the grid around the best C until
    the step is below ``granularity``.

    boxes_im: [d,8,2] labeled image boxes; heights: [d] space heights.
    Returns the new P (copy) with the scaled z column.
    """
    import jax
    import jax.numpy as jnp

    from playground3d_tpu.geometry import transforms as T

    boxes = jnp.asarray(boxes_im, dtype=jnp.float32)
    hts = jnp.asarray(heights, dtype=jnp.float32)
    H_j = jnp.asarray(H, dtype=jnp.float32)
    P_j = jnp.asarray(P, dtype=jnp.float32)

    @jax.jit
    def grid_errors(C_grid: jnp.ndarray) -> jnp.ndarray:
        """[g] candidate scales -> [g] mean top+bottom reprojection errors.

        Vectorized over the whole grid in one call — per-op dispatch to a
        (possibly remote) TPU is expensive, so fitting is a handful of jitted
        calls rather than hundreds of eager ops.
        """
        state = T.im_to_state(boxes, H_j, hts)

        def one(C):
            P_c = P_j.at[:, 2].multiply(C)
            repro = T.state_to_im(state, P_c)
            dist = jnp.sqrt(jnp.sum((boxes - repro) ** 2, axis=-1))
            return dist[:, 0:4].mean() + dist[:, 4:8].mean()

        return jax.vmap(one)(C_grid)

    lower, upper = granularity, max_scale
    grid = np.linspace(lower, upper, num=10)
    step = grid[1] - grid[0]
    best_C = grid[0]
    while step > granularity:
        errs = np.asarray(grid_errors(jnp.asarray(grid, dtype=jnp.float32)))
        best_C = grid[int(np.argmin(errs))]
        grid = np.linspace(best_C - step, best_C + step, num=10)
        step = grid[1] - grid[0]

    P_out = P.copy()
    P_out[:, 2] *= best_C
    return P_out


@dataclass
class CameraRegistry:
    """Stacked per-camera correspondences, gatherable by camera index.

    Two correspondence banks are held per camera — EB and WB — matching the
    reference's ``Homography_Wrapper`` (homography.py:793-862). Single-fit
    cameras simply register the same matrices in both banks.
    """

    names: List[str] = field(default_factory=list)
    H: Optional[np.ndarray] = None  # [C,2,3,3]   bank 0 = EB, bank 1 = WB
    H_inv: Optional[np.ndarray] = None  # [C,2,3,3]
    P: Optional[np.ndarray] = None  # [C,2,3,4]
    vps: Optional[np.ndarray] = None  # [C,2,3,2]

    def index(self, name: str) -> int:
        return self.names.index(name)

    @property
    def num_cameras(self) -> int:
        return len(self.names)

    def add_camera(
        self,
        name: str,
        corr_pts: np.ndarray,
        space_pts: np.ndarray,
        vps: np.ndarray,
        bank: str = "both",
    ) -> None:
        """Fit and register a correspondence for ``name``.

        corr_pts/space_pts: [n,2] matched image/space points; vps: [3,2]
        vanishing points for the space x/y/z axes. ``bank`` selects "eb",
        "wb", or "both".
        """
        Hm = fit_homography(corr_pts, space_pts)
        Hi = fit_homography(space_pts, corr_pts)
        Pm = build_projection(Hi, vps[2])
        self._insert(name, Hm, Hi, Pm, np.asarray(vps, dtype=np.float64), bank)

    def _insert(self, name, Hm, Hi, Pm, vps, bank) -> None:
        if name not in self.names:
            self.names.append(name)
            blank = lambda shape: np.zeros((1,) + shape)
            for attr, shape in (("H", (2, 3, 3)), ("H_inv", (2, 3, 3)), ("P", (2, 3, 4)), ("vps", (2, 3, 2))):
                cur = getattr(self, attr)
                setattr(self, attr, blank(shape) if cur is None else np.concatenate([cur, blank(shape)], axis=0))
        c = self.index(name)
        banks = {"eb": [0], "wb": [1], "both": [0, 1]}[bank]
        for b in banks:
            self.H[c, b] = Hm
            self.H_inv[c, b] = Hi
            self.P[c, b] = Pm
            self.vps[c, b] = vps

    def set_P(self, name: str, P: np.ndarray, bank: str = "both") -> None:
        for b in {"eb": [0], "wb": [1], "both": [0, 1]}[bank]:
            self.P[self.index(name), b] = P

    # device-side access -----------------------------------------------------
    def device_arrays(self, dtype=np.float32) -> Dict[str, np.ndarray]:
        """Dense arrays to ship to device: gather with a camera-index array
        plus a per-object EB/WB bank index to get [d,3,3]/[d,3,4] matrices."""
        return {
            "H": self.H.astype(dtype),
            "H_inv": self.H_inv.astype(dtype),
            "P": self.P.astype(dtype),
        }

    # persistence (npz + json manifest; no pickle) ----------------------------
    def save(self, path: str) -> None:
        np.savez(
            path,
            H=self.H,
            H_inv=self.H_inv,
            P=self.P,
            vps=self.vps,
            names=json.dumps(self.names),
        )

    @classmethod
    def load(cls, path: str) -> "CameraRegistry":
        z = np.load(path, allow_pickle=False)
        return cls(
            names=json.loads(str(z["names"])),
            H=z["H"],
            H_inv=z["H_inv"],
            P=z["P"],
            vps=z["vps"],
        )
