"""Headless visualization: 3D box overlays and roadway-plane plots.

The reference plots with cv2 windows (homography.py:670-714 ``plot_boxes``,
trackers' live overlays). Without a display or cv2 this renders overlays
directly into numpy frames (line rasterization) and writes PNGs, with an
optional matplotlib backend for roadway ("bird's eye") plots.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# edges of the 3D box in the 8-corner order fbr,fbl,bbr,bbl,ftr,ftl,btr,btl
BOX_EDGES = [
    (0, 1), (2, 3), (0, 2), (1, 3),  # bottom face
    (4, 5), (6, 7), (4, 6), (5, 7),  # top face
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
]


def draw_line(frame: np.ndarray, p0, p1, color, thickness: int = 1) -> None:
    """Bresenham-ish line into [H,W,3] float frame (in place)."""
    h, w = frame.shape[:2]
    x0, y0, x1, y1 = float(p0[0]), float(p0[1]), float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    for t in range(-(thickness // 2), thickness - thickness // 2):
        xi = np.round(xs).astype(int)
        yi = np.round(ys + t).astype(int)
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        frame[yi[ok], xi[ok]] = color


def plot_boxes(
    frame: np.ndarray,
    boxes: np.ndarray,
    color=(1.0, 1.0, 1.0),
    thickness: int = 1,
    labels: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """Draw [d,8,2] image-space 3D boxes (reference plot_boxes,
    homography.py:670-714). Returns the frame (copy)."""
    out = frame.copy()
    color = np.asarray(color, out.dtype)
    for d in range(len(boxes)):
        b = boxes[d]
        if not np.isfinite(b).all():
            continue
        for a, c in BOX_EDGES:
            draw_line(out, b[a], b[c], color, thickness)
    return out


def birdseye_plot(
    states: np.ndarray,
    x_range: Tuple[float, float],
    path: Optional[str] = None,
    ids: Optional[Sequence[int]] = None,
):
    """Roadway-plane footprint plot via matplotlib (agg backend)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from playground3d_tpu.evaluation import geometry_np as G

    fig, ax = plt.subplots(figsize=(12, 3))
    if len(states):
        space = G.state_to_space(states)
        for i in range(len(states)):
            fp = space[i, [0, 1, 3, 2, 0], :2]
            ax.plot(fp[:, 0], fp[:, 1], "-")
            if ids is not None:
                ax.annotate(str(ids[i]), (states[i, 0], states[i, 1]))
    ax.set_xlim(*x_range)
    ax.set_ylim(-10, 130)
    ax.axhline(60, color="gray", ls="--", lw=0.5)
    ax.set_xlabel("roadway x (ft)")
    ax.set_ylabel("y (ft)")
    if path:
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
