"""Device mesh and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel`` over
4 GPUs (train_detector_3D_angle.py:316-318) plus per-tracker GPU placement
(MC3D_crop_tracker.py:95-98). The TPU-native equivalents (SURVEY.md section
2c):

* **training**: batch-sharded data parallelism over an ICI mesh — params
  replicated, batch split on the ``data`` axis; XLA inserts the gradient
  all-reduce.
* **multi-camera inference**: the camera axis of the stacked frame batch
  sharded over the same mesh (one camera pool shard per chip).
* **single-frame latency**: GSPMD spatial partitioning — shard one frame's
  width across the mesh and let XLA insert the conv halo exchanges
  (collective-permutes over ICI). No reference counterpart exists:
  ``nn.DataParallel`` can only scale batch throughput, never the latency
  of one frame.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = DATA_AXIS,
    devices=None,
) -> Mesh:
    """Build a 1-D mesh. Pass ``devices`` explicitly (e.g.
    ``jax.devices("cpu")``) to avoid initializing the default backend."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


SPACE_AXIS = "space"


def make_mesh2(
    n_batch: int,
    n_space: int,
    batch_axis: str = DATA_AXIS,
    space_axis: str = SPACE_AXIS,
    devices=None,
) -> Mesh:
    """A 2-axis mesh (batch/camera × spatial) — the deployment shape for
    N cameras at low per-frame latency: camera pools split on one axis,
    each camera's frame width split on the other (halo exchanges ride the
    inner, fastest ICI axis)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_batch * n_space]).reshape(n_batch, n_space)
    return Mesh(devices, (batch_axis, space_axis))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-dim (batch or camera) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """device_put a pytree with its leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def spatial_sharding(
    mesh: Mesh, shape, axis: str = DATA_AXIS, batch_axis: Optional[str] = None
) -> NamedSharding:
    """Sharding that splits ONE frame's spatial extent across the mesh.

    ``shape`` is the frame batch layout ``[N, H', W', C]`` (s2d-packed or
    raw NHWC). Prefers the width axis (s2d 1080p/4K widths 480/960 divide
    typical mesh sizes; heights 270/540 do not), falls back to height, and
    to replication if neither divides the mesh. XLA/GSPMD keeps every conv
    spatially partitioned and inserts halo collective-permutes at kernel
    boundaries, so N chips cut single-frame detector latency ~N-fold —
    a lever DataParallel fundamentally lacks (train_detector_3D_angle.py:
    316-318 only scales batch).
    """
    # divisibility must be tested against the SIZE OF THE NAMED AXIS, not the
    # whole mesh: on a multi-axis mesh the device count can exceed the axis
    # size, which would either pick an invalid spec or needlessly replicate
    n = mesh.shape[axis]
    # on a combined camera x space mesh the leading (camera/batch) dim keeps
    # its own axis — the spatial fallback must never undo it
    b = batch_axis if (
        batch_axis is not None
        and len(shape) >= 1
        and shape[0] % mesh.shape[batch_axis] == 0
    ) else None
    if len(shape) >= 3 and shape[2] % n == 0:
        return NamedSharding(mesh, P(b, None, axis))
    if len(shape) >= 2 and shape[1] % n == 0:
        return NamedSharding(mesh, P(b, axis))
    return NamedSharding(mesh, P(b)) if b is not None else replicated(mesh)


def shard_spatial(
    mesh: Mesh, frames, axis: str = DATA_AXIS, batch_axis: Optional[str] = None
):
    """device_put a frame batch with its spatial width (or height) sharded
    (and, on a 2-axis mesh, the leading camera/batch dim on ``batch_axis``)."""
    return jax.device_put(
        frames, spatial_sharding(mesh, frames.shape, axis, batch_axis)
    )


def spatial_constrainer(
    mesh: Mesh, axis: str = DATA_AXIS, batch_axis: Optional[str] = None
):
    """Per-tensor sharding-constraint callable for the spatially-partitioned
    forward: keeps a pyramid level sharded while its extent divides the mesh
    axis and pins it to EXPLICIT replication once it doesn't (deep levels —
    P6/P7 at 1080p on 8 chips are a few KB).

    Without this, GSPMD propagates the width sharding into head convs whose
    level width is smaller than the axis and falls back to "involuntary full
    rematerialization" (replicate-then-repartition on every such op)."""

    def constrain(x):
        if x.ndim < 4:
            return x
        sh = spatial_sharding(mesh, x.shape, axis, batch_axis)
        if batch_axis is not None and axis not in (sh.spec or ()):
            # 2-axis mode, spatially-indivisible level (deep pyramid, W of
            # a few cells): pin to FULL replication, exactly like the 1-axis
            # case. A batch-only pin (P(batch)) looks tighter but the
            # producer conv is space-sharded and GSPMD cannot convert
            # space-sharded -> batch-sharded across the transposed device
            # order without an involuntary full rematerialization; an
            # explicit replicate is one cheap all-gather on a few-KB level.
            sh = replicated(mesh)
        return jax.lax.with_sharding_constraint(x, sh)

    return constrain


def spatial_forward(mesh: Mesh, depth: int, stem: str = "s2d",
                    axis: str = DATA_AXIS, **fw_kwargs):
    """Jitted ``(params, frame) -> forward_raw(...)`` with the spatial
    partitioning contract applied end to end: shard the input with
    :func:`shard_spatial`, and every pyramid level is constrained via
    :func:`spatial_constrainer` so the partitioned HLO contains no
    replicate-then-repartition steps (single-frame latency lever;
    SURVEY section 2c — nn.DataParallel, train_detector_3D_angle.py:316-318,
    cannot express this)."""
    from playground3d_tpu.models.retinanet import forward_raw

    cons = spatial_constrainer(mesh, axis)

    @jax.jit
    def fwd(params, frame):
        return forward_raw(
            params, frame, depth=depth, stem=stem, constrain=cons, **fw_kwargs
        )

    return fwd


def camera_spatial_forward(
    mesh: Mesh,
    depth: int,
    stem: str = "s2d",
    batch_axis: str = DATA_AXIS,
    space_axis: str = SPACE_AXIS,
    **fw_kwargs,
):
    """Jitted forward over a 2-axis (camera × spatial) mesh from
    :func:`make_mesh2`: the camera batch splits on ``batch_axis`` while each
    camera's frame width splits on ``space_axis`` — an 18-camera deployment
    gets camera throughput AND single-frame latency scaling at once, with
    the conv halo exchanges confined to the inner mesh axis. No reference
    counterpart (nn.DataParallel scales batch only,
    train_detector_3D_angle.py:316-318)."""
    from playground3d_tpu.models.retinanet import forward_raw

    cons = spatial_constrainer(mesh, space_axis, batch_axis=batch_axis)

    @jax.jit
    def fwd(params, frames):
        frames = jax.lax.with_sharding_constraint(
            frames, spatial_sharding(mesh, frames.shape, space_axis, batch_axis)
        )
        return forward_raw(
            params, frames, depth=depth, stem=stem, constrain=cons, **fw_kwargs
        )

    return fwd
