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


def spatial_sharding(mesh: Mesh, shape, axis: str = DATA_AXIS) -> NamedSharding:
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
    if len(shape) >= 3 and shape[2] % n == 0:
        return NamedSharding(mesh, P(None, None, axis))
    if len(shape) >= 2 and shape[1] % n == 0:
        return NamedSharding(mesh, P(None, axis))
    return replicated(mesh)


def shard_spatial(mesh: Mesh, frames, axis: str = DATA_AXIS):
    """device_put a frame batch with its spatial width (or height) sharded."""
    return jax.device_put(frames, spatial_sharding(mesh, frames.shape, axis))


def spatial_constrainer(mesh: Mesh, axis: str = DATA_AXIS):
    """Per-tensor sharding-constraint callable for the spatially-partitioned
    forward: keeps a pyramid level sharded while its extent divides the mesh
    axis and pins it to EXPLICIT replication once it doesn't (deep levels —
    P6/P7 at 1080p on 8 chips are a few KB).

    Without this, GSPMD propagates the width sharding into head convs whose
    level width is smaller than the axis and falls back to "involuntary full
    rematerialization" (replicate-then-repartition on every such op)."""

    def constrain(x):
        if x.ndim >= 4:
            return jax.lax.with_sharding_constraint(
                x, spatial_sharding(mesh, x.shape, axis)
            )
        return x

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
