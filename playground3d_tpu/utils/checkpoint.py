"""Checkpointing: npz (simple, dependency-free) and orbax (production).

The reference checkpoints with ``torch.save(state_dict)`` per epoch
(train_detector_3D_angle.py:416-417) and pickles derived artifacts
(homographies, KF params). Here:

* model params <-> flat npz (models/nn.py save_params/load_params)
* full train state (params + optimizer + step) via orbax for large-scale
  runs: atomic, async-capable, resumable
* geometry / KF constants as npz (CameraRegistry.save, fit_kf.save_kf_params)
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_train_state(path: str, state) -> None:
    """Orbax checkpoint of a TrainState pytree (atomic directory write)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, like) -> Any:
    """Restore a TrainState saved by :func:`save_train_state`; ``like`` is a
    template pytree with the right structure/shapes/dtypes."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(like))


class CheckpointManager:
    """Rotating per-epoch checkpoints (keep latest k), orbax-backed."""

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(max_to_keep=keep)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state) -> None:
        import jax
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, like, step: Optional[int] = None):
        import jax
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(like))
        )
