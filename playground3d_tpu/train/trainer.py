"""Detector training: data-parallel jitted train step over a device mesh.

Reference parity (train_detector_3D_angle.py:254-419): Adam 1e-4, gradient
clipping at norm 0.1, loss = cls + reg + vp summed equally, ReduceLROnPlateau
(factor 0.3, patience 1 epoch — implemented host-side by scaling the
learning-rate hyperparameter), per-epoch checkpointing. ``nn.DataParallel``
is replaced by batch sharding over an ICI mesh: parameters are replicated,
the batch is split on the ``data`` axis, and XLA inserts the gradient
all-reduce.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from playground3d_tpu.losses import detection_loss
from playground3d_tpu.models import anchors_for_shape, retinanet_init
from playground3d_tpu.models.retinanet import forward_raw
from playground3d_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


@dataclass
class TrainConfig:
    depth: int = 50
    stem: str = "conv7"  # "s2d" = TPU-fast space-to-depth stem
    num_classes: int = 8
    lr: float = 1e-4
    grad_clip: float = 0.1
    image_shape: Tuple[int, int] = (1080, 1920)
    plateau_factor: float = 0.3  # ReduceLROnPlateau parity
    plateau_patience: int = 1
    # head/FPN width + tower shape (256/4/separate = reference parity,
    # model.py:59,120-205; slimmer settings trade head FLOPs for capacity)
    feature_size: int = 256
    tower_depth: int = 4
    shared_tower: bool = False


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adam(learning_rate),
        )
    )(learning_rate=cfg.lr)


def init_train_state(key, cfg: TrainConfig, params=None) -> Tuple[TrainState, optax.GradientTransformation]:
    if params is None:
        params = retinanet_init(
            key, num_classes=cfg.num_classes, depth=cfg.depth, stem=cfg.stem,
            feature_size=cfg.feature_size, tower_depth=cfg.tower_depth,
            shared_tower=cfg.shared_tower,
        )
    opt = make_optimizer(cfg)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.asarray(0)), opt


def make_train_step(cfg: TrainConfig, opt: optax.GradientTransformation, mesh=None):
    """Returns a jitted (state, images [B,H,W,3], annotations [B,M,21]) ->
    (state, metrics) step. With a mesh, the batch is sharded on 'data' and
    parameters replicated."""
    anchors = jnp.asarray(anchors_for_shape(tuple(cfg.image_shape)))

    def loss_fn(params, images, annotations):
        cls, reg = forward_raw(
            params, images, depth=cfg.depth, num_classes=cfg.num_classes,
            stem=cfg.stem,
        )
        l_cls, l_reg, l_vp = detection_loss(cls, reg, annotations, anchors)
        total = l_cls + l_reg + l_vp  # equal-weight sum (train_...py:378)
        return total, (l_cls, l_reg, l_vp)

    def step_fn(state: TrainState, images, annotations):
        (total, (l_cls, l_reg, l_vp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, images, annotations)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": total,
            "cls": l_cls,
            "reg": l_reg,
            "vp": l_vp,
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    data_sh = batch_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(None, data_sh, data_sh),
        out_shardings=(None, None),
    )


class Trainer:
    """Host loop: feeds batches, tracks plateau LR schedule, checkpoints."""

    def __init__(self, cfg: TrainConfig, key=None, mesh=None, params=None):
        self.cfg = cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        self.state, self.opt = init_train_state(key, cfg, params)
        self.mesh = mesh
        if mesh is not None:
            self.state = replicate(mesh, self.state)
        self._step = make_train_step(cfg, self.opt, mesh)
        self.lr = cfg.lr
        self._best = float("inf")
        self._bad_epochs = 0
        self.history = []

    def train_step(self, images: np.ndarray, annotations: np.ndarray) -> dict:
        if self.mesh is not None:
            images, annotations = shard_batch(self.mesh, (images, annotations))
        self.state, metrics = self._step(self.state, images, annotations)
        return metrics

    def end_epoch(self, val_loss: float) -> None:
        """ReduceLROnPlateau parity (train_detector_3D_angle.py:412)."""
        self.history.append(val_loss)
        if val_loss < self._best - 1e-6:
            self._best = val_loss
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.cfg.plateau_patience:
                self.lr *= self.cfg.plateau_factor
                self._bad_epochs = 0
        # rebuild the opt_state with the new injected hyperparam — mutating
        # the hyperparams dict in place on a replicated/donated state is
        # fragile under sharding (the donated buffer may already be reused)
        old = self.state.opt_state.hyperparams["learning_rate"]
        new_lr = jnp.asarray(self.lr, dtype=jnp.float32)
        if hasattr(old, "sharding"):
            new_lr = jax.device_put(new_lr, old.sharding)
        hp = dict(self.state.opt_state.hyperparams)
        hp["learning_rate"] = new_lr
        self.state = self.state._replace(
            opt_state=self.state.opt_state._replace(hyperparams=hp)
        )

    def save(self, path: str) -> None:
        from playground3d_tpu.models.nn import save_params

        save_params(path, jax.device_get(self.state.params))

    def load(self, path: str) -> None:
        from playground3d_tpu.models.nn import load_params

        params = load_params(path, jax.device_get(self.state.params))
        self.state = self.state._replace(params=params, opt_state=self.opt.init(params))
