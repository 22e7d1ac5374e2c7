"""Minimal functional NN layer library (NHWC, MXU-friendly).

This framework deliberately ships its own tiny layer system instead of
depending on flax/haiku: parameters are plain nested dicts of jnp arrays
(a pytree), every layer is an ``init``/``apply`` pair of pure functions, and
models compose them. That keeps the whole detector a single transparent
jittable function, checkpointable as a flat npz, and shardable with pjit by
annotating the pytree.

Conventions
-----------
* activations NHWC, conv weights HWIO (XLA's preferred TPU layouts);
* parameters stored float32; compute dtype (default bfloat16) is a runtime
  argument — weights are cast on the fly and XLA folds the casts;
* batch norm is inference-mode only, matching the reference detector which
  freezes BN permanently (reference model.py:278-282 ``freeze_bn``); the
  scale/offset are pre-folded into a single multiply-add at apply time.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def he_normal(key, shape, fan_in):
    """Kaiming-normal as the reference uses for all convs
    (model.py:244-247: std = sqrt(2 / (k*k*out_ch)) — note the reference
    computes fan from the *output* channels; we keep standard fan_in, which
    only changes the random init, not the architecture)."""
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


# ---------------------------------------------------------------------------
# conv / bn / pool
# ---------------------------------------------------------------------------


def conv_init(key, in_ch: int, out_ch: int, k: int, bias: bool = False) -> Params:
    p = {"w": he_normal(key, (k, k, in_ch, out_ch), fan_in=k * k * in_ch)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv_apply(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    w = p["w"].astype(dtype)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    if "b" in p:
        out = out + p["b"].astype(dtype)
    return out


def bn_init(ch: int) -> Params:
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "offset": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def bn_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode batch norm folded to one FMA (frozen BN — the
    reference never trains BN statistics, model.py:260,278-282)."""
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    a = inv.astype(x.dtype)
    b = (p["offset"] - p["mean"] * inv).astype(x.dtype)
    return x * a + b


def max_pool(x: jnp.ndarray, k: int = 3, stride: int = 2) -> jnp.ndarray:
    """SAME max pooling (reference ResNet stem, model.py:216)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME",
    )


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (reference FPN, model.py:65)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def crop_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise add after cropping both to the common spatial size —
    the reference's try/except shape-mismatch fix (model.py:92-97,103-108)
    done statically (shapes are known at trace time)."""
    h = min(a.shape[1], b.shape[1])
    w = min(a.shape[2], b.shape[2])
    return a[:, :h, :w, :] + b[:, :h, :w, :]


# ---------------------------------------------------------------------------
# parameter tree utilities
# ---------------------------------------------------------------------------


def tree_size(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def save_params(path: str, params: Params) -> None:
    """Flatten the param pytree to a flat npz keyed by /-joined paths."""
    flat = {}

    def rec(prefix, node):
        if node is None:
            return
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", params)
    # Atomic write: training through the dev tunnel can hang/die mid-save,
    # and a torn checkpoint would break the --resume recovery path that the
    # long-run training scripts rely on. Write-to-temp + rename is atomic on
    # POSIX when temp and target share a directory.
    tmp = f"{path}.tmp-{os.getpid()}"
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, **flat)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_step_sidecar(path: str, step: int) -> None:
    """Atomically record the resume step in a checkpoint's ``.step`` sidecar."""
    tmp = f"{path}.tmp-{os.getpid()}"
    try:
        with open(tmp, "w") as fh:
            fh.write(str(step))
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_params(path: str, like: Params) -> Params:
    """Load a flat npz back into the structure of ``like``."""
    z = np.load(path, allow_pickle=False)

    def rec(prefix, node):
        if node is None:
            return None
        if isinstance(node, dict):
            return {k: rec(f"{prefix}/{k}" if prefix else k, v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(f"{prefix}/{i}", v) for i, v in enumerate(node))
        return jnp.asarray(z[prefix])

    return rec("", like)
