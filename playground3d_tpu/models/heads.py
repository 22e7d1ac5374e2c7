"""Classification and 12-channel regression heads, shared across FPN levels
(reference model.py:120-205)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from playground3d_tpu.models.nn import Params, conv_apply, conv_init

N_REG_OUTPUTS = 12  # directional 3D regression (reference model.py:233)
PRIOR = 0.01  # focal-loss prior for classification bias (model.py:252)


def _tower_init(key, feature_size: int, depth: int = 4):
    ks = jax.random.split(key, depth)
    return [conv_init(k, feature_size, feature_size, 3, bias=True) for k in ks]


def head_init(
    key,
    num_classes: int,
    num_anchors: int = 9,
    feature_size: int = 256,
    tower_depth: int = 4,
    shared_tower: bool = False,
) -> Params:
    """Default (tower_depth=4, shared_tower=False) is reference parity
    (model.py:120-205: two 4-conv towers). ``shared_tower=True`` runs one
    tower feeding both output convs — half the head FLOPs; ``tower_depth``
    trades capacity for speed (measure with the e2e quality harness)."""
    kc, kr, kco, kro = jax.random.split(key, 4)
    if shared_tower:
        tower = _tower_init(kc, feature_size, tower_depth)
        p = {
            "cls_tower": tower,
            "reg_tower": None,
            "cls_out": conv_init(kco, feature_size, num_anchors * num_classes, 3, bias=True),
            "reg_out": conv_init(kro, feature_size, num_anchors * N_REG_OUTPUTS, 3, bias=True),
        }
    else:
        p = {
            "cls_tower": _tower_init(kc, feature_size, tower_depth),
            "reg_tower": _tower_init(kr, feature_size, tower_depth),
            "cls_out": conv_init(kco, feature_size, num_anchors * num_classes, 3, bias=True),
            "reg_out": conv_init(kro, feature_size, num_anchors * N_REG_OUTPUTS, 3, bias=True),
        }
    # focal prior init: zero weights, bias = -log((1-p)/p)  (model.py:254-258)
    p["cls_out"]["w"] = jnp.zeros_like(p["cls_out"]["w"])
    p["cls_out"]["b"] = jnp.full_like(
        p["cls_out"]["b"], -math.log((1.0 - PRIOR) / PRIOR)
    )
    p["reg_out"]["w"] = jnp.zeros_like(p["reg_out"]["w"])
    p["reg_out"]["b"] = jnp.zeros_like(p["reg_out"]["b"])
    return p


def _tower_apply(tower, x, dtype, conv=conv_apply):
    for c in tower:
        x = jax.nn.relu(conv(c, x, dtype=dtype))
    return x


def head_apply(
    p: Params,
    features,
    num_classes: int,
    num_anchors: int = 9,
    dtype=jnp.bfloat16,
    apply_sigmoid: bool = True,
    conv=conv_apply,
    compact: bool = False,
    score_path: bool = False,
):
    """[P3..P7] -> (classification [N, A_total, K], regression [N, A_total, 12]).

    Flatten order per level is (y, x, anchor) — matching the anchor layout
    in :mod:`playground3d_tpu.models.anchors`.

    ``conv`` is a pluggable conv unit so the int8 PTQ path (models/quant)
    reuses this exact data flow; the tower conv dicts are shared across all
    five pyramid levels, so a quantized conv's static activation scale must
    cover every level (the calibrator accumulates max over calls).

    ``compact=True`` returns raw LOGITS and regression in bf16 with no
    full-array f32 casts (the head convs compute in bf16 anyway, so the
    values are identical — this only skips materializing two f32 copies of
    the ~400k-anchor outputs, which costs more than the whole NMS stage at
    1080p). Inference paths that top-k first should use this and apply
    sigmoid to the survivors only (sigmoid is monotonic, so top-k on
    logits == top-k on scores).
    """
    cls_all, reg_all, arg_all = [], [], []
    shared = p.get("reg_tower") is None
    for f in features:
        n, h, w, _ = f.shape
        ct = _tower_apply(p["cls_tower"], f, dtype, conv)
        rt = ct if shared else _tower_apply(p["reg_tower"], f, dtype, conv)
        c = conv(p["cls_out"], ct, dtype=dtype)
        r = conv(p["reg_out"], rt, dtype=dtype)
        if score_path:
            # reduce over classes at the conv's natural [n,h,w,A*K] layout,
            # BEFORE flatten/concat: the full [A_total,K] class tensor is
            # never materialized (its concat + reduce_max measured ~0.5 ms
            # per detect frame at 1080p in the device profile)
            c5 = c.reshape(n, h, w, num_anchors, num_classes)
            cls_all.append(jnp.max(c5, axis=-1).reshape(n, h * w * num_anchors))
            arg_all.append(
                jnp.argmax(c5, axis=-1).astype(jnp.int32).reshape(n, h * w * num_anchors)
            )
        else:
            cls_all.append(c.reshape(n, h * w * num_anchors, num_classes))
        reg_all.append(r.reshape(n, h * w * num_anchors, N_REG_OUTPUTS))
    cls = jnp.concatenate(cls_all, axis=1)
    reg = jnp.concatenate(reg_all, axis=1)
    if score_path:
        return cls.astype(dtype), jnp.concatenate(arg_all, axis=1), reg.astype(dtype)
    if compact:
        return cls.astype(dtype), reg.astype(dtype)
    if apply_sigmoid:
        cls = jax.nn.sigmoid(cls.astype(jnp.float32))
    return cls, reg.astype(jnp.float32)
