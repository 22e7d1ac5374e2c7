"""Post-training int8 (w8a8) quantization for the ResNet backbone.

The v5e MXU runs int8 at twice the bf16 rate; the backbone is the largest
FLOP block of the detector forward (the reference runs everything f32 on
cuDNN — quantization is this framework's TPU-native speed lever, not a
reference port; the equivalent hot path is reference model.py:284-307).

Scheme
------
* weights: per-output-channel symmetric int8 (``wq``/``ws``), folded from
  the trained f32 weights;
* activations: per-tensor symmetric int8 with STATIC scales (``xs``)
  calibrated by recording ``max|x|`` at every conv input over calibration
  batches — no data-dependent scales at inference, so the whole forward
  stays one fixed XLA program;
* each conv runs int8xint8 -> int32 on the MXU, then dequantizes with one
  fused multiply-add that also folds the frozen BN (scale, offset);
* residual adds and relus stay float; the next conv requantizes.

The pluggable ``conv_bn`` hook of :func:`resnet.resnet_apply` carries the
quantized unit through the unchanged block structure; ``_iter_conv_bn``
mirrors that apply order (the contract is asserted by array count).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from playground3d_tpu.models.nn import Params, bn_apply, conv_apply
from playground3d_tpu.models.resnet import LAYER_SPECS, resnet_apply

_EPS = 1e-8


def _iter_conv_bn(params: Params, depth: int):
    """Yield (conv_p, bn_p) dicts in resnet_apply's call order."""
    yield params["conv1"], params["bn1"]
    _, layers = LAYER_SPECS[depth]
    for stage in range(4):
        for bp in params[f"layer{stage + 1}"]:
            yield bp["conv1"], bp["bn1"]
            yield bp["conv2"], bp["bn2"]
            if "conv3" in bp:
                yield bp["conv3"], bp["bn3"]
            if "down_conv" in bp:
                yield bp["down_conv"], bp["down_bn"]


def calibrate_backbone(
    params: Params, images: jnp.ndarray, depth: int, stem: str = "conv7",
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Run one f32/bf16 forward recording ``max|x|`` at each conv input.

    Returns [n_convs] absmax in apply order. Feed several representative
    batches and take the elementwise max on the host.
    """

    @jax.jit
    def run(p, im):
        absmax: List[jnp.ndarray] = []

        def cb(pc, pbn, x, stride=1, relu=False):
            absmax.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            y = bn_apply(pbn, conv_apply(pc, x, stride, dtype=dtype))
            return jax.nn.relu(y) if relu else y

        resnet_apply(p, im, depth, dtype, stem, conv_bn=cb)
        return jnp.stack(absmax)

    return run(params, images)


def _clone_tree(p):
    if isinstance(p, dict):
        return {k: _clone_tree(v) for k, v in p.items()}
    if isinstance(p, list):
        return [_clone_tree(v) for v in p]
    return p  # leaf arrays are immutable


def quantize_backbone(
    params: Params, act_absmax, depth: int, min_ch: int = 128
) -> Params:
    """Fold trained f32 backbone params + calibrated activation ranges into
    a quantized parameter tree (adds ``wq`` int8, ``ws`` [c_out], ``xs``
    scalar to the quantized conv dicts; keeps ``w`` for fallback/debug).

    ``min_ch``: only convs with >= this many INPUT channels quantize —
    measured on v5e, narrow early convs (48/64 ch at 270x480) are
    bandwidth-bound and gain nothing from int8 (scripts/probe_int8_conv.py),
    so they stay bf16 and skip the requantize round-trip.
    """
    q = _clone_tree(params)
    convs = list(_iter_conv_bn(q, depth))
    act_absmax = jnp.asarray(act_absmax)
    assert act_absmax.shape[0] == len(convs), (
        f"calibration length {act_absmax.shape[0]} != conv count {len(convs)}"
    )
    for i, (pc, _) in enumerate(convs):
        w = pc["w"]
        if w.shape[2] < min_ch:
            continue
        ws = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), _EPS) / 127.0
        pc["wq"] = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        pc["ws"] = ws
        pc["xs"] = jnp.maximum(act_absmax[i], _EPS) / 127.0
    return q


def is_quantized(p) -> bool:
    """True if any conv dict in the tree carries int8 weights."""
    if isinstance(p, dict):
        return "wq" in p or any(is_quantized(v) for v in p.values())
    if isinstance(p, list):
        return any(is_quantized(v) for v in p)
    return False


def quant_conv_bn(pc: Params, pbn: Params, x, stride: int = 1, relu: bool = False):
    """int8 conv -> fused dequant+BN multiply-add (-> relu); non-quantized
    convs (narrow early layers, see quantize_backbone) fall back to bf16.

    ``x`` is float; it is requantized with the static input scale. The
    int8xint8->int32 convolution hits the MXU's double-rate int8 path.
    """
    if "wq" not in pc:
        y = bn_apply(pbn, conv_apply(pc, x, stride, dtype=jnp.bfloat16))
        return jax.nn.relu(y) if relu else y
    xs = pc["xs"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, pc["wq"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    inv = jax.lax.rsqrt(pbn["var"] + 1e-5) * pbn["scale"]
    scale = xs * pc["ws"] * inv  # dequant + BN fold, [c_out]
    offset = pbn["offset"] - pbn["mean"] * inv
    out = y.astype(jnp.float32) * scale + offset
    return jax.nn.relu(out) if relu else out


def resnet_apply_int8(params: Params, x, depth: int, stem: str = "conv7"):
    """Quantized twin of :func:`resnet.resnet_apply` (same signature shape)."""
    return resnet_apply(params, x, depth, jnp.float32, stem, conv_bn=quant_conv_bn)


def quantize_detector(
    params: Params, calib_images, depth: int, stem: str = "conv7"
) -> Params:
    """Full-detector PTQ entry point: calibrate on representative frames
    (same dtype/layout the pipeline feeds — uint8 s2d is normalized exactly
    as at inference), quantize the backbone, keep FPN/heads bf16. The
    returned tree drops into every existing forward (forward_raw dispatches
    on the ``wq`` key)."""
    from playground3d_tpu.models.retinanet import normalize_on_device

    batches = calib_images if isinstance(calib_images, (list, tuple)) else [calib_images]
    absmax = None
    for im in batches:
        a = calibrate_backbone(
            params["backbone"], normalize_on_device(jnp.asarray(im)), depth, stem
        )
        absmax = a if absmax is None else jnp.maximum(absmax, a)
    out = dict(params)
    out["backbone"] = quantize_backbone(params["backbone"], absmax, depth)
    return out
