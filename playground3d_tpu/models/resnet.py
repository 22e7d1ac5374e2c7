"""ResNet backbones (18/34/50/101/152) returning C3/C4/C5 feature maps.

Architecture-parity with the reference's torchvision-style backbone
(reference pytorch_retinanet_detector_directional/retinanet/model.py:208-276
and utils.py:12-80), re-expressed as init/apply pure functions in NHWC.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from playground3d_tpu.models.nn import (
    Params,
    bn_apply,
    bn_init,
    conv_apply,
    conv_init,
    max_pool,
)

LAYER_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _basic_block_init(key, in_ch, planes, stride) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": conv_init(k1, in_ch, planes, 3),
        "bn1": bn_init(planes),
        "conv2": conv_init(k2, planes, planes, 3),
        "bn2": bn_init(planes),
    }
    if stride != 1 or in_ch != planes:
        p["down_conv"] = conv_init(k3, in_ch, planes, 1)
        p["down_bn"] = bn_init(planes)
    return p


def _basic_block_apply(p: Params, x, stride, cb) -> jnp.ndarray:
    out = cb(p["conv1"], p["bn1"], x, stride, relu=True)
    out = cb(p["conv2"], p["bn2"], out, 1, relu=False)
    res = x
    if "down_conv" in p:
        res = cb(p["down_conv"], p["down_bn"], x, stride, relu=False)
    return jax.nn.relu(out + res)


def _bottleneck_init(key, in_ch, planes, stride) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": conv_init(k1, in_ch, planes, 1),
        "bn1": bn_init(planes),
        "conv2": conv_init(k2, planes, planes, 3),
        "bn2": bn_init(planes),
        "conv3": conv_init(k3, planes, planes * 4, 1),
        "bn3": bn_init(planes * 4),
    }
    if stride != 1 or in_ch != planes * 4:
        p["down_conv"] = conv_init(k4, in_ch, planes * 4, 1)
        p["down_bn"] = bn_init(planes * 4)
    return p


def _bottleneck_apply(p: Params, x, stride, cb) -> jnp.ndarray:
    out = cb(p["conv1"], p["bn1"], x, 1, relu=True)
    out = cb(p["conv2"], p["bn2"], out, stride, relu=True)
    out = cb(p["conv3"], p["bn3"], out, 1, relu=False)
    res = x
    if "down_conv" in p:
        res = cb(p["down_conv"], p["down_bn"], x, stride, relu=False)
    return jax.nn.relu(out + res)


def space_to_depth(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """[N,H,W,C] -> [N,H/b,W/b,C*b*b]. On TPU a 3-channel image tensor pads
    its lane dimension 3 -> 128 (~42x wasted bandwidth and MXU occupancy on
    every op that touches it); packing 4x4 patches into 48 channels makes
    the stem MXU-shaped. Hosts should pack during preprocessing (the device
    reshape itself pays the bad layout once)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, c * block * block)


def resnet_init(key, depth: int = 50, stem: str = "conv7") -> Params:
    """``stem``: "conv7" = reference-parity 7x7/2 conv + 3x3/2 maxpool;
    "s2d" = space-to-depth(4x4) + 3x3/1 conv (same output resolution,
    MXU-friendly; the default for the TPU fast path)."""
    block_type, layers = LAYER_SPECS[depth]
    expansion = 1 if block_type == "basic" else 4
    block_init = _basic_block_init if block_type == "basic" else _bottleneck_init

    keys = jax.random.split(key, 8)
    if stem == "s2d":
        params: Params = {
            "conv1": conv_init(keys[0], 48, 64, 3),
            "bn1": bn_init(64),
        }
    else:
        params = {
            "conv1": conv_init(keys[0], 3, 64, 7),
            "bn1": bn_init(64),
        }
    in_ch = 64
    for stage, (planes, n_blocks, stride) in enumerate(
        zip((64, 128, 256, 512), layers, (1, 2, 2, 2))
    ):
        blocks = []
        bkeys = jax.random.split(keys[stage + 1], n_blocks)
        for i in range(n_blocks):
            s = stride if i == 0 else 1
            blocks.append(block_init(bkeys[i], in_ch, planes, s))
            in_ch = planes * expansion
        params[f"layer{stage + 1}"] = blocks
    return params


def fpn_sizes(depth: int) -> Tuple[int, int, int]:
    """Channel counts of C3, C4, C5 (reference model.py:222-227)."""
    expansion = 1 if LAYER_SPECS[depth][0] == "basic" else 4
    return 128 * expansion, 256 * expansion, 512 * expansion


def default_conv_bn(dtype=jnp.bfloat16):
    """Standard conv -> frozen-BN (-> relu) unit used by the blocks."""

    def cb(pc, pbn, x, stride=1, relu=False):
        y = bn_apply(pbn, conv_apply(pc, x, stride, dtype=dtype))
        return jax.nn.relu(y) if relu else y

    return cb


def resnet_apply(
    params: Params,
    x: jnp.ndarray,
    depth: int,
    dtype=jnp.bfloat16,
    stem: str = "conv7",
    conv_bn=None,
):
    """NHWC image batch -> (C3, C4, C5).

    With stem="s2d", ``x`` is either raw [N,H,W,3] (packed on device) or
    pre-packed [N,H/4,W/4,48] from the host pipeline.

    ``conv_bn`` overrides the conv->BN(->relu) unit for every convolution
    (signature ``cb(conv_p, bn_p, x, stride, relu)``): the int8 quantized
    path (models/quant.py) and activation-range calibration plug in here.
    Call order is the contract — models/quant._iter_conv_bn mirrors it.
    """
    block_type, layers = LAYER_SPECS[depth]
    block_apply = _basic_block_apply if block_type == "basic" else _bottleneck_apply
    cb = conv_bn if conv_bn is not None else default_conv_bn(dtype)

    if stem == "s2d":
        if x.shape[-1] == 3:
            x = space_to_depth(x, 4)
        x = cb(params["conv1"], params["bn1"], x, 1, relu=True)
    else:
        x = cb(params["conv1"], params["bn1"], x, 2, relu=True)
        x = max_pool(x, 3, 2)

    feats = []
    for stage in range(4):
        blocks = params[f"layer{stage + 1}"]
        stride = 1 if stage == 0 else 2
        for i, bp in enumerate(blocks):
            x = block_apply(bp, x, stride if i == 0 else 1, cb)
        feats.append(x)
    return feats[1], feats[2], feats[3]  # C3, C4, C5
