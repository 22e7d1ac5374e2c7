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


def _basic_block_apply(p: Params, x, stride, dtype) -> jnp.ndarray:
    out = jax.nn.relu(bn_apply(p["bn1"], conv_apply(p["conv1"], x, stride, dtype=dtype)))
    out = bn_apply(p["bn2"], conv_apply(p["conv2"], out, dtype=dtype))
    res = x
    if "down_conv" in p:
        res = bn_apply(p["down_bn"], conv_apply(p["down_conv"], x, stride, dtype=dtype))
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


def _bottleneck_apply(p: Params, x, stride, dtype) -> jnp.ndarray:
    out = jax.nn.relu(bn_apply(p["bn1"], conv_apply(p["conv1"], x, dtype=dtype)))
    out = jax.nn.relu(bn_apply(p["bn2"], conv_apply(p["conv2"], out, stride, dtype=dtype)))
    out = bn_apply(p["bn3"], conv_apply(p["conv3"], out, dtype=dtype))
    res = x
    if "down_conv" in p:
        res = bn_apply(p["down_bn"], conv_apply(p["down_conv"], x, stride, dtype=dtype))
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


def resnet_apply(
    params: Params, x: jnp.ndarray, depth: int, dtype=jnp.bfloat16, stem: str = "conv7"
):
    """NHWC image batch -> (C3, C4, C5).

    With stem="s2d", ``x`` is either raw [N,H,W,3] (packed on device) or
    pre-packed [N,H/4,W/4,48] from the host pipeline.
    """
    block_type, layers = LAYER_SPECS[depth]
    block_apply = _basic_block_apply if block_type == "basic" else _bottleneck_apply

    if stem == "s2d":
        if x.shape[-1] == 3:
            x = space_to_depth(x, 4)
        x = conv_apply(params["conv1"], x, stride=1, dtype=dtype)
        x = jax.nn.relu(bn_apply(params["bn1"], x))
    else:
        x = conv_apply(params["conv1"], x, stride=2, dtype=dtype)
        x = jax.nn.relu(bn_apply(params["bn1"], x))
        x = max_pool(x, 3, 2)

    feats = []
    for stage in range(4):
        blocks = params[f"layer{stage + 1}"]
        stride = 1 if stage == 0 else 2
        for i, bp in enumerate(blocks):
            x = block_apply(bp, x, stride if i == 0 else 1, dtype)
        feats.append(x)
    return feats[1], feats[2], feats[3]  # C3, C4, C5
