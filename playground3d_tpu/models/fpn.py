"""Feature Pyramid Network P3-P7 (reference model.py:59-117 PyramidFeatures)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from playground3d_tpu.models.nn import (
    Params,
    conv_apply,
    conv_init,
    crop_add,
    upsample2x_nearest,
)


def fpn_init(key, c3_size: int, c4_size: int, c5_size: int, feature_size: int = 256) -> Params:
    ks = jax.random.split(key, 8)
    return {
        "P5_1": conv_init(ks[0], c5_size, feature_size, 1, bias=True),
        "P5_2": conv_init(ks[1], feature_size, feature_size, 3, bias=True),
        "P4_1": conv_init(ks[2], c4_size, feature_size, 1, bias=True),
        "P4_2": conv_init(ks[3], feature_size, feature_size, 3, bias=True),
        "P3_1": conv_init(ks[4], c3_size, feature_size, 1, bias=True),
        "P3_2": conv_init(ks[5], feature_size, feature_size, 3, bias=True),
        "P6": conv_init(ks[6], c5_size, feature_size, 3, bias=True),
        "P7_2": conv_init(ks[7], feature_size, feature_size, 3, bias=True),
    }


def fpn_apply(p: Params, c3, c4, c5, dtype=jnp.bfloat16, conv=conv_apply):
    """(C3,C4,C5) -> [P3,P4,P5,P6,P7], exactly the reference data flow
    (model.py:84-117): the lateral 1x1 output is both upsampled for the next
    level and 3x3-smoothed for the output.

    ``conv`` is a pluggable conv unit (``conv_apply``-compatible) so the
    int8 PTQ path (models/quant.quant_conv) reuses this exact data flow."""
    p5_x = conv(p["P5_1"], c5, dtype=dtype)
    p5_up = upsample2x_nearest(p5_x)
    p5 = conv(p["P5_2"], p5_x, dtype=dtype)

    p4_x = crop_add(conv(p["P4_1"], c4, dtype=dtype), p5_up)
    p4_up = upsample2x_nearest(p4_x)
    p4 = conv(p["P4_2"], p4_x, dtype=dtype)

    p3_x = crop_add(conv(p["P3_1"], c3, dtype=dtype), p4_up)
    p3 = conv(p["P3_2"], p3_x, dtype=dtype)

    p6 = conv(p["P6"], c5, stride=2, dtype=dtype)
    p7 = conv(p["P7_2"], jax.nn.relu(p6), stride=2, dtype=dtype)
    return [p3, p4, p5, p6, p7]
