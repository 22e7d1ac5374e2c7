"""Probe: int8 vs bf16 conv throughput on the TPU MXU.

Decides whether a quantized (w8a8) backbone path is worth building: v5e
lists 2x int8 peak over bf16. Times representative ResNet-50 1080p-s2d
conv shapes via utils.profiling.device_ms.
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from playground3d_tpu.utils.profiling import device_ms

rng = np.random.default_rng(0)


def conv(x, w, stride=1, prefer=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer,
    )


# (name, N, H, W, Cin, Cout, k, stride) — resnet50 s2d @1080p hot shapes
SHAPES = [
    ("stem_s2d 270x480x48->64 k3", 1, 270, 480, 48, 64, 3, 1),
    ("res2 270x480x64->64 k3", 1, 270, 480, 64, 64, 3, 1),
    ("res3 135x240x128->128 k3", 1, 135, 240, 128, 128, 3, 1),
    ("res4 68x120x256->256 k3", 1, 68, 120, 256, 256, 3, 1),
    ("res5 34x60x512->512 k3", 1, 34, 60, 512, 512, 3, 1),
    ("head P3 135x240x256->256 k3", 1, 135, 240, 256, 256, 3, 1),
    ("head P3 135x240x128->128 k3", 1, 135, 240, 128, 128, 3, 1),
]

for name, n, h, w, ci, co, k, s in SHAPES:
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, ci)).astype(np.float32))
    wt = jnp.asarray(rng.normal(0, 0.05, (k, k, ci, co)).astype(np.float32))
    flops = 2 * n * (h // s) * (w // s) * ci * co * k * k

    t_bf16 = device_ms(
        lambda a, b: conv(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), s),
        x, wt, iters=200,
    )
    wi = jnp.asarray(rng.integers(-127, 127, (k, k, ci, co), dtype=np.int8))
    try:
        # quantize the (perturbed float) activation inside the timed fn —
        # matches the real w8a8 path (requantize each layer) and defeats CSE
        t_int8 = device_ms(
            lambda a, b: conv(
                jnp.clip(jnp.round(a * 16.0), -127, 127).astype(jnp.int8),
                b, s, prefer=jnp.int32,
            ).astype(jnp.float32) * 1e-6,
            x, wi, iters=200,
        )
    except Exception as e:
        t_int8 = float("nan")
        print(f"int8 failed for {name}: {type(e).__name__}: {e}")

    def rate(t):
        return flops / t / 1e9 if t and t == t else float("nan")

    print(
        f"{name:<36} bf16 {t_bf16:6.3f} ms ({rate(t_bf16):6.1f} TF/s)  "
        f"int8 {t_int8:6.3f} ms ({rate(t_int8):6.1f} TOP/s)",
        flush=True,
    )
