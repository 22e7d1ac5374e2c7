"""A/B the two crop kernels on the real TPU — promote the winner, delete the
loser (round-3 VERDICT weak #7 / next #9).

Contenders for the crop-branch crop+resize (reference roi_align at
MC3D_crop_tracker.py:1185):

- ``ops/crop_mxu.crop_and_resize_s2d`` — the SHIPPED path: separable
  matmul sampling directly on s2d-packed frames (MXU does the gather).
- ``ops/pallas/crop_resize.crop_and_resize_pallas`` — a Pallas kernel (one
  crop per grid step, rows DMA'd to VMEM via scalar prefetch) on UNPACKED
  [C,H,W,3] frames. NOTE: the shipped pipeline never materializes unpacked
  1080p frames on-device, so using it would also add an unpack cost — it
  must win by a margin to justify that.

Methodology matches scripts/probe_*: jitted fori_loop with the output
chained (tunnel dispatch is async; block_until_ready alone does not bound
execution), 1-iter run differenced out.

    python scripts/ab_crop_kernels.py  # needs the real TPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from playground3d_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import numpy as np

from playground3d_tpu.utils.profiling import device_ms

N_CROPS = 32
CS = 112
ITERS = 50


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    assert dev.platform != "cpu", "this A/B needs the real TPU"

    from playground3d_tpu.models.resnet import space_to_depth
    from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d
    from playground3d_tpu.ops.pallas.crop_resize import crop_and_resize_pallas

    rng = np.random.default_rng(0)
    C, H, W = 3, 1080, 1920
    frames = rng.integers(0, 255, (C, H, W, 3)).astype(np.float32)
    frames_s2d = jnp.asarray(
        np.asarray(space_to_depth(jnp.asarray(frames))), jnp.uint8
    ).astype(jnp.bfloat16)
    frames_raw = jnp.asarray(frames, jnp.bfloat16)

    cx = rng.uniform(200, 1700, N_CROPS)
    cy = rng.uniform(200, 900, N_CROPS)
    sz = rng.uniform(60, 240, N_CROPS)
    boxes = jnp.asarray(
        np.stack([cx - sz / 2, cy - sz / 2, cx + sz / 2, cy + sz / 2], 1),
        jnp.float32,
    )
    cam = jnp.asarray(rng.integers(0, C, N_CROPS), jnp.int32)

    t_mxu = device_ms(
        lambda f, b, c: crop_and_resize_s2d(f, b, c, out_size=CS), frames_s2d, boxes, cam, iters=ITERS
    )
    print(f"crop_mxu (s2d-packed, shipped) : {t_mxu:7.3f} ms / {N_CROPS} crops",
          flush=True)

    try:
        t_pal = device_ms(
            lambda f, b, c: crop_and_resize_pallas(f, b, c, out_size=CS),
            frames_raw, boxes, cam, iters=ITERS,
        )
        print(f"pallas  (unpacked frames)     : {t_pal:7.3f} ms / {N_CROPS} crops",
              flush=True)
    except Exception as e:
        print(f"pallas kernel FAILED on TPU: {type(e).__name__}: {e}", flush=True)
        t_pal = float("inf")

    win = "crop_mxu" if t_mxu <= t_pal else "pallas"
    print(f"winner: {win}  (mxu {t_mxu:.3f} ms vs pallas {t_pal:.3f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
