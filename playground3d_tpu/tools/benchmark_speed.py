"""Detector batch-size latency sweep (reference
pytorch_retinanet_detector_directional/benchmark_speed.py:9-47): measures
staging (host->device) and compute time per batch size.

Usage: python -m playground3d_tpu.tools.benchmark_speed [--depth 50]
       [--height 540 --width 960] [--batches 1 2 4 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.retinanet import forward_raw

    params = retinanet_init(jax.random.PRNGKey(0), depth=args.depth)
    rng = np.random.default_rng(0)
    fwd = jax.jit(lambda x: forward_raw(params, x, depth=args.depth))

    print(f"device: {jax.devices()[0]}  {args.height}x{args.width} resnet{args.depth}")
    for b in args.batches:
        host = rng.normal(0, 1, (b, args.height, args.width, 3)).astype(np.float32)

        st = time.time()
        dev = jax.device_put(host)
        jax.block_until_ready(dev)
        stage_ms = (time.time() - st) * 1000

        out = fwd(dev)
        jax.block_until_ready(out[0])
        st = time.time()
        for _ in range(args.iters):
            out = fwd(dev)
        jax.block_until_ready(out[0])
        compute_ms = (time.time() - st) / args.iters * 1000
        print(
            f"b={b:3d}: stage {stage_ms:7.2f} ms  compute {compute_ms:7.2f} ms "
            f"({b / compute_ms * 1000:.1f} im/s)"
        )


if __name__ == "__main__":
    main()
