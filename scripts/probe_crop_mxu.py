"""TPU probe: time the MXU crop path vs the XLA gather path, and the
convergent NMS, on the real chip. Run alone (one TPU process at a time)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from playground3d_tpu.data.video import pack_s2d
    from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d
    from playground3d_tpu.ops.nms import nms
    from playground3d_tpu.ops.roi_align import crop_and_resize

    rng = np.random.default_rng(0)
    C, H, W = 4, 1080, 1920
    frames = rng.uniform(0, 1, (C, H, W, 3)).astype(np.float32)
    s2d = np.stack([pack_s2d(f) for f in frames])
    s2d_u8 = np.stack([pack_s2d(f) for f in (frames * 255).astype(np.uint8)])

    n = 64
    ctr = rng.uniform(200, 900, (n, 2))
    size = rng.uniform(40, 700, (n, 1))
    boxes = np.concatenate([ctr - size / 2, ctr + size / 2], 1).astype(np.float32)
    cams = rng.integers(0, C, n).astype(np.int32)

    fj = jnp.asarray(frames)
    sj = jnp.asarray(s2d)
    su = jnp.asarray(s2d_u8)
    bj = jnp.asarray(boxes)
    cj = jnp.asarray(cams)

    from playground3d_tpu.utils.profiling import device_ms

    def timeit(fn, *args, iters=10, **kw):
        import functools
        return device_ms(functools.partial(fn, **kw), *args, iters=iters)

    ms_xla = timeit(crop_and_resize, fj, bj, cj, out_size=112)
    print(f"XLA gather crop 64x112^2 from 4x1080p: {ms_xla:.2f} ms", flush=True)

    ms_mxu = timeit(crop_and_resize_s2d, sj, bj, cj, out_size=112, layout="s2d")
    print(f"MXU s2d crop  (f32 frames, bf16 math): {ms_mxu:.2f} ms", flush=True)

    ms_u8 = timeit(
        crop_and_resize_s2d, su, bj, cj, out_size=112, layout="s2d", normalize=True
    )
    print(f"MXU s2d crop  (u8 frames + normalize): {ms_u8:.2f} ms", flush=True)

    # correctness spot check on-chip (small boxes -> level 0 parity)
    small = np.concatenate([ctr - 40, ctr + 40], 1).astype(np.float32)
    want = np.asarray(crop_and_resize(fj, jnp.asarray(small), cj, out_size=112))
    got = np.asarray(
        crop_and_resize_s2d(sj, jnp.asarray(small), cj, out_size=112, layout="hwc")
    )
    err = np.abs(got - want).max()
    print(f"level-0 parity max err (bf16): {err:.4f}", flush=True)
    assert err < 0.05

    # convergent NMS timing (typical workload shape)
    K = 1024
    nb = np.concatenate(
        [rng.uniform(0, 1800, (K, 2)), rng.uniform(20, 120, (K, 2))], 1
    ).astype(np.float32)
    nb[:, 2:] += nb[:, :2]
    sc = rng.uniform(0, 1, K).astype(np.float32)
    ms_nms = timeit(
        nms, jnp.asarray(nb), jnp.asarray(sc), jnp.ones(K, bool), 0.5, max_keep=128
    )
    print(f"NMS 1024->128 (while_loop to convergence): {ms_nms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
