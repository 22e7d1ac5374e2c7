"""Batched-KF filter rate vs object count — the reference's kf.py
self-benchmark (util_track/kf.py:430-504: synthetic random-walk tracking,
{3..1000} objects x 1000 frames, printing achieved filter FPS).

One "frame" = predict(dt) + update(z): the reference's per-frame filter
work. Times with device_ms (a fori_loop chaining the state, so nothing
hoists) and prints frames/sec per object count.
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

from playground3d_tpu.track.kf import default_params, kf_add, kf_predict, kf_update
from playground3d_tpu.pipeline.tracker_state import init_track_state
from playground3d_tpu.utils.profiling import device_ms

print(f"devices: {jax.devices()}", flush=True)
kfp = default_params()
rng = np.random.default_rng(0)

print(f"{'objects':>8s} {'ms/frame':>10s} {'filter fps':>12s}", flush=True)
for n in (4, 32, 64, 128, 512, 1024):
    state = init_track_state(n)
    x0 = np.zeros((n, 6), np.float32)
    x0[:, 0] = rng.uniform(0, 2000, n)
    x0[:, 1] = rng.uniform(0, 120, n)
    x0[:, 2:5] = [18, 7, 6]
    x0[:, 5] = 90.0
    kf = kf_add(
        state.kf, jnp.asarray(x0), jnp.ones((n,), jnp.float32),
        jnp.ones((n,), bool), kfp,
    )
    z = jnp.asarray(x0[:, :5] + rng.normal(0, 0.5, (n, 5)).astype(np.float32))
    upd = jnp.ones((n,), bool)
    dt = jnp.full((n,), 1.0 / 30.0)

    def frame(kf, z):
        kf = kf_predict(kf, dt, kfp)
        return kf_update(kf, z, upd, kfp, measurement_idx=1)

    ms = device_ms(frame, kf, z, iters=50)
    print(f"{n:>8d} {ms:>10.4f} {1000.0 / max(ms, 1e-9):>12.0f}", flush=True)
print("done", flush=True)
