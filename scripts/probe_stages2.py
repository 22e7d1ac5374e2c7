"""device_ms timings of the tracker's state-math stages at bench shapes:
parse, associate(auction), kf_update (Cholesky), lifecycle-in-context.
Args ordered floats-first so the perturbation reaches the computation
(see the first-float-arg pitfall in probe_forward_split.py)."""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

from playground3d_tpu.geometry.homography import CameraRegistry
from playground3d_tpu.models.retinanet import Detections
from playground3d_tpu.ops.assignment import assign_auction
from playground3d_tpu.pipeline.camera_bank import bank_from_registry
from playground3d_tpu.pipeline import tracker_state as TS
from playground3d_tpu.track.kf import default_params, kf_add, kf_update
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.utils.profiling import device_ms

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(7)
sp = np.stack([rng.uniform(450, 680, 24), rng.uniform(0, 120, 24)], 1)
im = sp * 2.5 + rng.normal(0, 1, (24, 2))
reg = CameraRegistry()
reg.add_camera("p1c1", im, sp, np.array([[1e6, 540.0], [960.0, 1e6], [5000.0, -3000.0]]))
bank = bank_from_registry(reg)
cfg = TrackerConfig(
    max_tracks=64, max_dets=48, pre_topk=1024, x_range=(300.0, 800.0),
    crop_slots=32, cd_max=16, cs=112, estimate_ts_bias=False,
)
kfp = default_params()

state = TS.init_track_state(cfg.max_tracks)
x0 = np.zeros((cfg.max_tracks, 7), np.float32)
x0[:, 0] = rng.uniform(460, 670, cfg.max_tracks)
x0[:, 1] = rng.uniform(5, 115, cfg.max_tracks)
x0[:, 2:5] = [18, 7, 6]
x0[:, 5] = 1
x0[:, 6] = 90.0
add_mask = np.zeros((cfg.max_tracks,), bool)
add_mask[:32] = True
kf = kf_add(
    state.kf, jnp.asarray(x0[:, [0, 1, 2, 3, 4, 6]]), jnp.asarray(x0[:, 5]),
    jnp.asarray(add_mask), kfp,
)
state = state._replace(
    kf=kf, ids=jnp.where(jnp.asarray(add_mask), jnp.arange(cfg.max_tracks), -1)
)

K = cfg.max_dets
det = Detections(
    scores=jnp.asarray(rng.uniform(0.2, 1, K).astype(np.float32)),
    classes=jnp.zeros(K, jnp.int32),
    boxes=jnp.asarray(rng.uniform(0, 900, (K, 20)).astype(np.float32)),
    cam_idx=jnp.zeros(K, jnp.int32),
    mask=jnp.ones(K, bool),
)
ct = jnp.zeros((1,), jnp.float32)
parsed = jax.jit(lambda d, c: TS.parse_detections(d, bank, c, cfg))(det, ct)
jax.block_until_ready(parsed.state)

# sparse-ish IoU benefit typical of tracking association
ben_np = np.zeros((K, cfg.max_tracks), np.float32)
for i in range(K):
    j = rng.integers(0, cfg.max_tracks)
    ben_np[i, j] = rng.uniform(0.3, 0.9)
ben = jnp.asarray(ben_np)
rmask = jnp.ones((K,), bool)
cmask = jnp.asarray(add_mask)

meas = jnp.asarray(np.concatenate([x0[:, :5]], 1).astype(np.float32))
upd = jnp.asarray(add_mask)


def t(name, fn, *args, iters=20):
    print(f"{name:<44s} {device_ms(fn, *args, iters=iters):7.3f} ms", flush=True)


t("parse_detections", lambda d, c: TS.parse_detections(d, bank, c, cfg), det, ct)
t("assign_auction 48x64 sparse", lambda b: assign_auction(b, rmask, cmask), ben)
t("associate_and_update full",
  lambda s, p: TS.associate_and_update(s, p, jnp.asarray(0.0), kfp, cfg)[0], state, parsed)
t("kf_update (cholesky) m=5", lambda s, z: kf_update(s, z, upd, kfp, 1), state.kf, meas)
t("lifecycle", lambda s: TS.lifecycle(s, jnp.asarray(0.0), kfp, cfg), state)
print("done", flush=True)
