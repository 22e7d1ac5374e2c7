import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def t(m): print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)
from playground3d_tpu.geometry import CameraRegistry
from playground3d_tpu.pipeline.camera_bank import bank_from_registry
from playground3d_tpu.pipeline.single_cam import make_track_step
from playground3d_tpu.pipeline.tracker_state import init_track_state
from playground3d_tpu.track.kf import default_params
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.models.retinanet import Detections
print("device:", jax.devices(), flush=True)
rng = np.random.default_rng(7)
sp = np.stack([rng.uniform(450,680,24), rng.uniform(0,120,24)],1)
im = sp * 2.5 + rng.normal(0,1,(24,2))
reg = CameraRegistry(); reg.add_camera("p1c1", im, sp, np.array([[1e6,540.],[960.,1e6],[5000.,-3000.]]))
cfg = TrackerConfig(max_tracks=64, max_dets=64, x_range=(300.,800.))
step = make_track_step(bank_from_registry(reg), default_params(), cfg)
state = init_track_state(cfg.max_tracks)
K = cfg.max_dets
det = Detections(scores=jnp.zeros(K), classes=jnp.zeros(K,jnp.int32),
                 boxes=jnp.zeros((K,20)), cam_idx=jnp.zeros(K,jnp.int32), mask=jnp.zeros(K,bool))
t("setup")
state2, snap = step(state, det, jnp.zeros(1))
jax.block_until_ready(snap.states7)
t("tracker-only step COMPILED")
st=time.time()
for _ in range(50):
    state2, snap = step(state2, det, jnp.zeros(1))
jax.block_until_ready(snap.states7)
t(f"tracker-only step: {(time.time()-st)*20:.1f} ms/step")
