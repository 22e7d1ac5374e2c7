import time, numpy as np, jax, jax.numpy as jnp
from playground3d_tpu.geometry import CameraRegistry
from playground3d_tpu.pipeline.camera_bank import bank_from_registry
from playground3d_tpu.pipeline import tracker_state as TS
from playground3d_tpu.track.kf import default_params
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.models.retinanet import Detections
rng = np.random.default_rng(7)
sp = np.stack([rng.uniform(450,680,24), rng.uniform(0,120,24)],1)
im = sp * 2.5 + rng.normal(0,1,(24,2))
reg = CameraRegistry(); reg.add_camera("p1c1", im, sp, np.array([[1e6,540.],[960.,1e6],[5000.,-3000.]]))
bank = bank_from_registry(reg)
cfg = TrackerConfig(max_tracks=64, max_dets=64, x_range=(300.,800.))
kfp = default_params()
K = 64
det = Detections(scores=jnp.asarray(rng.uniform(0,1,K).astype(np.float32)),
                 classes=jnp.zeros(K,jnp.int32),
                 boxes=jnp.asarray(rng.uniform(0,500,(K,20)).astype(np.float32)),
                 cam_idx=jnp.zeros(K,jnp.int32), mask=jnp.ones(K,bool))
state = TS.init_track_state(64)
ct = jnp.zeros(1)
parse_j = jax.jit(lambda d: TS.parse_detections(d, bank, ct, cfg))
parsed = parse_j(det); jax.block_until_ready(parsed.state)
assoc_j = jax.jit(lambda s, p: TS.associate_and_update(s, p, jnp.asarray(0.), kfp, cfg)[0])
s2 = assoc_j(state, parsed); jax.block_until_ready(s2.ids)
life_j = jax.jit(lambda s: TS.lifecycle(s, jnp.asarray(0.), kfp, cfg))
s3 = life_j(s2); jax.block_until_ready(s3.ids)
snap_j = jax.jit(lambda s: TS.snapshot(s, jnp.asarray(0.), kfp, cfg))
sn = snap_j(s3); jax.block_until_ready(sn.states7)
def bench(name, fn, n=30):
    st=time.time()
    for _ in range(n): r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    print(f"{name}: {(time.time()-st)/n*1000:.2f} ms", flush=True)
bench("parse", lambda: parse_j(det))
bench("associate+update", lambda: assoc_j(state, parsed))
bench("lifecycle", lambda: life_j(s2))
bench("snapshot", lambda: snap_j(s3))
