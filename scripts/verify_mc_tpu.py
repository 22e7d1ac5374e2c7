"""TPU drive of the multi-camera crop tracker: real detector + crop detector
(untrained weights; validates the compiled path + timing)."""
import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def t(m): print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)
from playground3d_tpu.data.toy_cameras import toy_camera_chain
from playground3d_tpu.data.synthetic import SyntheticScene, mc_oracle_detections
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.pipeline.multi_cam import MultiCameraTracker
from playground3d_tpu.utils.config import TrackerConfig
print("device:", jax.devices(), flush=True)
reg, ranges, centers, _ = toy_camera_chain(3)
cameras = list(ranges.keys())
lo = min(r[0] for r in ranges.values()); hi = max(r[1] for r in ranges.values())
scene = SyntheticScene(n_objects=10, seed=3, x_spawn=(lo+20, hi-20), x_visible=(lo, hi))
cfg = TrackerConfig(max_tracks=32, max_dets=64, x_range=(lo-50, hi+50), f_init=2,
                    det_step=3, cd_max=16, estimate_ts_bias=True)
params = retinanet_init(jax.random.PRNGKey(0), depth=50, stem="s2d")
crop_params = retinanet_init(jax.random.PRNGKey(1), depth=50)
rng = np.random.default_rng(0)
holder = {"f": 0}
def detect_fn(frames, frame_num):
    return mc_oracle_detections(scene, [holder["f"]/30.0]*3, reg, cameras, ranges, cfg.max_dets, rng)
# Use oracle for the DETECT branch (so tracks exist) but the REAL crop
# detector for the crop branch -> compiles + times the full crop path.
tracker = MultiCameraTracker(reg, cameras, cfg=cfg, detect_fn=detect_fn,
                             crop_params=crop_params, depth=50, centers=centers)
H, W = 1080, 1920
frames = rng.normal(0, 1, (3, H, W, 3)).astype(np.float32)
for f in range(9):
    holder["f"] = f
    snap = tracker.process(frames, [1.6e9 + f/30.0]*3, f)
    if f == 0: t("first detect frame (compile)")
    if f == 1: t("first crop frame (compile)")
jax.block_until_ready(tracker.state.kf.x)
t("9 frames done")
st = time.time(); n = 12
for f in range(9, 9+n):
    holder["f"] = f
    tracker.process(frames, [1.6e9 + f/30.0]*3, f)
jax.block_until_ready(tracker.state.kf.x)
dtm = (time.time()-st)/n*1000
crop_ms = tracker.timers.acc["crop"] / max(1, len([1 for f in range(9+n) if f % 3 != 0])) * 1000
t(f"steady state: {dtm:.1f} ms/frame-step (3 cams, d=3); timers={ {k: round(v,2) for k,v in tracker.timers.totals().items()} }")
nlive = len(tracker.rows[-1][2])
print("live tracks:", nlive, flush=True)
assert nlive >= 3
print("VERIFY MC TRACKER PASSED", flush=True)
