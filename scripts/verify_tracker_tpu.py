import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def t(m): print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)
from playground3d_tpu.geometry import CameraRegistry
from playground3d_tpu.data.synthetic import SyntheticScene, oracle_detections
from playground3d_tpu.pipeline.single_cam import SingleCameraTracker
from playground3d_tpu.utils.config import TrackerConfig
print("device:", jax.devices(), flush=True)
rng0 = np.random.default_rng(7)
f, cx, cy = 2000.0, 960.0, 540.0
cam_pos = np.array([350.0, 60.0, -45.0])
def project(p3):
    d = p3 - cam_pos
    yaw, pitch = np.deg2rad(8.0), np.deg2rad(12.0)
    Ry = np.array([[np.cos(yaw),0,np.sin(yaw)],[0,1,0],[-np.sin(yaw),0,np.cos(yaw)]])
    Rx = np.array([[1,0,0],[0,np.cos(pitch),-np.sin(pitch)],[0,np.sin(pitch),np.cos(pitch)]])
    cam = np.stack([d[:,1], -d[:,2], d[:,0]],1) @ Ry.T @ Rx.T
    return np.stack([f*cam[:,0]/cam[:,2]+cx, f*cam[:,1]/cam[:,2]+cy],1)
sp = np.stack([rng0.uniform(380,650,24), rng0.uniform(0,120,24)],1)
im = project(np.concatenate([sp, np.zeros((24,1))],1))
vp_z = project(np.array([[500.,60.,-1e7]]))[0]
reg = CameraRegistry(); reg.add_camera("p1c1", im, sp, np.array([[1e6,cy],[cx,1e6],vp_z]))
P = reg.P[0,0]
scene = SyntheticScene(n_objects=8, seed=3)
cfg = TrackerConfig(max_tracks=32, max_dets=32, x_range=(300.,750.), f_init=2)
rng = np.random.default_rng(0)
fc = {"f":0}
def detect_fn(frames):
    return oracle_detections(scene, fc["f"]/30.0, P, K=cfg.max_dets, noise_px=1.0, rng=rng)
tr = SingleCameraTracker(reg, "p1c1", cfg=cfg, detect_fn=detect_fn)
def frames():
    for f_ in range(100):
        fc["f"]=f_
        yield np.zeros((8,8,3),np.float32), 1.6e9 + f_/30.0
stats = tr.track(frames())
t(f"cold 100 frames: {stats['fps']:.1f} fps")
tr2 = SingleCameraTracker(reg, "p1c1", cfg=cfg, detect_fn=detect_fn)
stats2 = tr2.track(frames())
t(f"warm 100 frames: {stats2['fps']:.1f} fps (tracker+oracle, excl. detector)")
n_tracks = len(tr2.rows[-1][2])
print("live tracks at end:", n_tracks, flush=True)
assert n_tracks >= 3
print("VERIFY TRACKER PASSED on", jax.devices()[0].platform, flush=True)
