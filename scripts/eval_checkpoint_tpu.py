"""Track+eval from the step-999 checkpoint (training killed mid-run)."""
import time, numpy as np, jax
T0=time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)
from playground3d_tpu.data.dataset import SyntheticDetectionDataset
from playground3d_tpu.data.synthetic import SyntheticScene
from playground3d_tpu.data.video import SyntheticVideoSource
from playground3d_tpu.evaluation import geometry_np as G
from playground3d_tpu.evaluation.csv_io import TrackRecord, write_results_csv
from playground3d_tpu.evaluation.mot import MOTEvaluator
from playground3d_tpu.models import retinanet_init, load_params
from playground3d_tpu.pipeline.single_cam import SingleCameraTracker
from playground3d_tpu.utils.config import TrackerConfig
from playground3d_tpu.utils.constants import CLASS_NAMES
ds = SyntheticDetectionDataset(image_shape=(512,768), n_objects=6, seed=0, zoom=1.5)
params = load_params('/tmp/demo_e2e_detector.npz',
                     retinanet_init(jax.random.PRNGKey(0), depth=18, stem='s2d'))
reg = ds.camera_registry()
scene = SyntheticScene(n_objects=8, seed=77, x_spawn=(450.,660.), x_visible=(445.,680.))
tcfg = TrackerConfig(max_tracks=32, max_dets=32, pre_topk=1024,
                     x_range=(430.,700.), f_init=2, sigma_d=0.25)
tracker = SingleCameraTracker(reg, "p1c1", cfg=tcfg, det_params=params, depth=18, stem="s2d")
src = SyntheticVideoSource(scene, reg.P[0,0], n_frames=120, height=512, width=768, t0=1.6e9)
stats = tracker.track(src)
log(f"tracked {stats['frames']} frames")
tracker.write_results_csv('/tmp/ckpt_pred.csv')
gt = []
for f in range(120):
    t = f/30.0
    states, idx = scene.states_at(t)
    if len(states)==0: continue
    space = G.state_to_space(states); im = G.space_to_im(space, reg.P[0,0])
    for i in range(len(states)):
        gt.append(TrackRecord(frame=f, timestamp=1.6e9+t, obj_id=int(idx[i]),
            class_name=CLASS_NAMES[int(scene.classes[idx[i]])], state7=states[i],
            im_corners=im[i], space_footprint=space[i,0:4,:2], camera="p1c1"))
write_results_csv('/tmp/ckpt_gt.csv', gt)
ev = MOTEvaluator('/tmp/ckpt_gt.csv','/tmp/ckpt_pred.csv', reg.H[0,0], reg.P[0,0],
                  match_iou=0.2, cutoff_frame=120)
m = ev.evaluate()
log("1000-step detector, single-cam, 120 frames:")
for k in ["TP","FP","FN","Recall","Precision","MOTA","ID switches",
          "X precision","Y precision"]:
    print(f"  {k}: {m[k]}", flush=True)
