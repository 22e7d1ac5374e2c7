import time, numpy as np, jax
T0=time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)
from playground3d_tpu.data.dataset import Prefetcher, SyntheticDetectionDataset
from playground3d_tpu.train.trainer import TrainConfig, Trainer
from playground3d_tpu.models.nn import save_params

# (a) device-only train-step timing: constant staged batch
cfg = TrainConfig(depth=18, stem="s2d", image_shape=(512,768), lr=3e-4)
tr = Trainer(cfg, key=jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
fb = rng.normal(0,1,(4,512,768,3)).astype(np.float32)
lb = np.full((4,32,21),-1,np.float32)
lb[:,0,:16] = np.tile([300,200],8); lb[:,0,16:20]=[280,180,320,220]; lb[:,0,20]=1
m = tr.train_step(fb, lb)
log(f"train step compiled; loss={float(m['loss']):.3f}")
st=time.time(); n=20
for _ in range(n): m = tr.train_step(fb, lb)
jax.block_until_ready(m["loss"])
log(f"device-only train step: {(time.time()-st)/n*1000:.1f} ms (constant batch)")

# (b) crop detector long training, 8 workers
ccfg = TrainConfig(depth=18, stem="conv7", image_shape=(112,112), lr=3e-4)
ctr = Trainer(ccfg, key=jax.random.PRNGKey(1))
cds = SyntheticDetectionDataset(image_shape=(512,768), n_objects=6, seed=1,
                                augment=True, zoom=1.5, crop_mode=True, crop_size=112)
pf = Prefetcher(factory=cds.batch_factory(8), workers=8, depth=6)
for step in range(3000):
    frames, labels = next(pf)
    m = ctr.train_step(frames, labels)
    if step % 500 == 0:
        log(f"crop step {step}: loss={float(m['loss']):.4f}")
pf.close()
log(f"crop training done: loss={float(m['loss']):.4f}")
save_params("/tmp/demo_mc_crop2.npz", jax.device_get(ctr.state.params))
print("CROP ROUND2 DONE", flush=True)
