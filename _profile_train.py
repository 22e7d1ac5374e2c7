import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)
from playground3d_tpu.models import retinanet_init, anchors_for_shape
from playground3d_tpu.models.retinanet import forward_raw
from playground3d_tpu.losses import detection_loss
import optax
SHAPE=(512,768)
params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
anchors = jnp.asarray(anchors_for_shape(SHAPE))
rng = np.random.default_rng(0)
fb = jnp.asarray(rng.normal(0,1,(4,*SHAPE,3)).astype(np.float32))
lb = np.full((4,32,21),-1,np.float32)
lb[:,0,:16] = np.tile([300,200],8); lb[:,0,16:20]=[280,180,320,220]; lb[:,0,20]=1
lb = jnp.asarray(lb)
def bench(name, fn, n=10):
    r = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    st=time.time()
    for _ in range(n): r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    log(f"{name}: {(time.time()-st)/n*1000:.1f} ms")
fwd = jax.jit(lambda p, x: forward_raw(p, x, depth=18, stem="s2d"))
bench("forward only", lambda: fwd(params, fb))
lossf = jax.jit(lambda p, x, a: sum(detection_loss(*forward_raw(p, x, depth=18, stem="s2d"), a, anchors)[0:3]))
bench("forward+loss", lambda: lossf(params, fb, lb))
gradf = jax.jit(jax.grad(lambda p, x, a: sum(detection_loss(*forward_raw(p, x, depth=18, stem="s2d"), a, anchors))))
bench("grad(forward+loss)", lambda: gradf(params, fb, lb))
# grad of backbone-only surrogate (no detection loss)
surr = jax.jit(jax.grad(lambda p, x: sum(jnp.sum(o.astype(jnp.float32)**2) for o in forward_raw(p, x, depth=18, stem="s2d"))))
bench("grad(forward, L2 surrogate)", lambda: surr(params, fb))
# loss-only grad wrt cls/reg given fixed activations
cls, reg = fwd(params, fb)
lgrad = jax.jit(jax.grad(lambda c, r: sum(detection_loss(c, r, lb, anchors)), argnums=(0,1)))
bench("grad(loss only wrt cls/reg)", lambda: lgrad(cls, reg))
