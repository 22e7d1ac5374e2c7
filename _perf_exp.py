import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def t(m): print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.retinanet import forward_raw
from playground3d_tpu.models.resnet import resnet_apply
from playground3d_tpu.models.fpn import fpn_apply
from playground3d_tpu.models.heads import head_apply
params = retinanet_init(jax.random.PRNGKey(0), depth=50)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.normal(0,1,(1,1080,1920,3)).astype(np.float32))
def bench(name, fn, n=10):
    r = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t(name + " compiled")
    st=time.time()
    for _ in range(n): r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    print(f"  {name}: {(time.time()-st)/n*1000:.2f} ms", flush=True)
bb = jax.jit(lambda x: resnet_apply(params["backbone"], x, 50, jnp.bfloat16))
bench("backbone bf16", lambda: bb(frames))
full = jax.jit(lambda x: forward_raw(params, x, 50))
bench("backbone+fpn+heads bf16", lambda: full(frames))
c3,c4,c5 = bb(frames)
fp = jax.jit(lambda a,b,c: fpn_apply(params["fpn"], a,b,c, jnp.bfloat16))
feats = fp(c3,c4,c5)
bench("fpn only", lambda: fp(c3,c4,c5))
hd = jax.jit(lambda f: head_apply(params["heads"], f, 8, dtype=jnp.bfloat16))
bench("heads only", lambda: hd(feats))
