import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def log(m): print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.retinanet import forward_raw
from playground3d_tpu.data.video import pack_s2d
rng = np.random.default_rng(0)
raw = rng.normal(0,1,(1080,1920,3)).astype(np.float32)
packed = jnp.asarray(pack_s2d(raw)[None])
def bench(name, params, n=15):
    fwd = jax.jit(lambda x: forward_raw(params, x, 50, stem="s2d"))
    r = fwd(packed); jax.block_until_ready(r[0])
    st=time.time()
    for _ in range(n): r = fwd(packed)
    jax.block_until_ready(r[0])
    log(f"{name}: {(time.time()-st)/n*1000:.2f} ms")
for name, kw in [("parity (2x4 towers)", {}),
                 ("shared tower (1x4)", dict(shared_tower=True)),
                 ("shared 2-deep", dict(shared_tower=True, tower_depth=2))]:
    params = retinanet_init(jax.random.PRNGKey(0), depth=50, stem="s2d", **kw)
    bench(name, params)
