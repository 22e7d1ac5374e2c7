import time, numpy as np, jax, jax.numpy as jnp
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.retinanet import detect_multiframe, forward_raw
from playground3d_tpu.data.video import pack_s2d
rng = np.random.default_rng(0)
raw = rng.normal(0,1,(1080,1920,3)).astype(np.float32)
packed = jnp.asarray(pack_s2d(raw)[None].astype(np.float32))
packed_bf = packed.astype(jnp.bfloat16)
params = retinanet_init(jax.random.PRNGKey(0), depth=50, stem="s2d")
def bench(name, fn, n=15):
    r = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    st=time.time()
    for _ in range(n): r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    print(f"  {name}: {(time.time()-st)/n*1000:.2f} ms", flush=True)
fwd = jax.jit(lambda x: forward_raw(params, x, 50, stem="s2d"))
bench("forward s2d-packed f32", lambda: fwd(packed))
fwd_bf = jax.jit(lambda x: forward_raw(params, x, 50, stem="s2d"))
bench("forward s2d-packed bf16-input", lambda: fwd_bf(packed_bf))
det = lambda x: detect_multiframe(params, x, depth=50, pre_topk=2048, max_dets=64, stem="s2d")
bench("detect_multiframe s2d", lambda: det(packed_bf))
