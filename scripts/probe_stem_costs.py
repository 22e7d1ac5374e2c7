import time, numpy as np, jax, jax.numpy as jnp
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.nn import bn_apply, conv_apply, max_pool
params = retinanet_init(jax.random.PRNGKey(0), depth=50)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.normal(0,1,(1,1080,1920,3)).astype(np.float32))
frames_bf = frames.astype(jnp.bfloat16)
def bench(name, fn, n=20):
    r = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    st=time.time()
    for _ in range(n): r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    print(f"  {name}: {(time.time()-st)/n*1000:.2f} ms", flush=True)
bench("cast f32->bf16", lambda: jax.jit(lambda x: x.astype(jnp.bfloat16))(frames))
conv1 = jax.jit(lambda x: conv_apply(params["backbone"]["conv1"], x, stride=2, dtype=jnp.bfloat16))
bench("conv1 7x7s2 only", lambda: conv1(frames))
x1 = conv1(frames)
bench("maxpool only", lambda: jax.jit(lambda x: max_pool(x,3,2))(x1))
def s2d(x):
    n,h,w,c = x.shape
    x = x.reshape(n, h//4, 4, w//4, 4, c).transpose(0,1,3,2,4,5).reshape(n, h//4, w//4, 16*c)
    return x
bench("s2d reshape only", lambda: jax.jit(lambda x: s2d(x).astype(jnp.bfloat16))(frames))
w48 = jax.random.normal(jax.random.PRNGKey(1), (3,3,48,64), jnp.float32)*0.1
s2dc = jax.jit(lambda x: jax.lax.conv_general_dilated(s2d(x).astype(jnp.bfloat16), w48.astype(jnp.bfloat16), (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.bfloat16))
bench("s2d+conv48->64", lambda: s2dc(frames))
# layer1 only at 270x480x64
x2 = jax.jit(lambda x: max_pool(x,3,2))(x1)
from playground3d_tpu.models.resnet import _bottleneck_apply
def layer1(x):
    for i,b in enumerate(params["backbone"]["layer1"]):
        x = _bottleneck_apply(b, x, 1, jnp.bfloat16)
    return x
bench("layer1 only", lambda: jax.jit(layer1)(x2))
def layers234(x):
    for stage in range(1,4):
        for i,b in enumerate(params["backbone"][f"layer{stage+1}"]):
            x = _bottleneck_apply(b, x, 2 if i==0 else 1, jnp.bfloat16)
    return x
x3 = jax.jit(layer1)(x2)
bench("layers2-4 only", lambda: jax.jit(layers234)(x3))
