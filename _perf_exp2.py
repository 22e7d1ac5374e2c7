import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def t(m): print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)
import playground3d_tpu.models.nn as nn_mod
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.resnet import resnet_apply
params = retinanet_init(jax.random.PRNGKey(0), depth=50)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.normal(0,1,(1,1080,1920,3)).astype(np.float32))
def bench(name, fn, n=10):
    r = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    st=time.time()
    for _ in range(n): r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    print(f"  {name}: {(time.time()-st)/n*1000:.2f} ms", flush=True)

# variant A: f32 accumulation in convs
orig_conv = nn_mod.conv_apply
def conv_f32acc(p, x, stride=1, padding="SAME", dtype=jnp.bfloat16):
    w = p["w"].astype(dtype)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (stride, stride), padding,
        dimension_numbers=("NHWC","HWIO","NHWC"),
        preferred_element_type=jnp.float32).astype(dtype)
    if "b" in p: out = out + p["b"].astype(dtype)
    return out
import playground3d_tpu.models.resnet as rn
nn_orig_in_rn = rn.conv_apply
rn.conv_apply = conv_f32acc
bbA = jax.jit(lambda x: rn.resnet_apply(params["backbone"], x, 50, jnp.bfloat16))
bench("backbone f32-accum", lambda: bbA(frames))
rn.conv_apply = nn_orig_in_rn

# variant B: space-to-depth stem replacing conv1(7x7 s2)+maxpool
# s2d 4x4: [1,1080,1920,3] -> [1,270,480,48]; conv3x3 48->64
key = jax.random.PRNGKey(1)
w_s2d = jax.random.normal(key, (3,3,48,64), jnp.float32) * np.sqrt(2/(9*48))
def s2d(x):
    n,h,w,c = x.shape
    x = x.reshape(n, h//4, 4, w//4, 4, c).transpose(0,1,3,2,4,5).reshape(n, h//4, w//4, 16*c)
    return x
def backbone_s2d(x):
    x = s2d(x).astype(jnp.bfloat16)
    x = jax.lax.conv_general_dilated(x, w_s2d.astype(jnp.bfloat16), (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.bfloat16)
    x = jax.nn.relu(x)
    feats = []
    bp = params["backbone"]
    from playground3d_tpu.models.resnet import _bottleneck_apply, LAYER_SPECS
    for stage in range(4):
        blocks = bp[f"layer{stage+1}"]
        stride = 1 if stage == 0 else 2
        for i, b in enumerate(blocks):
            x = _bottleneck_apply(b, x, stride if i == 0 else 1, jnp.bfloat16)
        feats.append(x)
    return feats[1], feats[2], feats[3]
bbB = jax.jit(backbone_s2d)
bench("backbone s2d-stem", lambda: bbB(frames))

# variant C: stem-only cost (conv7x7 s2 + pool)
from playground3d_tpu.models.nn import bn_apply, conv_apply, max_pool
def stem_only(x):
    x = conv_apply(params["backbone"]["conv1"], x, stride=2, dtype=jnp.bfloat16)
    x = jax.nn.relu(bn_apply(params["backbone"]["bn1"], x))
    return max_pool(x, 3, 2)
bench("stem(conv7+pool) only", lambda: jax.jit(stem_only)(frames))
