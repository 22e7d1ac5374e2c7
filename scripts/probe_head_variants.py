"""Probe: detector forward / detect_multiframe time by head configuration.

Times resnet50/s2d at 1080p (uint8 s2d frames) across head widths and tower
shapes, plus top_k vs approx_max_k over the anchor scores — the data for
flipping the bench default (BENCHMARKS.md roadmap item 1).
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from playground3d_tpu.data.video import pack_s2d
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.retinanet import detect_multiframe, forward_raw
from playground3d_tpu.utils.profiling import device_ms

H, W = 1080, 1920
rng = np.random.default_rng(0)
raw = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
frames = jnp.asarray(pack_s2d(raw)[None])

CONFIGS = [
    ("parity 256/4/sep", dict(feature_size=256, tower_depth=4, shared_tower=False)),
    ("256/4/shared", dict(feature_size=256, tower_depth=4, shared_tower=True)),
    ("128/4/shared", dict(feature_size=128, tower_depth=4, shared_tower=True)),
    ("128/2/shared", dict(feature_size=128, tower_depth=2, shared_tower=True)),
    ("96/2/shared", dict(feature_size=96, tower_depth=2, shared_tower=True)),
]

for name, kw in CONFIGS:
    params = retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=50, stem="s2d", **kw)
    fwd = lambda p, f: forward_raw(p, f, depth=50, stem="s2d")[0]
    t_fwd = device_ms(fwd, params, frames, iters=20)
    det = partial(
        detect_multiframe, depth=50, pre_topk=1024, max_dets=48, stem="s2d"
    )
    t_det = device_ms(lambda p, f: det(p, f).scores, params, frames, iters=20)
    print(f"{name:<18} forward {t_fwd:6.2f} ms   detect_multiframe {t_det:6.2f} ms", flush=True)

# ---- top_k vs approx_max_k over anchor scores --------------------------------
A = 389205  # ~anchors at 1080p
scores = jnp.asarray(rng.normal(0, 1, (A,)).astype(np.float32))
t_top = device_ms(lambda s: jax.lax.top_k(s, 1024)[0], scores, iters=50)
t_approx = device_ms(
    lambda s: jax.lax.approx_max_k(s, 1024, recall_target=0.95)[0], scores, iters=50
)
t_approx99 = device_ms(
    lambda s: jax.lax.approx_max_k(s, 1024, recall_target=0.99)[0], scores, iters=50
)
print(f"top_k(1024/{A}): {t_top:.3f} ms   approx95: {t_approx:.3f} ms   approx99: {t_approx99:.3f} ms", flush=True)
