"""Split the detector forward at 1080p s2d: backbone vs FPN vs heads,
bf16 vs int8, plus the decode/topk/NMS tail — with HONEST timing.

device_ms perturbs the first float argument; args are ordered so the
perturbed tensor feeds every conv being timed (feats/images first, params
last). Putting params first lets XLA hoist any conv that doesn't depend
on the first float param leaf out of the timing loop (measured: "heads
P3 only 0.00 ms"), which is how the first version of this probe lied.
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

from playground3d_tpu.data.video import pack_s2d
from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.quant import (
    quantize_detector,
    resnet_apply_int8,
    quant_conv,
)
from playground3d_tpu.models.resnet import resnet_apply
from playground3d_tpu.models.fpn import fpn_apply
from playground3d_tpu.models.heads import head_apply
from playground3d_tpu.models.retinanet import normalize_on_device
from playground3d_tpu.utils.profiling import device_ms

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(7)
raw = rng.integers(0, 256, (1080, 1920, 3), dtype=np.uint8)
frames_u8 = jnp.asarray(pack_s2d(raw))[None]
frames = jnp.asarray(np.asarray(normalize_on_device(frames_u8)))  # f32 input

det = retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=50, stem="s2d")
detq = quantize_detector(det, frames_u8, 50, stem="s2d")
print("quantized", flush=True)

bb = jax.jit(lambda p, im: resnet_apply_int8(p, im, 50, stem="s2d"))
c3, c4, c5 = jax.block_until_ready(bb(detq["backbone"], frames))
feats = [jnp.asarray(f) for f in jax.jit(
    lambda p, a, b, c: fpn_apply(p, a, b, c, conv=quant_conv)
)(detq["fpn"], c3, c4, c5)]
print("feats:", [tuple(f.shape) for f in feats], flush=True)


def t(name, fn, *args, iters=20):
    ms = device_ms(fn, *args, iters=iters)
    print(f"{name:<46s} {ms:7.2f} ms", flush=True)


# images/feats FIRST so the perturbation reaches every conv
t("backbone int8", lambda im, p: resnet_apply_int8(p, im, 50, stem="s2d"), frames, detq["backbone"])
t("backbone bf16", lambda im, p: resnet_apply(p, im, 50, jnp.bfloat16, stem="s2d"), frames, det["backbone"])
t("fpn int8", lambda a, b, c, p: fpn_apply(p, a, b, c, conv=quant_conv), c3, c4, c5, detq["fpn"])
t("fpn bf16", lambda a, b, c, p: fpn_apply(p, a, b, c), c3, c4, c5, det["fpn"])
t("heads int8 P3-P7", lambda f3, f4, f5, f6, f7, p: head_apply(p, [f3, f4, f5, f6, f7], 8, conv=quant_conv), *feats, detq["heads"])
t("heads bf16 P3-P7", lambda f3, f4, f5, f6, f7, p: head_apply(p, [f3, f4, f5, f6, f7], 8), *feats, det["heads"])
t("heads int8 P4-P7", lambda f4, f5, f6, f7, p: head_apply(p, [f4, f5, f6, f7], 8, conv=quant_conv), *feats[1:], detq["heads"])
t("heads bf16 P4-P7", lambda f4, f5, f6, f7, p: head_apply(p, [f4, f5, f6, f7], 8), *feats[1:], det["heads"])
t("heads int8 P3 no sigmoid",
  lambda f3, p: head_apply(p, [f3], 8, conv=quant_conv, apply_sigmoid=False), feats[0], detq["heads"])
t("heads int8 P3 with sigmoid",
  lambda f3, p: head_apply(p, [f3], 8, conv=quant_conv), feats[0], detq["heads"])

# decode/topk/NMS tail on raw head outputs
from playground3d_tpu.models.anchors import anchors_for_shape
from playground3d_tpu.models.decode import decode_regression
from playground3d_tpu.ops.nms import batched_nms

cls, reg = jax.jit(
    lambda fs, p: head_apply(p, fs, 8, conv=quant_conv)
)(feats, detq["heads"])
cls = jnp.asarray(cls)
reg = jnp.asarray(reg)
anchors = jnp.asarray(anchors_for_shape((1080, 1920)))


def tail(cls, reg, approx):
    a = anchors.shape[0]
    scores = jnp.max(cls, axis=-1).reshape(-1)
    if approx:
        top_scores, top_idx = jax.lax.approx_max_k(scores, 1024, recall_target=0.99)
    else:
        top_scores, top_idx = jax.lax.top_k(scores, 1024)
    anchor_idx = top_idx % a
    top_reg = reg.reshape(-1, 12)[top_idx]
    top_boxes = decode_regression(top_reg, anchors[anchor_idx])
    top_classes = jnp.argmax(cls.reshape(-1, 8)[top_idx], axis=-1).astype(jnp.int32)
    valid = top_scores > 1e-7
    cam = (top_idx // a).astype(jnp.int32)
    keep_idx, keep_mask = batched_nms(top_boxes[:, 16:20], top_scores, cam, valid, 0.5, max_keep=48)
    return top_scores[keep_idx], top_classes[keep_idx], keep_mask


t("decode+topk+nms tail (approx)", lambda c, r: tail(c, r, True), cls, reg)
t("decode+topk+nms tail (exact)", lambda c, r: tail(c, r, False), cls, reg)
print("done", flush=True)
