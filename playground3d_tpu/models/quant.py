"""Post-training int8 (w8a8) quantization for the ResNet backbone.

The v5e MXU runs int8 at twice the bf16 rate; the backbone is the largest
FLOP block of the detector forward (the reference runs everything f32 on
cuDNN — quantization is this framework's TPU-native speed lever, not a
reference port; the equivalent hot path is reference model.py:284-307).

Scheme
------
* weights: per-output-channel symmetric int8 (``wq``/``ws``), folded from
  the trained f32 weights;
* activations: per-tensor symmetric int8 with STATIC scales (``xs``)
  calibrated by recording ``max|x|`` at every conv input over calibration
  batches — no data-dependent scales at inference, so the whole forward
  stays one fixed XLA program;
* each conv runs int8xint8 -> int32 on the MXU, then dequantizes with one
  fused multiply-add that also folds the frozen BN (scale, offset);
* residual adds and relus stay float; the next conv requantizes.

The pluggable ``conv_bn`` hook of :func:`resnet.resnet_apply` carries the
quantized unit through the unchanged block structure; ``_iter_conv_bn``
mirrors that apply order (the contract is asserted by array count).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from playground3d_tpu.models.nn import Params, bn_apply, conv_apply
from playground3d_tpu.models.resnet import LAYER_SPECS, resnet_apply

_EPS = 1e-8


def _iter_conv_bn(params: Params, depth: int):
    """Yield (conv_p, bn_p) dicts in resnet_apply's call order."""
    yield params["conv1"], params["bn1"]
    _, layers = LAYER_SPECS[depth]
    for stage in range(4):
        for bp in params[f"layer{stage + 1}"]:
            yield bp["conv1"], bp["bn1"]
            yield bp["conv2"], bp["bn2"]
            if "conv3" in bp:
                yield bp["conv3"], bp["bn3"]
            if "down_conv" in bp:
                yield bp["down_conv"], bp["down_bn"]


def calibrate_backbone(
    params: Params, images: jnp.ndarray, depth: int, stem: str = "conv7",
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Run one f32/bf16 forward recording ``max|x|`` at each conv input.

    Returns [n_convs] absmax in apply order. Feed several representative
    batches and take the elementwise max on the host.
    """

    @jax.jit
    def run(p, im):
        absmax: List[jnp.ndarray] = []

        def cb(pc, pbn, x, stride=1, relu=False):
            absmax.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            y = bn_apply(pbn, conv_apply(pc, x, stride, dtype=dtype))
            return jax.nn.relu(y) if relu else y

        resnet_apply(p, im, depth, dtype, stem, conv_bn=cb)
        return jnp.stack(absmax)

    return run(params, images)


def _clone_tree(p):
    if isinstance(p, dict):
        return {k: _clone_tree(v) for k, v in p.items()}
    if isinstance(p, list):
        return [_clone_tree(v) for v in p]
    return p  # leaf arrays are immutable


def quantize_backbone(
    params: Params, act_absmax, depth: int, min_ch: int = 128
) -> Params:
    """Fold trained f32 backbone params + calibrated activation ranges into
    a quantized parameter tree (adds ``wq`` int8, ``ws`` [c_out], ``xs``
    scalar to the quantized conv dicts; keeps ``w`` for fallback/debug).

    ``min_ch``: only convs with >= this many INPUT channels quantize —
    measured on v5e, narrow early convs (48/64 ch at 270x480) are
    bandwidth-bound and gain nothing from int8 (scripts/probe_int8_conv.py),
    so they stay bf16 and skip the requantize round-trip.
    """
    q = _clone_tree(params)
    convs = list(_iter_conv_bn(q, depth))
    act_absmax = jnp.asarray(act_absmax)
    assert act_absmax.shape[0] == len(convs), (
        f"calibration length {act_absmax.shape[0]} != conv count {len(convs)}"
    )
    for i, (pc, _) in enumerate(convs):
        w = pc["w"]
        if w.shape[2] < min_ch:
            continue
        ws = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), _EPS) / 127.0
        pc["wq"] = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        pc["ws"] = ws
        pc["xs"] = jnp.maximum(act_absmax[i], _EPS) / 127.0
    return q


def is_quantized(p) -> bool:
    """True if any conv dict in the tree carries int8 weights."""
    if isinstance(p, dict):
        return "wq" in p or any(is_quantized(v) for v in p.values())
    if isinstance(p, list):
        return any(is_quantized(v) for v in p)
    return False


def quant_conv_bn(pc: Params, pbn: Params, x, stride: int = 1, relu: bool = False):
    """int8 conv -> fused dequant+BN multiply-add (-> relu); non-quantized
    convs (narrow early layers, see quantize_backbone) fall back to bf16.

    ``x`` is float; it is requantized with the static input scale. The
    int8xint8->int32 convolution hits the MXU's double-rate int8 path.

    Dequantized activations are emitted as **bf16** — f32 intermediates
    double the elementwise/HBM traffic of every block (133 MB per layer1
    tensor at 1080p) and were eating the entire int8 MXU win; the scale
    math stays f32, only the stored activation narrows (the bf16 path's
    own precision).
    """
    if "wq" not in pc:
        y = bn_apply(pbn, conv_apply(pc, x, stride, dtype=jnp.bfloat16))
        return jax.nn.relu(y) if relu else y
    xs = pc["xs"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, pc["wq"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    inv = jax.lax.rsqrt(pbn["var"] + 1e-5) * pbn["scale"]
    scale = xs * pc["ws"] * inv  # dequant + BN fold, [c_out]
    offset = pbn["offset"] - pbn["mean"] * inv
    out = (y.astype(jnp.float32) * scale + offset).astype(jnp.bfloat16)
    return jax.nn.relu(out) if relu else out


def resnet_apply_int8(params: Params, x, depth: int, stem: str = "conv7"):
    """Quantized twin of :func:`resnet.resnet_apply` (same signature shape).

    Hook-based (activations round-trip through bf16 between convs); kept
    for calibration and as the reference int8 semantics. The fast path is
    :func:`resnet_apply_int8_chained`."""
    return resnet_apply(params, x, depth, jnp.bfloat16, stem, conv_bn=quant_conv_bn)


# ---- chained int8: activations stay int8 in HBM ---------------------------
#
# The hook path dequantizes every conv output to bf16 and requantizes at
# the next conv's input — at 1080p layer1 (270x480 spatial) that is >1 GB
# of float round-trips per forward, which ate the int8 MXU win entirely
# (backbone int8 == bf16 at 2.1 ms). The chained path exploits linearity:
# a quantized conv can consume ANY int8 tensor with a known scale by
# folding that scale into its dequant epilogue, so producers emit int8 at
# the consumer's calibrated activation scale and HBM sees int8 end to
# end. Residual adds dequantize both operands inside one fused elementwise
# kernel and requantize the relu'd sum for the next block. Numerics differ
# from the hook path in two bounded ways: (1) one fewer bf16 rounding per
# tensor, and (2) block inputs are clipped to the NEXT conv's calibrated
# [-127*xs, 127*xs] range BEFORE the residual add, so residuals that fall
# outside the consumer's calibration range saturate here but not in the
# hook path (tests bound the combined drift at <8%).


def _chain_qconv(pc, pbn, cur, stride, relu, emit_xs):
    """One conv+BN(+relu) on a chained value.

    ``cur`` is ("f", x_float) or ("i8", x_q, scale); ``emit_xs`` is the
    consumer's activation scale (emit int8) or None (emit bf16)."""
    if "wq" not in pc:
        x = _chain_f(cur)
        y = bn_apply(pbn, conv_apply(pc, x, stride, dtype=jnp.bfloat16))
        if relu:
            y = jax.nn.relu(y)
        if emit_xs is not None:
            q = jnp.clip(jnp.round(y.astype(jnp.float32) / emit_xs), -127.0, 127.0)
            return ("i8", q.astype(jnp.int8), emit_xs)
        return ("f", y)
    if cur[0] == "f":
        xs = pc["xs"]
        xq = jnp.clip(
            jnp.round(cur[1].astype(jnp.float32) / xs), -127.0, 127.0
        ).astype(jnp.int8)
        s_in = xs
    else:
        xq, s_in = cur[1], cur[2]
    y = jax.lax.conv_general_dilated(
        xq, pc["wq"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    inv = jax.lax.rsqrt(pbn["var"] + 1e-5) * pbn["scale"]
    scale = s_in * pc["ws"] * inv  # fold the ACTUAL input scale
    offset = pbn["offset"] - pbn["mean"] * inv
    out = y.astype(jnp.float32) * scale + offset
    if relu:
        out = jax.nn.relu(out)
    if emit_xs is not None:
        q = jnp.clip(jnp.round(out / emit_xs), -127.0, 127.0)
        return ("i8", q.astype(jnp.int8), emit_xs)
    return ("f", out.astype(jnp.bfloat16))


def _chain_f(cur):
    """Chained value -> float tensor (dequantize if int8)."""
    if cur[0] == "f":
        return cur[1]
    return cur[1].astype(jnp.bfloat16) * cur[2].astype(jnp.bfloat16)


def _xs_of(pc):
    return pc["xs"] if "wq" in pc else None


def _chain_requant(x_float, emit_xs):
    if emit_xs is None:
        return ("f", x_float)
    q = jnp.clip(jnp.round(x_float.astype(jnp.float32) / emit_xs), -127.0, 127.0)
    return ("i8", q.astype(jnp.int8), emit_xs)


def _chain_qconv_b(pc, cur, stride, relu, emit_xs, dtype=jnp.bfloat16):
    """Biased-conv twin of :func:`_chain_qconv` (FPN/head convs: bias, no
    BN)."""
    if "wq" not in pc:
        y = conv_apply(pc, _chain_f(cur), stride, dtype=dtype)
        if relu:
            y = jax.nn.relu(y)
        return _chain_requant(y, emit_xs) if emit_xs is not None else ("f", y)
    if cur[0] == "f":
        xs = pc["xs"]
        xq = jnp.clip(
            jnp.round(cur[1].astype(jnp.float32) / xs), -127.0, 127.0
        ).astype(jnp.int8)
        s_in = xs
    else:
        xq, s_in = cur[1], cur[2]
    y = jax.lax.conv_general_dilated(
        xq, pc["wq"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (s_in * pc["ws"])
    if "b" in pc:
        out = out + pc["b"]
    if relu:
        out = jax.nn.relu(out)
    if emit_xs is not None:
        q = jnp.clip(jnp.round(out / emit_xs), -127.0, 127.0)
        return ("i8", q.astype(jnp.int8), emit_xs)
    return ("f", out.astype(jnp.bfloat16))


def head_apply_int8_chained(
    p: Params, features, num_classes: int, num_anchors: int = 9,
    score_path: bool = False,
):
    """Chained-int8 twin of heads.head_apply(compact=True): tower
    activations stay int8 between convs (each conv emits at its
    consumer's calibrated scale; with a shared tower the final tower
    tensor feeds both output convs, which fold the SAME producer scale).
    Returns bf16 logits/regression — the compact contract.

    ``score_path=True`` additionally reduces the class axis per level at
    the conv's natural layout (max + argmax) and returns
    (max_logits [N,A], arg_cls [N,A] i32, reg [N,A,12]) — see
    heads.head_apply."""
    from playground3d_tpu.models.heads import N_REG_OUTPUTS

    shared = p.get("reg_tower") is None

    def tower(tw, f, out_pc):
        cur = ("f", f)
        for i, c in enumerate(tw):
            nxt = tw[i + 1] if i + 1 < len(tw) else out_pc
            cur = _chain_qconv_b(c, cur, 1, True, _xs_of(nxt))
        return cur

    cls_all, reg_all, arg_all = [], [], []
    for f in features:
        n, h, w, _ = f.shape
        ct = tower(p["cls_tower"], f, p["cls_out"])
        rt = ct if shared else tower(p["reg_tower"], f, p["reg_out"])
        c = _chain_f(_chain_qconv_b(p["cls_out"], ct, 1, False, None))
        r = _chain_f(_chain_qconv_b(p["reg_out"], rt, 1, False, None))
        if score_path:
            c5 = c.reshape(n, h, w, num_anchors, num_classes)
            cls_all.append(jnp.max(c5, axis=-1).reshape(n, h * w * num_anchors))
            arg_all.append(
                jnp.argmax(c5, axis=-1).astype(jnp.int32).reshape(n, h * w * num_anchors)
            )
        else:
            cls_all.append(c.reshape(n, h * w * num_anchors, num_classes))
        reg_all.append(r.reshape(n, h * w * num_anchors, N_REG_OUTPUTS))
    cls = jnp.concatenate(cls_all, axis=1)
    reg = jnp.concatenate(reg_all, axis=1)
    if score_path:
        return (
            cls.astype(jnp.bfloat16),
            jnp.concatenate(arg_all, axis=1),
            reg.astype(jnp.bfloat16),
        )
    return cls.astype(jnp.bfloat16), reg.astype(jnp.bfloat16)


def resnet_apply_int8_chained(params: Params, x, depth: int, stem: str = "conv7"):
    """Chained-int8 twin of :func:`resnet.resnet_apply` -> (C3, C4, C5).

    Mirrors resnet_apply's exact block structure (resnet.py:143-180); the
    conv/BN/relu placements are the contract. Stage outputs return as
    bf16 for the FPN.
    """
    from playground3d_tpu.models.resnet import (
        LAYER_SPECS,
        max_pool,
        space_to_depth,
    )

    block_type, layers = LAYER_SPECS[depth]

    if stem == "s2d":
        if x.shape[-1] == 3:
            x = space_to_depth(x, 4)
        cur = _chain_qconv(params["conv1"], params["bn1"], ("f", x), 1, True, None)
    else:
        cur = _chain_qconv(params["conv1"], params["bn1"], ("f", x), 2, True, None)
        cur = ("f", max_pool(_chain_f(cur), 3, 2))

    def block(bp, cur, stride, out_xs):
        if block_type == "basic":
            h = _chain_qconv(bp["conv1"], bp["bn1"], cur, stride, True, _xs_of(bp["conv2"]))
            hf = _chain_f(_chain_qconv(bp["conv2"], bp["bn2"], h, 1, False, None))
        else:
            h = _chain_qconv(bp["conv1"], bp["bn1"], cur, 1, True, _xs_of(bp["conv2"]))
            h = _chain_qconv(bp["conv2"], bp["bn2"], h, stride, True, _xs_of(bp["conv3"]))
            hf = _chain_f(_chain_qconv(bp["conv3"], bp["bn3"], h, 1, False, None))
        if "down_conv" in bp:
            res = _chain_f(
                _chain_qconv(bp["down_conv"], bp["down_bn"], cur, stride, False, None)
            )
        else:
            res = _chain_f(cur)
        out = jax.nn.relu(hf + res)
        return _chain_requant(out, out_xs)

    feats = []
    stages = [params[f"layer{i + 1}"] for i in range(4)]
    for stage_i, blocks in enumerate(stages):
        stride = 1 if stage_i == 0 else 2
        for bi, bp in enumerate(blocks):
            # the block output's consumer: next block's conv1 (same stage),
            # or the next stage's first block conv1. C3/C4/C5 (stages 2-4)
            # also feed the FPN laterals, so those stage outputs emit bf16;
            # layer1's output is chain-internal and stays int8.
            if bi + 1 < len(blocks):
                out_xs = _xs_of(blocks[bi + 1]["conv1"])
            elif stage_i == 0:
                out_xs = _xs_of(stages[1][0]["conv1"])
            else:
                out_xs = None  # C3/C4/C5: bf16 for the FPN
            cur = block(bp, cur, stride if bi == 0 else 1, out_xs)
        if stage_i >= 1:
            feats.append(_chain_f(cur))
    return feats[0], feats[1], feats[2]


# ---- FPN + head ("tail") quantization --------------------------------------
#
# The parity-width heads are the largest non-backbone FLOP block of the
# detect step (two 4-conv 256-ch towers over all five pyramid levels; the
# stride-8 level alone is ~75% of head cells), so int8 on the tail roughly
# matches the backbone win. Same w8a8 scheme; these convs carry a bias
# instead of a BN (conv_init(bias=True), fpn.py / heads.py), so dequant is
# one multiply plus the f32 bias.


def _iter_tail_convs(params: Params):
    """Yield the fpn+head conv dicts in a canonical order.

    Each dict is yielded ONCE even though head towers apply to all five
    levels — a quantized conv's static ``xs`` covers every call site (the
    calibrator takes the max over calls on the same dict).
    """
    fpn = params["fpn"]
    for k in ("P5_1", "P5_2", "P4_1", "P4_2", "P3_1", "P3_2", "P6", "P7_2"):
        yield fpn[k]
    heads = params["heads"]
    for c in heads["cls_tower"]:
        yield c
    if heads.get("reg_tower") is not None:
        for c in heads["reg_tower"]:
            yield c
    yield heads["cls_out"]
    yield heads["reg_out"]


def quant_conv(pc: Params, x, stride: int = 1, padding="SAME", dtype=jnp.bfloat16):
    """``conv_apply``-compatible int8 unit for biased convs (FPN/heads).

    Non-quantized convs fall back to bf16; quantized ones requantize the
    input with the static scale, run int8xint8->int32 on the MXU, and
    dequantize with one per-channel multiply + the f32 bias."""
    if "wq" not in pc:
        return conv_apply(pc, x, stride, padding, dtype=dtype)
    xs = pc["xs"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, pc["wq"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (xs * pc["ws"])
    if "b" in pc:
        out = out + pc["b"]
    return out.astype(jnp.bfloat16)  # see quant_conv_bn: bf16 activations


def _calibrating_conv(store: dict):
    """A ``conv_apply``-compatible unit that records max|x| per conv dict
    (keyed by object identity, accumulated across call sites)."""

    def conv(pc, x, stride=1, padding="SAME", dtype=jnp.bfloat16):
        a = jnp.max(jnp.abs(x.astype(jnp.float32)))
        k = id(pc)
        store[k] = a if k not in store else jnp.maximum(store[k], a)
        return conv_apply(pc, x, stride, padding, dtype=dtype)

    return conv


def calibrate_tail(params: Params, c3, c4, c5, num_classes: int) -> jnp.ndarray:
    """Run one fpn+heads forward on (quantized-)backbone features, recording
    max|x| at every conv input. Returns [n_tail_convs] in
    :func:`_iter_tail_convs` order."""
    from playground3d_tpu.models.fpn import fpn_apply
    from playground3d_tpu.models.heads import head_apply

    @jax.jit
    def run(p, c3, c4, c5):
        store: dict = {}
        conv = _calibrating_conv(store)
        feats = fpn_apply(p["fpn"], c3, c4, c5, conv=conv)
        head_apply(p["heads"], feats, num_classes, conv=conv, apply_sigmoid=False)
        return jnp.stack([store[id(pc)] for pc in _iter_tail_convs(p)])

    return run(params, c3, c4, c5)


def quantize_tail(
    params: Params, act_absmax, quant_outputs: bool = True, min_ch: int = 128
) -> Params:
    """Attach int8 weights + scales to the fpn/head convs (in place on a
    cloned tree). ``quant_outputs=False`` keeps the final cls/reg output
    convs bf16 (the regression outputs are the precision-critical ones)."""
    q = _clone_tree({"fpn": params["fpn"], "heads": params["heads"]})
    convs = list(_iter_tail_convs(q))
    act_absmax = jnp.asarray(act_absmax)
    assert act_absmax.shape[0] == len(convs), (
        f"calibration length {act_absmax.shape[0]} != tail conv count {len(convs)}"
    )
    outputs = {id(q["heads"]["cls_out"]), id(q["heads"]["reg_out"])}
    for i, pc in enumerate(convs):
        if not quant_outputs and id(pc) in outputs:
            continue
        w = pc["w"]
        if w.shape[2] < min_ch:
            continue
        ws = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), _EPS) / 127.0
        pc["wq"] = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        pc["ws"] = ws
        pc["xs"] = jnp.maximum(act_absmax[i], _EPS) / 127.0
    return q


def quantize_detector(
    params: Params,
    calib_images,
    depth: int,
    stem: str = "conv7",
    tail: bool = True,
    quant_outputs: bool = True,
    num_anchors: int = 9,
) -> Params:
    """Full-detector PTQ entry point: calibrate on representative frames
    (same dtype/layout the pipeline feeds — uint8 s2d is normalized exactly
    as at inference), quantize the backbone, then calibrate the FPN/heads on
    the QUANTIZED backbone's features (so the static scales match what the
    tail actually sees at inference) and quantize them too. The returned
    tree drops into every existing forward (forward_raw dispatches on the
    ``wq`` key). ``tail=False`` restores the backbone-only scheme."""
    from playground3d_tpu.models.retinanet import normalize_on_device

    batches = calib_images if isinstance(calib_images, (list, tuple)) else [calib_images]
    batches = [normalize_on_device(jnp.asarray(im)) for im in batches]
    absmax = None
    for im in batches:
        a = calibrate_backbone(params["backbone"], im, depth, stem)
        absmax = a if absmax is None else jnp.maximum(absmax, a)
    out = dict(params)
    # min_ch=128: narrow early convs stay bf16. min_ch=64 (quantizing the
    # layer1 convs for an unbroken int8 chain) measured only +4 fps and
    # cost 0.027 MOTA on the e2e A/B — the narrow convs carry the most
    # activation signal; the chained apply bridges them through bf16.
    out["backbone"] = quantize_backbone(params["backbone"], absmax, depth)
    if tail:
        bb = jax.jit(
            lambda p, im: resnet_apply_int8(p, im, depth, stem=stem)
        )
        tail_absmax = None
        for im in batches:
            c3, c4, c5 = bb(out["backbone"], im)
            # cls_out emits num_anchors*num_classes channels; the anchor
            # count must come from the caller (models built with
            # non-default num_anchors would otherwise mis-infer classes)
            num_classes = params["heads"]["cls_out"]["b"].shape[0] // num_anchors
            a = calibrate_tail(params, c3, c4, c5, num_classes)
            tail_absmax = a if tail_absmax is None else jnp.maximum(tail_absmax, a)
        qt = quantize_tail(params, tail_absmax, quant_outputs=quant_outputs)
        out["fpn"] = qt["fpn"]
        out["heads"] = qt["heads"]
    return out
