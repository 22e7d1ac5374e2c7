"""int8 backbone quantization (models/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.quant import (
    _iter_conv_bn,
    calibrate_backbone,
    is_quantized,
    quantize_backbone,
    quantize_detector,
    resnet_apply_int8,
)
from playground3d_tpu.models.resnet import resnet_apply, resnet_init


@pytest.mark.parametrize("depth,stem", [(18, "s2d"), (50, "conv7")])
def test_conv_walker_matches_apply_order(depth, stem):
    """_iter_conv_bn must visit exactly the convs resnet_apply calls, in
    order — locked by comparing recorded input shapes."""
    params = resnet_init(jax.random.PRNGKey(0), depth, stem=stem)
    seen = []

    def cb(pc, pbn, x, stride=1, relu=False):
        from playground3d_tpu.models.nn import bn_apply, conv_apply

        seen.append(pc["w"].shape)
        y = bn_apply(pbn, conv_apply(pc, x, stride, dtype=jnp.float32))
        return jax.nn.relu(y) if relu else y

    h = 64 if stem == "conv7" else 16
    x = jnp.zeros((1, h, h, 3 if stem == "conv7" else 48))
    jax.eval_shape(lambda p, im: resnet_apply(p, im, depth, jnp.float32, stem, conv_bn=cb), params, x)
    walked = [pc["w"].shape for pc, _ in _iter_conv_bn(params, depth)]
    assert seen == walked


def test_quantized_features_close_to_f32():
    depth = 18
    params = resnet_init(jax.random.PRNGKey(1), depth, stem="s2d")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 48)).astype(np.float32))

    absmax = calibrate_backbone(params, x, depth, stem="s2d", dtype=jnp.float32)
    q = quantize_backbone(params, absmax, depth)
    assert is_quantized(q)

    ref = resnet_apply(params, x, depth, jnp.float32, stem="s2d")
    got = resnet_apply_int8(q, x, depth, stem="s2d")
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        denom = np.abs(r).mean() + 1e-6
        rel = np.abs(r - g).mean() / denom
        assert rel < 0.12, f"quantized feature error too large: {rel}"


def test_quantize_detector_runs_detect_path():
    from playground3d_tpu.models.retinanet import detect_multiframe

    depth = 18
    params = retinanet_init(jax.random.PRNGKey(2), depth=depth, stem="s2d")
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 255, (1, 16, 24, 48), dtype=np.uint8)
    qparams = quantize_detector(params, calib, depth, stem="s2d")

    frames = jnp.asarray(rng.integers(0, 255, (2, 16, 24, 48), dtype=np.uint8))
    det = detect_multiframe(qparams, frames, depth=depth, pre_topk=64, max_dets=16, stem="s2d")
    assert det.scores.shape == (16,)
    assert bool(jnp.all(jnp.isfinite(det.scores)))

    # f32 weights retained for fallback; original tree untouched
    assert "w" in qparams["backbone"]["conv1"]
    assert "wq" not in params["backbone"]["conv1"]


def test_tail_quantization_close_and_nondestructive():
    """FPN+head int8 (quant_conv / quantize_tail): raw head outputs stay
    close to the f32 forward, and the source tree is untouched."""
    from playground3d_tpu.models.quant import (
        calibrate_tail,
        quant_conv,
        quantize_tail,
        _iter_tail_convs,
    )
    from playground3d_tpu.models.fpn import fpn_apply
    from playground3d_tpu.models.heads import head_apply
    from playground3d_tpu.models.resnet import resnet_apply

    depth = 18
    params = retinanet_init(jax.random.PRNGKey(3), depth=depth, stem="s2d")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 48, 48)).astype(np.float32))
    c3, c4, c5 = resnet_apply(params["backbone"], x, depth, jnp.float32, "s2d")

    # 8 fpn convs + 2 towers x 4 + 2 output convs
    assert len(list(_iter_tail_convs(params))) == 18

    absmax = calibrate_tail(params, c3, c4, c5, num_classes=8)
    q = quantize_tail(params, absmax)
    assert is_quantized(q["fpn"]) and is_quantized(q["heads"])
    assert "wq" not in params["fpn"]["P3_2"]  # source untouched

    ref_feats = fpn_apply(params["fpn"], c3, c4, c5, jnp.float32)
    ref_cls, ref_reg = head_apply(params["heads"], ref_feats, 8, dtype=jnp.float32, apply_sigmoid=False)
    got_feats = fpn_apply(q["fpn"], c3, c4, c5, jnp.float32, conv=quant_conv)
    got_cls, got_reg = head_apply(q["heads"], got_feats, 8, dtype=jnp.float32, apply_sigmoid=False, conv=quant_conv)

    for r, g in ((ref_cls, got_cls), (ref_reg, got_reg)):
        r, g = np.asarray(r), np.asarray(g)
        rel = np.abs(r - g).mean() / (np.abs(r).mean() + 1e-6)
        assert rel < 0.15, f"tail quant error too large: {rel}"


def test_quantize_detector_full_tree_dispatch():
    """quantize_detector(tail=True) quantizes backbone+fpn+heads and the
    standard detect path runs the mixed tree via forward_raw dispatch."""
    from playground3d_tpu.models.retinanet import detect_multiframe, forward_raw

    depth = 18
    params = retinanet_init(jax.random.PRNGKey(4), depth=depth, stem="s2d")
    rng = np.random.default_rng(3)
    calib = rng.integers(0, 255, (1, 16, 24, 48), dtype=np.uint8)
    qparams = quantize_detector(params, calib, depth, stem="s2d")
    assert is_quantized(qparams["fpn"]) and is_quantized(qparams["heads"])

    frames = jnp.asarray(rng.integers(0, 255, (2, 16, 24, 48), dtype=np.uint8))
    det = detect_multiframe(qparams, frames, depth=depth, pre_topk=64, max_dets=16, stem="s2d")
    assert bool(jnp.all(jnp.isfinite(det.scores)))

    # outputs track the bf16 forward of the SAME (unquantized) weights
    cls_q, reg_q = forward_raw(qparams, frames, depth, stem="s2d")
    cls_f, reg_f = forward_raw(params, frames, depth, stem="s2d")
    rel = np.abs(np.asarray(reg_q) - np.asarray(reg_f)).mean() / (
        np.abs(np.asarray(reg_f)).mean() + 1e-6
    )
    assert rel < 0.35, f"full-tree quant drifted too far from f32: {rel}"


def test_chained_int8_matches_hook_path():
    """resnet_apply_int8_chained == the hook-based int8 path (up to one
    fewer bf16 rounding per tensor) and close to f32."""
    from playground3d_tpu.models.quant import resnet_apply_int8_chained

    depth = 50
    params = resnet_init(jax.random.PRNGKey(5), depth, stem="s2d")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 24, 48)).astype(np.float32))

    absmax = calibrate_backbone(params, x, depth, stem="s2d", dtype=jnp.float32)
    q = quantize_backbone(params, absmax, depth, min_ch=64)

    ref = resnet_apply(params, x, depth, jnp.float32, stem="s2d")
    hook = resnet_apply_int8(q, x, depth, stem="s2d")
    chain = resnet_apply_int8_chained(q, x, depth, stem="s2d")
    for r, h, c in zip(ref, hook, chain):
        r, h, c = (np.asarray(v, np.float32) for v in (r, h, c))
        rel_f32 = np.abs(r - c).mean() / (np.abs(r).mean() + 1e-6)
        rel_hook = np.abs(h - c).mean() / (np.abs(h).mean() + 1e-6)
        assert rel_f32 < 0.15, f"chained drifted from f32: {rel_f32}"
        assert rel_hook < 0.08, f"chained drifted from hook int8: {rel_hook}"


def test_chained_int8_basic_blocks():
    """resnet18 (basic blocks) chained path runs and tracks f32."""
    from playground3d_tpu.models.quant import resnet_apply_int8_chained

    depth = 18
    params = resnet_init(jax.random.PRNGKey(6), depth, stem="s2d")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 48)).astype(np.float32))
    absmax = calibrate_backbone(params, x, depth, stem="s2d", dtype=jnp.float32)
    q = quantize_backbone(params, absmax, depth, min_ch=64)
    ref = resnet_apply(params, x, depth, jnp.float32, stem="s2d")
    chain = resnet_apply_int8_chained(q, x, depth, stem="s2d")
    for r, c in zip(ref, chain):
        r, c = np.asarray(r, np.float32), np.asarray(c, np.float32)
        rel = np.abs(r - c).mean() / (np.abs(r).mean() + 1e-6)
        assert rel < 0.15, rel


def test_chained_heads_match_hook_path():
    """head_apply_int8_chained == hook-path int8 heads (compact contract)."""
    from playground3d_tpu.models.quant import (
        calibrate_tail,
        head_apply_int8_chained,
        quant_conv,
        quantize_tail,
    )
    from playground3d_tpu.models.heads import head_apply
    from playground3d_tpu.models.resnet import resnet_apply
    from playground3d_tpu.models.fpn import fpn_apply

    for shared in (False, True):
        params = retinanet_init(
            jax.random.PRNGKey(7 + shared), depth=18, stem="s2d",
            shared_tower=shared, tower_depth=2,
        )
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(0, 1, (1, 32, 48, 48)).astype(np.float32))
        c3, c4, c5 = resnet_apply(params["backbone"], x, 18, jnp.float32, "s2d")
        absmax = calibrate_tail(params, c3, c4, c5, num_classes=8)
        q = quantize_tail(params, absmax)
        feats = fpn_apply(q["fpn"], c3, c4, c5, jnp.float32, conv=quant_conv)
        hc, hr = head_apply(
            q["heads"], feats, 8, conv=quant_conv, compact=True
        )
        cc, cr = head_apply_int8_chained(q["heads"], feats, 8)
        for hook, chain in ((hc, cc), (hr, cr)):
            hook, chain = np.asarray(hook, np.float32), np.asarray(chain, np.float32)
            rel = np.abs(hook - chain).mean() / (np.abs(hook).mean() + 1e-6)
            assert rel < 0.08, f"chained heads drifted (shared={shared}): {rel}"


def test_chained_heads_score_path_matches():
    """head_apply_int8_chained(score_path=True) == reducing its own full
    class tensor (exact: same conv outputs, max/argmax commute with
    reshape+concat)."""
    from playground3d_tpu.models.fpn import fpn_apply
    from playground3d_tpu.models.quant import (
        calibrate_tail,
        head_apply_int8_chained,
        quant_conv,
        quantize_tail,
    )
    from playground3d_tpu.models.resnet import resnet_apply

    params = retinanet_init(
        jax.random.PRNGKey(9), depth=18, stem="s2d", shared_tower=True, tower_depth=2
    )
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 48, 48)).astype(np.float32))
    c3, c4, c5 = resnet_apply(params["backbone"], x, 18, jnp.float32, "s2d")
    q = quantize_tail(params, calibrate_tail(params, c3, c4, c5, num_classes=8))
    feats = fpn_apply(q["fpn"], c3, c4, c5, jnp.float32, conv=quant_conv)
    cc, cr = head_apply_int8_chained(q["heads"], feats, 8)
    mx, arg, cr2 = head_apply_int8_chained(q["heads"], feats, 8, score_path=True)
    np.testing.assert_array_equal(np.asarray(cc).max(-1), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(cc).argmax(-1), np.asarray(arg))
    np.testing.assert_array_equal(np.asarray(cr), np.asarray(cr2))
