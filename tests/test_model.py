"""Detector tests: shapes, anchor parity with the reference formulas,
decode round-trip against a numpy reimplementation, detection paths on tiny
images, loss behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from playground3d_tpu.models import (
    anchors_for_shape,
    decode_regression,
    detect_multiframe,
    detect_singleframe,
    forward_raw,
    localize,
    retinanet_init,
)
from playground3d_tpu.models.anchors import NUM_ANCHORS, PYRAMID_LEVELS, level_shape
from playground3d_tpu.losses import detection_loss

IMG = (128, 192)  # tiny test resolution (divisible cleanly by 128)


@pytest.fixture(scope="module")
def params18():
    return retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=18)


def test_anchor_count_formula():
    total = 0
    for level in PYRAMID_LEVELS:
        gh, gw = level_shape(IMG, level)
        s = 2 ** level
        assert gh == (IMG[0] + s - 1) // s
        total += gh * gw * NUM_ANCHORS
    anchors = anchors_for_shape(IMG)
    assert anchors.shape == (total, 4)


def test_anchor_reference_values():
    """First-level anchors match the reference generate_anchors numbers."""
    anchors = anchors_for_shape(IMG)
    # anchor 4 of cell (0,0) at level 3: ratio 1, scale 2^(1/3), size 32
    # w = h = 32 * 2^(1/3); centered at (0.5*8, 0.5*8)
    side = 32 * 2 ** (1 / 3)
    a = anchors[4]
    np.testing.assert_allclose(a[2] - a[0], side, rtol=1e-5)
    np.testing.assert_allclose((a[0] + a[2]) / 2, 4.0, atol=1e-4)


def test_base_anchors_full_table():
    """Full 9x4 value parity with the reference's generate_anchors output.

    Constants below were produced by the reference tile/repeat/area
    renormalization recipe (anchors.py:42-73) for base_size=32 — the
    idiomatic w = base*s/sqrt(r), h = w*r rewrite must reproduce them
    exactly (ratio-major, scale-minor row order)."""
    from playground3d_tpu.models.anchors import base_anchors

    want = np.array(
        [
            # ratio 0.5: w = 32*s*sqrt(2), h = w/2
            [-22.627417, -11.3137085, 22.627417, 11.3137085],
            [-28.50876, -14.25438, 28.50876, 14.25438],
            [-35.91878, -17.95939, 35.91878, 17.95939],
            # ratio 1.0: w = h = 32*s
            [-16.0, -16.0, 16.0, 16.0],
            [-20.158737, -20.158737, 20.158737, 20.158737],
            [-25.398417, -25.398417, 25.398417, 25.398417],
            # ratio 2.0: w = 32*s/sqrt(2), h = 2w
            [-11.3137085, -22.627417, 11.3137085, 22.627417],
            [-14.25438, -28.50876, 14.25438, 28.50876],
            [-17.95939, -35.91878, 17.95939, 35.91878],
        ]
    )
    np.testing.assert_allclose(base_anchors(32.0), want, rtol=1e-6)


def test_decode_matches_numpy(rng):
    A = 16
    anchors = rng.uniform(0, 100, (A, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(10, 50, (A, 2))
    reg = rng.normal(0, 0.3, (1, A, 12)).astype(np.float32)

    got = np.asarray(decode_regression(jnp.asarray(reg), jnp.asarray(anchors)))[0]

    # numpy replica of reference BBoxTransform.forward (utils.py:102-149)
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h
    r = reg[0]
    preds = np.zeros((A, 20), np.float32)
    signs = [(-1,-1,1),(-1,1,1),(1,-1,1),(1,1,1),(-1,-1,-1),(-1,1,-1),(1,-1,-1),(1,1,-1)]
    for k, (sl, sw, sh) in enumerate(signs):
        preds[:, 2*k] = r[:, 0] + sl*r[:, 2] + sw*r[:, 4] + sh*r[:, 6]
        preds[:, 2*k+1] = r[:, 1] + sl*r[:, 3] + sw*r[:, 5] + sh*r[:, 7]
    preds[:, 16:20] = r[:, 8:12]
    preds[:, 0::2] = preds[:, 0::2] * w[:, None] + cx[:, None]
    preds[:, 1::2] = preds[:, 1::2] * h[:, None] + cy[:, None]

    np.testing.assert_allclose(got, preds, rtol=1e-4, atol=1e-3)


def test_forward_shapes(params18):
    imgs = jnp.zeros((2, *IMG, 3), jnp.float32)
    cls, reg = jax.jit(
        lambda p, x: forward_raw(p, x, depth=18), static_argnums=()
    )(params18, imgs)
    a = anchors_for_shape(IMG).shape[0]
    assert cls.shape == (2, a, 8)
    assert reg.shape == (2, a, 12)
    # prior-initialized classification scores ~= 0.01 everywhere
    np.testing.assert_allclose(np.asarray(cls), 0.01, atol=3e-3)


def test_detect_multiframe_shapes(params18):
    imgs = jnp.zeros((2, *IMG, 3), jnp.float32)
    det = detect_multiframe(params18, imgs, depth=18, pre_topk=512, max_dets=32)
    assert det.scores.shape == (32,)
    assert det.boxes.shape == (32, 20)
    assert det.cam_idx.shape == (32,)


def test_detect_singleframe_shapes(params18):
    img = jnp.zeros((*IMG, 3), jnp.float32)
    det = detect_singleframe(params18, img, depth=18, pre_topk=512, max_dets=16)
    assert det.scores.shape == (16,)
    assert int(np.asarray(det.classes).max()) < 8


def test_localize_shapes(params18):
    crops = jnp.zeros((4, 64, 64, 3), jnp.float32)
    boxes, cls = localize(params18, crops, depth=18)
    a = anchors_for_shape((64, 64)).shape[0]
    assert boxes.shape == (4, a, 20)
    assert cls.shape == (4, a, 8)


def _make_annotation(cx, cy, size, cls_id):
    """A square 'box' whose 16 corners form a hull around (cx, cy)."""
    ann = np.zeros(21, np.float32)
    offs = [(-1,-1,.5),(-1,1,.5),(1,-1,.5),(1,1,.5),(-1,-1,-.5),(-1,1,-.5),(1,-1,-.5),(1,1,-.5)]
    for k, (sx, sy, sz) in enumerate(offs):
        ann[2*k] = cx + sx * size / 2
        ann[2*k+1] = cy + sy * size / 2 + sz * size / 4
    ann[16:20] = [cx - size/2, cy - size/2, cx + size/2, cy + size/2]
    ann[20] = cls_id
    return ann


def test_loss_decreases_for_matching_prediction(rng):
    """Loss with regression predicting the target exactly must be lower than
    a random prediction; empty annotations give zero reg/vp loss."""
    anchors = jnp.asarray(anchors_for_shape(IMG))
    a = anchors.shape[0]
    ann = np.full((1, 4, 21), -1, np.float32)
    ann[0, 0] = _make_annotation(96, 64, 40, 2)
    ann = jnp.asarray(ann)

    cls_rand = jnp.full((1, a, 8), 0.01, jnp.float32)
    reg_rand = jnp.asarray(rng.normal(0, 0.5, (1, a, 12)).astype(np.float32))
    l_cls_r, l_reg_r, l_vp_r = detection_loss(cls_rand, reg_rand, ann, anchors)
    assert np.isfinite(l_cls_r) and np.isfinite(l_reg_r) and np.isfinite(l_vp_r)
    assert l_reg_r > 0 and l_vp_r > 0

    # empty annotations
    ann_empty = jnp.full((1, 4, 21), -1.0, jnp.float32)
    l_cls_e, l_reg_e, l_vp_e = detection_loss(cls_rand, reg_rand, ann_empty, anchors)
    assert float(l_reg_e) == 0.0 and float(l_vp_e) == 0.0
    assert float(l_cls_e) > 0  # background focal still applies


def test_loss_perfect_regression_near_zero(rng):
    """If the regression output encodes the GT corners exactly, reg loss ~ 0."""
    from playground3d_tpu.models.decode import _SIGNS

    anchors_np = anchors_for_shape(IMG)
    anchors = jnp.asarray(anchors_np)
    a = anchors.shape[0]
    ann_np = np.full((1, 4, 21), -1, np.float32)
    target = _make_annotation(96, 64, 40, 2)
    ann_np[0, 0] = target
    ann = jnp.asarray(ann_np)

    # build reg such that composed corners == normalized targets:
    # compute c,l,w,h vectors from the normalized corner coords by solving the
    # sign system (it is orthogonal: c = mean, l = mean(S0*corner)/1, etc.)
    aw = anchors_np[:, 2] - anchors_np[:, 0]
    ah = anchors_np[:, 3] - anchors_np[:, 1]
    acx = anchors_np[:, 0] + aw / 2
    acy = anchors_np[:, 1] + ah / 2
    t16 = target[:16]
    tx = (t16[0::2][None, :] - acx[:, None]) / aw[:, None]  # [A,8]
    ty = (t16[1::2][None, :] - acy[:, None]) / ah[:, None]
    S = np.asarray(_SIGNS)
    reg = np.zeros((1, a, 12), np.float32)
    reg[0, :, 0] = tx.mean(1)
    reg[0, :, 1] = ty.mean(1)
    for vec_i, col in [(0, 2), (1, 4), (2, 6)]:
        reg[0, :, col] = (tx * S[None, :, vec_i]).mean(1)
        reg[0, :, col + 1] = (ty * S[None, :, vec_i]).mean(1)
    t2dx = (target[16:20][[0, 2]][None, :] - acx[:, None]) / aw[:, None]
    t2dy = (target[16:20][[1, 3]][None, :] - acy[:, None]) / ah[:, None]
    reg[0, :, 8] = t2dx[:, 0]; reg[0, :, 10] = t2dx[:, 1]
    reg[0, :, 9] = t2dy[:, 0]; reg[0, :, 11] = t2dy[:, 1]

    cls = jnp.full((1, a, 8), 0.01, jnp.float32)
    _, l_reg, l_vp = detection_loss(cls, jnp.asarray(reg), ann, anchors)
    assert float(l_reg) < 1e-5, float(l_reg)
    assert float(l_vp) < 1e-3, float(l_vp)


def test_s2d_stem_shapes():
    """s2d stem: same anchor count and output shapes from raw or host-packed
    input."""
    from playground3d_tpu.data.video import pack_s2d

    params = retinanet_init(jax.random.PRNGKey(1), num_classes=8, depth=18, stem="s2d")
    raw = np.zeros((*IMG, 3), np.float32)
    packed = pack_s2d(raw)
    assert packed.shape == (IMG[0] // 4, IMG[1] // 4, 48)

    a = anchors_for_shape(IMG).shape[0]
    cls1, reg1 = forward_raw(params, jnp.asarray(raw[None]), depth=18, stem="s2d")
    cls2, reg2 = forward_raw(params, jnp.asarray(packed[None]), depth=18, stem="s2d")
    assert cls1.shape == (1, a, 8) and cls2.shape == (1, a, 8)
    # device-side packing and host packing agree
    np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls2), atol=1e-5)

    det = detect_multiframe(
        params, jnp.asarray(packed[None]), depth=18, pre_topk=256, max_dets=16, stem="s2d"
    )
    assert det.boxes.shape == (16, 20)


def test_uint8_input_normalized_on_device():
    from playground3d_tpu.models.retinanet import normalize_on_device
    from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (1, 16, 24, 3), dtype=np.uint8)
    got = np.asarray(normalize_on_device(jnp.asarray(u8)))
    want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, atol=1e-6)
    # s2d-packed channel tiling
    u48 = rng.integers(0, 255, (1, 4, 6, 48), dtype=np.uint8)
    got48 = np.asarray(normalize_on_device(jnp.asarray(u48)))
    want48 = (u48.astype(np.float32) / 255.0 - np.tile(IMAGENET_MEAN, 16)) / np.tile(IMAGENET_STD, 16)
    np.testing.assert_allclose(got48, want48, atol=1e-6)
    # f32 passes through unchanged
    f = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(normalize_on_device(jnp.asarray(f))), f)


def test_forward_uint8_matches_f32(params18):
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 255, (1, *IMG, 3), dtype=np.uint8)
    from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

    f32 = ((u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD)
    c1, r1 = forward_raw(params18, jnp.asarray(u8), depth=18)
    c2, r2 = forward_raw(params18, jnp.asarray(f32), depth=18)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-3)


def test_detect_multiframe_min_level():
    """min_level=4 drops the stride-8 anchors (the scale-band speed knob)
    but keeps the output contract; levels subset matches anchor math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.anchors import anchors_for_shape
    from playground3d_tpu.models.retinanet import detect_multiframe

    a_all = anchors_for_shape((64, 96))
    a_sub = anchors_for_shape((64, 96), (4, 5, 6, 7))
    n_p3 = ((64 + 7) // 8) * ((96 + 7) // 8) * 9
    assert a_all.shape[0] - a_sub.shape[0] == n_p3
    # the subset IS the tail of the full set (levels are concatenated in order)
    np.testing.assert_array_equal(a_all[n_p3:], a_sub)

    params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (1, 16, 24, 48), dtype=np.uint8))
    det = detect_multiframe(
        params, frames, depth=18, pre_topk=64, max_dets=16, stem="s2d", min_level=4
    )
    assert det.scores.shape == (16,)
    assert bool(jnp.all(jnp.isfinite(det.scores)))


def test_score_path_matches_full_class_tensor():
    """score_path=True (per-level max/argmax over classes at the conv's
    natural layout — the round-3 profile fix) must equal reducing the full
    [N,A,K] class tensor of the compact path, bit-for-bit: max/argmax
    commute with reshape+concat."""
    params = retinanet_init(jax.random.PRNGKey(3), num_classes=8, depth=18, stem="s2d")
    from playground3d_tpu.models.retinanet import forward_raw

    rng = np.random.default_rng(11)
    frames = jnp.asarray(rng.integers(0, 255, (2, 16, 24, 48), dtype=np.uint8))
    cls, reg = forward_raw(params, frames, depth=18, stem="s2d", compact=True)
    mx, arg, reg2 = forward_raw(
        params, frames, depth=18, stem="s2d", compact=True, score_path=True
    )
    np.testing.assert_array_equal(np.asarray(cls).max(-1), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(cls).argmax(-1), np.asarray(arg))
    np.testing.assert_array_equal(np.asarray(reg), np.asarray(reg2))
