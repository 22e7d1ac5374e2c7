"""Ops correctness: NMS vs reference greedy semantics, crop_and_resize vs
naive bilinear, auction assignment vs scipy Hungarian optimum."""

import numpy as np
import jax.numpy as jnp
import pytest

from playground3d_tpu.ops import (
    assign_auction,
    assign_hungarian,
    crop_and_resize,
    elementwise_iou,
    nms,
    batched_nms,
    pairwise_iou,
)


def ref_nms(boxes, scores, thr):
    """Torchvision-semantics greedy NMS in numpy."""
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        iw = np.clip(xx2 - xx1, 0, None)
        ih = np.clip(yy2 - yy1, 0, None)
        inter = iw * ih
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        iou = inter / np.clip(ai + a - inter, 1e-8, None)
        alive &= iou <= thr
    return keep


def random_boxes(rng, n, size=100.0):
    ctr = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(2, 20, (n, 2))
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)


def test_pairwise_iou(rng):
    a = random_boxes(rng, 7)
    b = random_boxes(rng, 5)
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(7):
        for j in range(5):
            xx1 = max(a[i, 0], b[j, 0]); yy1 = max(a[i, 1], b[j, 1])
            xx2 = min(a[i, 2], b[j, 2]); yy2 = min(a[i, 3], b[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            area = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1]) + (b[j, 2] - b[j, 0]) * (
                b[j, 3] - b[j, 1]
            ) - inter
            np.testing.assert_allclose(got[i, j], inter / max(area, 1e-8), rtol=1e-5)


def test_elementwise_iou_identity(rng):
    a = random_boxes(rng, 6)
    got = np.asarray(elementwise_iou(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, 1.0, rtol=1e-6)


@pytest.mark.parametrize("thr", [0.3, 0.5, 0.8])
def test_nms_matches_reference(rng, thr):
    n = 64
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    want = ref_nms(boxes, scores, thr)
    idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), thr, max_keep=n)
    got = list(np.asarray(idx)[np.asarray(mask)])
    assert got == want


def test_nms_mask_and_cap(rng):
    n = 32
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:10] = True
    idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, max_keep=4)
    got = np.asarray(idx)[np.asarray(mask)]
    assert len(got) <= 4
    assert all(g < 10 for g in got)
    want = ref_nms(boxes[:10], scores[:10], 0.5)[:4]
    assert list(got) == want


def test_batched_nms_groups(rng):
    # identical boxes in different groups must both survive
    box = np.array([[10, 10, 20, 20]], np.float32)
    boxes = np.concatenate([box, box], 0)
    scores = np.array([0.9, 0.8], np.float32)
    groups = np.array([0, 1])
    idx, mask = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(groups), jnp.ones(2, bool), 0.5, max_keep=2
    )
    assert int(np.asarray(mask).sum()) == 2


def test_crop_and_resize_constant_patch(rng):
    # a constant-color region crops to that constant
    frames = np.zeros((2, 64, 64, 3), np.float32)
    frames[1, 16:48, 16:48, :] = 5.0
    boxes = np.array([[20, 20, 40, 40]], np.float32)
    out = np.asarray(
        crop_and_resize(jnp.asarray(frames), jnp.asarray(boxes), jnp.asarray([1]), out_size=8)
    )
    np.testing.assert_allclose(out, 5.0, atol=1e-5)


def test_crop_and_resize_linear_ramp():
    # bilinear sampling of a linear ramp is exact
    H = W = 32
    ramp = np.arange(W, dtype=np.float32)[None, :].repeat(H, 0)
    frames = ramp[None, :, :, None]
    boxes = np.array([[4.0, 4.0, 12.0, 12.0]], np.float32)
    out = np.asarray(
        crop_and_resize(jnp.asarray(frames), jnp.asarray(boxes), jnp.asarray([0]), out_size=4)
    )[0, :, :, 0]
    bin_w = 8.0 / 4
    expect_cols = 4.0 + (np.arange(4) + 0.5) * bin_w - 0.5
    np.testing.assert_allclose(out[0], expect_cols, rtol=1e-5)


@pytest.mark.parametrize("n,m", [(5, 5), (8, 3), (3, 8), (16, 16)])
def test_auction_matches_hungarian_total(rng, n, m):
    for trial in range(5):
        benefit = rng.uniform(0, 1, (n, m)).astype(np.float32)
        got = np.asarray(
            assign_auction(jnp.asarray(benefit), jnp.ones(n, bool), jnp.ones(m, bool))
        )
        want = assign_hungarian(benefit, maximize=True)
        tot_got = sum(benefit[i, got[i]] for i in range(n) if got[i] >= 0)
        tot_want = sum(benefit[i, want[i]] for i in range(n) if want[i] >= 0)
        # auction with eps-scaling reaches the optimum within n*eps_final
        assert tot_got >= tot_want - 1e-3, (trial, tot_got, tot_want)
        # one-to-one
        used = [g for g in got if g >= 0]
        assert len(used) == len(set(used))
        assert len(used) == min(n, m)


def test_auction_masked(rng):
    benefit = rng.uniform(0, 1, (6, 6)).astype(np.float32)
    rmask = np.array([1, 1, 1, 0, 0, 0], bool)
    cmask = np.array([1, 1, 1, 1, 0, 0], bool)
    got = np.asarray(assign_auction(jnp.asarray(benefit), jnp.asarray(rmask), jnp.asarray(cmask)))
    assert (got[3:] == -1).all()
    assert all(0 <= g < 4 for g in got[:3])
    want = assign_hungarian(benefit[:3, :4], maximize=True)
    tot_got = sum(benefit[i, got[i]] for i in range(3))
    tot_want = sum(benefit[i, want[i]] for i in range(3))
    assert tot_got >= tot_want - 1e-3


def test_auction_empty():
    got = np.asarray(
        assign_auction(jnp.zeros((4, 4), jnp.float32), jnp.zeros(4, bool), jnp.zeros(4, bool))
    )
    assert (got == -1).all()


def test_nms_adversarial_long_chain():
    # a >16-link suppression chain: box i overlaps only box i+1 with
    # IoU > thr and scores strictly decrease, so greedy keeps the even
    # indices — the fixed-point prefix grows ~1 box per round, which the
    # old 16-round cap silently got wrong
    n = 48
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 6.0, 0.0, i * 6.0 + 10.0, 10.0]  # IoU(adj) = 4/16
    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    thr = 0.2
    want = ref_nms(boxes, scores, thr)
    assert want == list(range(0, n, 2))  # sanity: it IS a revival chain
    idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), thr, max_keep=n)
    got = list(np.asarray(idx)[np.asarray(mask)])
    assert got == want


def test_batched_nms_negative_coords():
    # roadway-space boxes can have negative y; group separation must use the
    # coordinate span, not max+1, or groups can collide and cross-suppress
    box = np.array([[-8.0, -9.5, -2.0, -3.5]], np.float32)
    boxes = np.concatenate([box, box], 0)
    scores = np.array([0.9, 0.8], np.float32)
    groups = np.array([0, 1])
    idx, mask = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(groups),
        jnp.ones(2, bool), 0.5, max_keep=2,
    )
    assert int(np.asarray(mask).sum()) == 2
    # and same-group duplicates still suppress
    idx, mask = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(2, np.int32),
        jnp.ones(2, bool), 0.5, max_keep=2,
    )
    assert int(np.asarray(mask).sum()) == 1


class TestCropMXU:
    """crop_and_resize_s2d: MXU separable-matmul crops from s2d frames."""

    def _frames(self, rng, C=2, H=128, W=192):
        from playground3d_tpu.data.video import pack_s2d

        fr = rng.uniform(0, 1, (C, H, W, 3)).astype(np.float32)
        s2d = np.stack([pack_s2d(f) for f in fr])
        return fr, s2d

    def test_matches_xla_crop_level0(self, rng):
        from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d

        fr, s2d = self._frames(rng)
        boxes = np.array(
            [[10.5, 20.25, 90.5, 100.25], [40.0, 8.0, 120.0, 88.0], [0.0, 0.0, 32.0, 32.0]],
            np.float32,
        )
        cams = np.array([0, 1, 1], np.int32)
        want = np.asarray(
            crop_and_resize(jnp.asarray(fr), jnp.asarray(boxes), jnp.asarray(cams), out_size=32)
        )
        got = np.asarray(
            crop_and_resize_s2d(
                jnp.asarray(s2d), jnp.asarray(boxes), jnp.asarray(cams),
                out_size=32, win_cells=32, layout="hwc", dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_bf16_close(self, rng):
        from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d

        fr, s2d = self._frames(rng)
        boxes = np.array([[10.0, 20.0, 90.0, 100.0]], np.float32)
        cams = np.array([0], np.int32)
        want = np.asarray(
            crop_and_resize(jnp.asarray(fr), jnp.asarray(boxes), jnp.asarray(cams), out_size=32)
        )
        got = np.asarray(
            crop_and_resize_s2d(
                jnp.asarray(s2d), jnp.asarray(boxes), jnp.asarray(cams),
                out_size=32, win_cells=32, layout="hwc",
            )
        )
        assert np.abs(got - want).max() < 0.02

    def test_large_crop_uses_pyramid(self, rng):
        # a crop bigger than the window samples the half-res level: compare
        # against XLA crops of a numpy half-res image
        from playground3d_tpu.data.video import pack_s2d
        from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d

        fr, s2d = self._frames(rng, C=1, H=256, W=256)
        boxes = np.array([[8.0, 8.0, 232.0, 232.0]], np.float32)  # span 224 > 120
        cams = np.array([0], np.int32)
        got = np.asarray(
            crop_and_resize_s2d(
                jnp.asarray(s2d), jnp.asarray(boxes), jnp.asarray(cams),
                out_size=32, win_cells=32, n_levels=2, layout="hwc", dtype=jnp.float32,
            )
        )
        half = fr[0].reshape(128, 2, 128, 2, 3).mean((1, 3))[None]
        want = np.asarray(
            crop_and_resize(
                jnp.asarray(half), jnp.asarray(boxes / 2.0), jnp.asarray(cams), out_size=32
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_s2d_layout_roundtrip(self, rng):
        from playground3d_tpu.models.resnet import space_to_depth
        from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d

        fr, s2d = self._frames(rng)
        boxes = np.array([[16.0, 16.0, 80.0, 80.0]], np.float32)
        cams = np.array([0], np.int32)
        hwc = crop_and_resize_s2d(
            jnp.asarray(s2d), jnp.asarray(boxes), jnp.asarray(cams),
            out_size=32, win_cells=32, layout="hwc", dtype=jnp.float32,
        )
        packed = crop_and_resize_s2d(
            jnp.asarray(s2d), jnp.asarray(boxes), jnp.asarray(cams),
            out_size=32, win_cells=32, layout="s2d", dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(space_to_depth(hwc, 4)), np.asarray(packed), atol=1e-5
        )

    def test_uint8_normalize(self, rng):
        from playground3d_tpu.data.video import pack_s2d
        from playground3d_tpu.ops.crop_mxu import crop_and_resize_s2d
        from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

        fr_u8 = rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
        s2d = np.stack([pack_s2d(f) for f in fr_u8])
        boxes = np.array([[8.0, 8.0, 72.0, 72.0]], np.float32)
        cams = np.array([0], np.int32)
        got = np.asarray(
            crop_and_resize_s2d(
                jnp.asarray(s2d), jnp.asarray(boxes), jnp.asarray(cams),
                out_size=32, win_cells=32, layout="hwc", dtype=jnp.float32, normalize=True,
            )
        )
        norm = ((fr_u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
        want = np.asarray(
            crop_and_resize(jnp.asarray(norm), jnp.asarray(boxes), jnp.asarray(cams), out_size=32)
        )
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_s2d_halve_is_pixel_avgpool(self, rng):
        from playground3d_tpu.data.video import pack_s2d
        from playground3d_tpu.ops.crop_mxu import s2d_halve

        fr = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
        s2d = np.stack([pack_s2d(f) for f in fr])
        got = np.asarray(s2d_halve(jnp.asarray(s2d), dtype=jnp.float32))
        half = fr[0].reshape(32, 2, 48, 2, 3).mean((1, 3))
        want = pack_s2d(half)[None]
        np.testing.assert_allclose(got, want, atol=1e-5)
