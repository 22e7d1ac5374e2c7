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
