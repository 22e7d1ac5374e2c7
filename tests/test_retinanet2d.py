"""Legacy 2D RetinaNet variant tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from playground3d_tpu.models.anchors import anchors_for_shape
from playground3d_tpu.models.retinanet2d import (
    decode_boxes_2d,
    detect_2d,
    focal_loss_2d,
    forward_raw_2d,
    retinanet2d_init,
)

IMG = (128, 192)


@pytest.fixture(scope="module")
def params():
    return retinanet2d_init(jax.random.PRNGKey(0), num_classes=4, depth=18)


def test_decode_identity():
    anchors = jnp.asarray([[10.0, 10, 30, 50]])
    out = np.asarray(decode_boxes_2d(jnp.zeros((1, 4)), anchors))
    np.testing.assert_allclose(out[0], [10, 10, 30, 50], atol=1e-5)


def test_forward_and_detect(params):
    img = jnp.zeros((*IMG, 3), jnp.float32)
    cls, reg = forward_raw_2d(params, img[None], depth=18, num_classes=4)
    a = anchors_for_shape(IMG).shape[0]
    assert cls.shape == (1, a, 4) and reg.shape == (1, a, 4)
    scores, classes, boxes, mask = detect_2d(
        params, img, depth=18, num_classes=4, pre_topk=256, max_dets=16
    )
    assert scores.shape == (16,) and boxes.shape == (16, 4)


def test_focal_loss_2d(params):
    anchors = jnp.asarray(anchors_for_shape(IMG))
    a = anchors.shape[0]
    ann = np.full((1, 4, 5), -1, np.float32)
    ann[0, 0] = [80, 50, 120, 80, 2]
    cls = jnp.full((1, a, 4), 0.01, jnp.float32)
    reg = jnp.zeros((1, a, 4), jnp.float32)
    l_cls, l_reg = focal_loss_2d(cls, reg, jnp.asarray(ann), anchors)
    assert np.isfinite(float(l_cls)) and np.isfinite(float(l_reg))
    assert float(l_reg) > 0
    # empty annotations -> zero reg loss
    ann0 = jnp.full((1, 4, 5), -1.0, jnp.float32)
    _, l_reg0 = focal_loss_2d(cls, reg, ann0, anchors)
    assert float(l_reg0) == 0.0


def test_csv_dataset(tmp_path):
    from playground3d_tpu.data.csv_dataset import CSVDetectionDataset
    from playground3d_tpu.data.video import write_png

    for i in range(3):
        img = np.random.default_rng(i).integers(0, 255, (96, 128, 3), dtype=np.uint8)
        write_png(str(tmp_path / f"im{i}.png"), img)
    ann_path = str(tmp_path / "ann.csv")
    with open(ann_path, "w") as f:
        f.write(f"im0.png,10,10,50,40,car\n")
        f.write(f"im0.png,60,20,90,60,truck\n")
        f.write(f"im1.png,5,5,30,30,car\n")
        f.write(f"im2.png,,,,,\n")  # negative image
    cls_path = str(tmp_path / "classes.csv")
    with open(cls_path, "w") as f:
        f.write("car,0\ntruck,1\n")

    ds = CSVDetectionDataset(ann_path, cls_path, root=str(tmp_path), min_side=64, max_side=128, augment=False)
    assert len(ds) == 3
    assert ds.num_classes == 2
    img, ann = ds.sample(0)
    assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0
    valid = ann[ann[:, 4] >= 0]
    assert len(valid) == 2
    # boxes scaled with the image
    assert 0 < valid[0, 0] < img.shape[1]

    frames, anns = next(ds.batches(2))
    assert frames.shape[0] == 2 and anns.shape == (2, 64, 5)
