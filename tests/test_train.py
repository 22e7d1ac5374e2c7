"""Training stack tests: loss decreases on synthetic data, DP sharding over
the virtual 8-device CPU mesh, KF-parameter fitting recovers noise stats."""

import numpy as np
import jax
import pytest

from playground3d_tpu.data.dataset import Prefetcher, SyntheticDetectionDataset, hflip
from playground3d_tpu.parallel.mesh import make_mesh
from playground3d_tpu.train.trainer import TrainConfig, Trainer
from playground3d_tpu.train import fit_kf


def test_dataset_sample_shapes():
    ds = SyntheticDetectionDataset(image_shape=(128, 192), n_objects=4, seed=0)
    frame, labels = ds.sample()
    assert frame.shape == (128, 192, 3)
    assert labels.shape == (32, 21)
    valid = labels[labels[:, 20] >= 0]
    assert len(valid) >= 1
    # corners within a sane frame-ish range
    assert np.isfinite(valid[:, :16]).all()


def test_crop_mode_dataset():
    ds = SyntheticDetectionDataset(
        image_shape=(128, 192), n_objects=4, seed=1, crop_mode=True, crop_size=64
    )
    frame, labels = ds.sample()
    assert frame.shape == (64, 64, 3)


def test_hflip_label_consistency():
    ds = SyntheticDetectionDataset(image_shape=(128, 192), n_objects=3, seed=2, augment=False)
    frame, labels = ds.sample()
    valid = labels[:, 20] >= 0
    f2, l2 = hflip(frame, labels)
    f3, l3 = hflip(f2, l2)
    np.testing.assert_allclose(f3, frame)
    np.testing.assert_allclose(l3[valid], labels[valid], atol=1e-4)


def test_train_step_runs_and_loss_decreases():
    cfg = TrainConfig(depth=18, image_shape=(128, 192), lr=2e-4)
    trainer = Trainer(cfg, key=jax.random.PRNGKey(0))
    ds = SyntheticDetectionDataset(image_shape=(128, 192), n_objects=4, seed=0, augment=False, zoom=6.0)
    batches = ds.batches(2)
    losses = []
    for i, (frames, labels) in zip(range(8), batches):
        m = trainer.train_step(frames, labels)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # background focal loss should drop fast from prior init
    assert losses[-1] < losses[0] * 1.5, losses


def test_train_step_uint8_wire_matches_f32():
    """uint8-over-the-wire training (demo_e2e_mc ships quantized frames;
    forward_raw normalizes on device) must match the f32 path bit-for-bit
    when fed the same quantized pixels — the 4x transfer saving is free."""
    from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

    cfg = TrainConfig(depth=18, image_shape=(128, 192), lr=2e-4)
    ds = SyntheticDetectionDataset(
        image_shape=(128, 192), n_objects=4, seed=0, augment=False, zoom=6.0,
        output_dtype="uint8",
    )
    frames_u8, labels = next(ds.batches(2))
    assert frames_u8.dtype == np.uint8
    frames_f32 = (frames_u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    tr_u8 = Trainer(cfg, key=jax.random.PRNGKey(0))
    tr_f32 = Trainer(cfg, key=jax.random.PRNGKey(0))
    m_u8 = tr_u8.train_step(frames_u8, labels)
    m_f32 = tr_f32.train_step(frames_f32, labels)
    np.testing.assert_allclose(
        float(m_u8["loss"]), float(m_f32["loss"]), rtol=1e-5
    )
    # a second uint8 step keeps training (params moved, loss finite)
    m2 = tr_u8.train_step(frames_u8, labels)
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) != float(m_u8["loss"])


def test_train_step_dp_mesh():
    """Same step over the 8-device CPU mesh: batch sharded, params replicated."""
    mesh = make_mesh(8)
    cfg = TrainConfig(depth=18, image_shape=(64, 128), lr=1e-4)
    trainer = Trainer(cfg, key=jax.random.PRNGKey(0), mesh=mesh)
    ds = SyntheticDetectionDataset(image_shape=(64, 128), n_objects=3, seed=0, augment=False, zoom=6.0)
    frames, labels = next(ds.batches(8))
    m = trainer.train_step(frames, labels)
    assert np.isfinite(float(m["loss"]))
    m2 = trainer.train_step(frames, labels)
    assert float(m2["loss"]) != float(m["loss"])  # parameters moved


def test_prefetcher():
    def gen():
        for i in range(5):
            yield np.full((2, 2), i)

    out = list(Prefetcher(gen(), depth=2, device_put=False))
    assert len(out) == 5
    np.testing.assert_allclose(out[3], 3)


def test_fit_kf_recovers_noise(rng):
    # synthesize tracklets with known process noise
    true_q = np.array([0.05, 0.05, 0.01, 0.01, 0.01, 0.5])
    tracklets = []
    for k in range(50):
        T = 40
        x = np.zeros((T, 7))
        x[0] = [rng.uniform(400, 600), rng.uniform(10, 110), 16, 6, 4, 1.0, 30.0]
        for t in range(1, T):
            x[t] = x[t - 1]
            x[t, 0] += x[t - 1, 5] * x[t - 1, 6] * (1 / 30.0)
            noise = rng.normal(0, np.sqrt(true_q))
            x[t, [0, 1, 2, 3, 4, 6]] += noise
        tracklets.append(x)
    got = fit_kf.fit_process_noise(tracklets)
    np.testing.assert_allclose(np.diag(got["Q"]), true_q, rtol=0.25)

    dets = rng.normal(0, 1.0, (500, 5)) + 10
    gts = np.full((500, 5), 10.0)
    meas = fit_kf.fit_measurement_noise(dets, gts)
    np.testing.assert_allclose(np.diag(meas["R"]), 1.0, rtol=0.3)

    # full pipeline -> KFParams
    out = fit_kf.fit_all(
        tracklets, dets, gts,
        class_ids=rng.integers(0, 8, 200), sizes=rng.uniform(4, 20, (200, 3)),
    )
    from playground3d_tpu.track.kf import params_from_arrays

    params = params_from_arrays(out)
    assert params.Q.shape == (6, 6)
    assert float(params.mu_v) > 0

    # npz roundtrip
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "kf.npz")
        fit_kf.save_kf_params(p, out)
        back = fit_kf.load_kf_params(p)
        np.testing.assert_allclose(back["Q"], out["Q"])


def test_rotate_labels_consistent():
    from playground3d_tpu.data.dataset import SyntheticDetectionDataset, rotate

    ds = SyntheticDetectionDataset(image_shape=(128, 192), n_objects=3, seed=4, augment=False)
    frame, labels = ds.sample()
    valid = labels[:, 20] >= 0
    f2, l2 = rotate(frame, labels, 10.0)
    assert f2.shape == frame.shape
    # rotating back restores corner coordinates
    f3, l3 = rotate(f2, l2, -10.0)
    np.testing.assert_allclose(l3[valid, :16], labels[valid, :16], atol=1e-3)


def test_tile_shuffle_remaps():
    from playground3d_tpu.data.dataset import tile_shuffle

    rng = np.random.default_rng(0)
    frame = np.zeros((64, 96, 3), np.float32)
    labels = np.full((2, 21), -1, np.float32)
    # a small box fully inside tile (0,0)
    labels[0, :16] = np.tile([10, 10], 8) + np.arange(16) % 2
    labels[0, 16:20] = [8, 8, 14, 14]
    labels[0, 20] = 1
    frame[8:14, 8:14] = 1.0
    out, new = tile_shuffle(frame, labels, rng)
    assert len(new) == 1
    x1, y1 = new[0, 16], new[0, 17]
    # the bright patch moved with the label
    patch = out[int(y1) : int(y1) + 6, int(x1) : int(x1) + 6]
    assert patch.mean() > 0.9


def test_scale_aspect_labels_follow():
    from playground3d_tpu.data.dataset import SyntheticDetectionDataset, scale_aspect

    ds = SyntheticDetectionDataset(image_shape=(128, 192), n_objects=3, seed=6, augment=False)
    frame, labels = ds.sample()
    labels = labels[labels[:, 20] >= 0]
    rng = np.random.default_rng(1)
    f2, l2 = scale_aspect(frame, labels, rng)
    assert f2.shape == frame.shape
    assert len(l2) <= len(labels)
    # surviving labels are the originals scaled by a recoverable (sx, sy)
    if len(l2) and len(labels):
        sx = l2[0, 0] / labels[0, 0] if abs(labels[0, 0]) > 1e-6 else 1.0
        np.testing.assert_allclose(l2[0, 0:20:2], labels[0, 0:20:2] * sx, rtol=1e-4)
        sy = l2[0, 1] / labels[0, 1] if abs(labels[0, 1]) > 1e-6 else 1.0
        np.testing.assert_allclose(l2[0, 1:20:2], labels[0, 1:20:2] * sy, rtol=1e-4)
        assert sx >= 1.0 - 1e-6  # scale is clipped at 1 (ref :332)


def test_sample_runs_geometric_augs():
    """sample() with augment=True exercises scale/aspect + rotate + tile
    (component #15 closure): forced probabilities, shapes stay fixed."""
    from playground3d_tpu.data.dataset import SyntheticDetectionDataset

    ds = SyntheticDetectionDataset(
        image_shape=(128, 192), n_objects=4, seed=7, augment=True,
        p_scale_aspect=1.0, p_rotate=1.0, p_tile=1.0,
    )
    for _ in range(4):
        frame, labels = ds.sample()
        assert frame.shape == (128, 192, 3)
        assert labels.shape[1] == 21
        v = labels[labels[:, 20] >= 0]
        if len(v):
            # 2D boxes stay ordered after every remap
            assert (v[:, 18] >= v[:, 16]).all() and (v[:, 19] >= v[:, 17]).all()


def test_orbax_checkpoint_roundtrip(tmp_path):
    from playground3d_tpu.train.trainer import TrainConfig, Trainer
    from playground3d_tpu.utils.checkpoint import load_train_state, save_train_state

    cfg = TrainConfig(depth=18, image_shape=(64, 128))
    tr = Trainer(cfg, key=jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_train_state(path, tr.state)
    restored = load_train_state(path, tr.state)
    w0 = jax.tree_util.tree_leaves(tr.state.params)[0]
    w1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1))


def test_multiworker_prefetcher():
    from playground3d_tpu.data.dataset import Prefetcher, SyntheticDetectionDataset

    ds = SyntheticDetectionDataset(image_shape=(64, 96), n_objects=2, seed=0, augment=False)
    pf = Prefetcher(factory=ds.batch_factory(2), workers=3, depth=4, device_put=False)
    got = [next(pf) for _ in range(6)]
    pf.close()
    assert all(f.shape == (2, 64, 96, 3) for f, l in got)
    # different workers produce different batches
    assert not np.allclose(got[0][0], got[1][0])


def test_save_params_atomic(tmp_path, monkeypatch):
    """save_params must leave no temp droppings and survive interruption:
    an existing checkpoint is either fully replaced or left intact (the
    --resume recovery path depends on never seeing a torn npz)."""
    import os

    from playground3d_tpu.models.nn import (
        load_params,
        save_params,
        save_step_sidecar,
    )

    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": [np.ones((4,), np.float32), np.zeros((2, 2), np.float32)]}
    path = str(tmp_path / "ckpt.npz")
    save_params(path, params)
    back = load_params(path, params)
    np.testing.assert_array_equal(back["a"], params["a"])
    np.testing.assert_array_equal(back["b"][1], params["b"][1])
    # no temp files left behind
    assert os.listdir(tmp_path) == ["ckpt.npz"]

    # a save that dies mid-write must not clobber the existing checkpoint
    import playground3d_tpu.models.nn as nnmod

    def torn_savez(fh, **kw):
        fh.write(b"partial garbage")
        raise RuntimeError("tunnel hang mid-save")

    monkeypatch.setattr(nnmod.np, "savez", torn_savez)
    with pytest.raises(RuntimeError):
        save_params(path, params)
    monkeypatch.undo()
    back2 = load_params(path, params)
    np.testing.assert_array_equal(back2["a"], params["a"])
    assert os.listdir(tmp_path) == ["ckpt.npz"]

    save_step_sidecar(path + ".step", 1500)
    with open(path + ".step") as fh:
        assert fh.read() == "1500"
    assert sorted(os.listdir(tmp_path)) == ["ckpt.npz", "ckpt.npz.step"]
