"""Multi-device sharding tests on the virtual 8-device CPU mesh: camera-axis
sharded detection (the multi-chip inference path) and DP training step
(covered also in test_train)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from playground3d_tpu.models import retinanet_init
from playground3d_tpu.models.retinanet import detect_multiframe, forward_raw
from playground3d_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def params():
    return retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=18)


def test_camera_sharded_forward_matches(params):
    """forward_raw over 8 camera frames sharded one-per-device == unsharded.

    This is the multi-chip multi-camera inference layout (SURVEY.md section
    2c): the camera axis is the mesh axis; per-camera compute runs on its
    shard, and only the (tiny) detection outputs cross chips.
    """
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    frames = rng.normal(0, 1, (8, 64, 128, 3)).astype(np.float32)

    fwd = jax.jit(lambda x: forward_raw(params, x, depth=18))
    ref_cls, ref_reg = fwd(jnp.asarray(frames))

    sharded = jax.device_put(frames, NamedSharding(mesh, P("data")))
    fwd_sh = jax.jit(
        lambda x: forward_raw(params, x, depth=18),
        in_shardings=NamedSharding(mesh, P("data")),
    )
    cls, reg = fwd_sh(sharded)
    # per-device sharding of the output batch axis
    assert len(cls.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(cls), np.asarray(ref_cls), atol=2e-5)
    np.testing.assert_allclose(np.asarray(reg), np.asarray(ref_reg), atol=2e-5)


def test_camera_sharded_detect(params):
    """The fused multiframe detection compiles and runs with the camera axis
    sharded over the mesh; the cross-camera NMS gathers the shards."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    frames = rng.normal(0, 1, (8, 64, 128, 3)).astype(np.float32)

    ref = detect_multiframe(params, jnp.asarray(frames), depth=18, pre_topk=512, max_dets=32)

    sharded = jax.device_put(frames, NamedSharding(mesh, P("data")))
    det = detect_multiframe(params, sharded, depth=18, pre_topk=512, max_dets=32)
    np.testing.assert_allclose(
        np.asarray(det.scores), np.asarray(ref.scores), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(det.cam_idx), np.asarray(ref.cam_idx))


def test_spatial_sharded_forward_matches():
    """GSPMD spatial partitioning: ONE s2d frame with its width sharded
    across the mesh produces the replicated result exactly (XLA inserts the
    conv halo exchanges). This is the single-frame latency lever that the
    reference's nn.DataParallel cannot express.

    Uses :func:`spatial_forward` — the shipped constrained path whose
    per-pyramid-level sharding constraints keep the partitioned HLO free of
    GSPMD "involuntary full rematerialization" reshards (deep levels whose
    extent no longer divides the axis are pinned to explicit replication)."""
    from playground3d_tpu.parallel.mesh import (
        shard_spatial,
        spatial_forward,
        spatial_sharding,
    )

    mesh = make_mesh(8)
    params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
    rng = np.random.default_rng(2)
    # s2d-packed uint8 frame, width 64 divides the mesh; height 34 does not
    x = rng.integers(0, 256, (1, 34, 64, 48), dtype=np.uint8)

    sh = spatial_sharding(mesh, x.shape)
    assert sh.spec == P(None, None, "data")
    xs = shard_spatial(mesh, x)
    assert len(xs.sharding.device_set) == 8

    ref = jax.jit(lambda p, im: forward_raw(p, im, depth=18, stem="s2d"))(
        params, jnp.asarray(x)
    )
    ref = jax.tree_util.tree_leaves(ref)
    fwd = spatial_forward(mesh, 18, stem="s2d")
    out = jax.tree_util.tree_leaves(fwd(params, xs))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-5, atol=2e-5
        )

    # indivisible spatial dims fall back to replication, never crash
    assert spatial_sharding(mesh, (1, 33, 67, 48)).spec == P()


def test_spatial_sharding_multi_axis_mesh():
    """Divisibility is tested against the NAMED axis size, not the whole
    mesh: on a 2x4 ('data','model') mesh, a width divisible by 2 but not 8
    must still shard over 'data' (and sharding over 'model'=4 works too)."""
    from jax.sharding import Mesh

    from playground3d_tpu.parallel.mesh import spatial_sharding

    devs = np.asarray(jax.devices("cpu")[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    # width 6: divisible by mesh.shape['data']=2, not by devices.size=8
    assert spatial_sharding(mesh, (1, 34, 6, 48), axis="data").spec == P(
        None, None, "data"
    )
    # width 12 over the 4-wide 'model' axis
    assert spatial_sharding(mesh, (1, 34, 12, 48), axis="model").spec == P(
        None, None, "model"
    )
    # height fallback: width indivisible by 2, height divisible
    assert spatial_sharding(mesh, (1, 34, 7, 48), axis="data").spec == P(None, "data")
    # nothing divides -> replicate
    assert spatial_sharding(mesh, (1, 33, 7, 48), axis="data").spec == P()


def test_camera_spatial_2axis_mesh_forward_matches():
    """Combined camera x spatial mesh (make_mesh2: 4 cameras x 2 width
    shards on 8 virtual devices): the camera batch splits on 'data' while
    each frame's width splits on 'space', and the result matches the
    replicated forward — the 18-camera deployment shape (throughput AND
    single-frame latency) that nn.DataParallel cannot express."""
    from playground3d_tpu.parallel.mesh import (
        camera_spatial_forward,
        make_mesh2,
        spatial_sharding,
    )

    mesh = make_mesh2(4, 2)
    assert dict(mesh.shape) == {"data": 4, "space": 2}
    params = retinanet_init(jax.random.PRNGKey(0), depth=18, stem="s2d")
    rng = np.random.default_rng(3)
    # camera dim 4 divides 'data'; width 64 divides 'space'; height doesn't
    x = rng.integers(0, 256, (4, 34, 64, 48), dtype=np.uint8)

    sh = spatial_sharding(mesh, x.shape, axis="space", batch_axis="data")
    assert sh.spec == P("data", None, "space")
    xs = jax.device_put(x, sh)
    assert len(xs.sharding.device_set) == 8

    ref = jax.jit(lambda p, im: forward_raw(p, im, depth=18, stem="s2d"))(
        params, jnp.asarray(x)
    )
    ref = jax.tree_util.tree_leaves(ref)
    fwd = camera_spatial_forward(mesh, 18, stem="s2d")
    out = jax.tree_util.tree_leaves(fwd(params, xs))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-5, atol=2e-5
        )
