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
