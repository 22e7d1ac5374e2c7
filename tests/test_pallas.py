"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by the bench/verify flows)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from playground3d_tpu.ops.pallas.crop_resize import crop_and_resize_pallas
from playground3d_tpu.ops.roi_align import crop_and_resize


def test_pallas_crop_matches_xla(rng):
    frames = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32))
    boxes = np.array(
        [[10.0, 10, 40, 40], [5.0, 20, 60, 55], [0.0, 0, 96, 64], [-5.0, -5, 30, 30]],
        np.float32,
    )
    fi = jnp.asarray([0, 1, 1, 0])
    ref = crop_and_resize(frames, jnp.asarray(boxes), fi, out_size=16)
    got = crop_and_resize_pallas(
        frames, jnp.asarray(boxes), fi, out_size=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_crop_constant_region(rng):
    frames = np.zeros((1, 64, 64, 3), np.float32)
    frames[0, 16:48, 16:48] = 3.0
    got = crop_and_resize_pallas(
        jnp.asarray(frames),
        jnp.asarray(np.array([[20.0, 20, 40, 40]], np.float32)),
        jnp.asarray([0]),
        out_size=8,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), 3.0, atol=1e-5)
