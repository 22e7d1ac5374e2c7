"""Geometry round-trip and equivalence tests.

Mirrors the reference's self-tests: ``test_transformation`` reprojection
error (homography.py:554-604) and the state<->space corner parameterization
check (box_parameterization_test.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from playground3d_tpu.geometry import (
    fit_homography,
    build_projection,
    find_vanishing_point,
    im_to_space,
    im_to_state,
    space_to_im,
    space_to_state,
    state_to_im,
    state_to_space,
    height_from_template,
    space_footprint_xyxy,
    select_eb_wb,
)


def make_states(rng, n=12):
    x = rng.uniform(400, 620, n)
    y = rng.uniform(10, 110, n)
    l = rng.uniform(12, 60, n)
    w = rng.uniform(5, 9, n)
    h = rng.uniform(3, 13, n)
    d = np.where(y > 60, -1.0, 1.0)
    return np.stack([x, y, l, w, h, d], axis=1).astype(np.float32)


def test_state_space_roundtrip(rng):
    states = make_states(rng)
    space = state_to_space(jnp.asarray(states))
    back = space_to_state(space)
    np.testing.assert_allclose(np.asarray(back), states, rtol=1e-5, atol=1e-4)


def test_space_corner_layout(rng):
    states = make_states(rng, 4)
    space = np.asarray(state_to_space(jnp.asarray(states)))
    # bottom corners have z == 0, top corners z == -h
    np.testing.assert_allclose(space[:, 0:4, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(space[:, 4:8, 2], -states[:, 4:5].repeat(4, 1), atol=1e-5)
    # front corners are ahead of back corners along signed direction
    front_x = space[:, 0, 0]
    back_x = space[:, 2, 0]
    np.testing.assert_allclose(
        np.sign(front_x - back_x), states[:, 5], atol=0
    )


def test_homography_fit_exact():
    # exact synthetic homography must be recovered to high precision
    H_true = np.array([[1.2, 0.1, 5.0], [-0.05, 0.9, -3.0], [1e-4, -2e-4, 1.0]])
    rng = np.random.default_rng(1)
    src = rng.uniform(-100, 100, size=(30, 2))
    homo = np.concatenate([src, np.ones((30, 1))], axis=1) @ H_true.T
    dst = homo[:, :2] / homo[:, 2:3]
    H_fit = fit_homography(src, dst)
    np.testing.assert_allclose(H_fit, H_true / H_true[2, 2], rtol=1e-6, atol=1e-8)


def test_im_space_roundtrip_through_fit(toy_camera, rng):
    reg = toy_camera["registry"]
    project = toy_camera["project"]
    c = reg.index(toy_camera["cam"])
    H = jnp.asarray(reg.H[c, 0], dtype=jnp.float32)

    # points on the ground plane: im -> space should invert the projection
    gx = rng.uniform(400, 620, 16)
    gy = rng.uniform(5, 115, 16)
    ground = np.stack([gx, gy, np.zeros(16)], axis=1)
    im_pts = project(ground).reshape(16, 1, 2).astype(np.float32)

    heights = np.zeros(16, dtype=np.float32)
    got = im_to_space(
        jnp.asarray(np.repeat(im_pts, 8, axis=1)), H, jnp.asarray(heights)
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, 0, :2], ground[:, :2], rtol=1e-3, atol=0.2
    )


def test_full_reprojection_error(toy_camera, rng):
    """im -> state -> im reprojection: bottom-corner error must be small
    (the reference's test_transformation criterion)."""
    from playground3d_tpu.geometry import scale_P_z

    reg = toy_camera["registry"]
    project = toy_camera["project"]
    c = reg.index(toy_camera["cam"])

    states = make_states(rng, 10)
    space = np.asarray(state_to_space(jnp.asarray(states)))
    im_boxes = project(space.reshape(-1, 3)).reshape(-1, 8, 2).astype(np.float32)

    # refine P's z-scale against these boxes (reference scale_Z flow).
    # toy_camera is session-scoped: restore the registry's P afterwards so
    # later tests (overlay rendering, tracker runs) see the fixture's
    # original calibration, not this test's random-height refit.
    P_orig = reg.P[c].copy()
    try:
        P = scale_P_z(
            reg.P[c, 0], im_boxes, states[:, 4], reg.H[c, 0]
        )
        reg.set_P(toy_camera["cam"], P)

        H = jnp.asarray(reg.H[c, 0], dtype=jnp.float32)
        Pj = jnp.asarray(P, dtype=jnp.float32)

        st = im_to_state(jnp.asarray(im_boxes), H, jnp.asarray(states[:, 4]))
        repro = np.asarray(state_to_im(st, Pj))

        bottom_err = np.sqrt(((repro[:, :4] - im_boxes[:, :4]) ** 2).sum(-1)).mean()
        top_err = np.sqrt(((repro[:, 4:] - im_boxes[:, 4:]) ** 2).sum(-1)).mean()
    finally:
        reg.P[c] = P_orig  # undo the session-fixture mutation even on failure
    assert bottom_err < 2.0, bottom_err
    assert top_err < 25.0, top_err  # top corners are approximate by design


def test_height_from_template(toy_camera, rng):
    reg = toy_camera["registry"]
    project = toy_camera["project"]
    states = make_states(rng, 8)
    space = np.asarray(state_to_space(jnp.asarray(states)))
    im_boxes = project(space.reshape(-1, 3)).reshape(-1, 8, 2).astype(np.float32)

    # template = same boxes with known heights -> recovered height ~= true
    got = height_from_template(
        jnp.asarray(im_boxes), jnp.asarray(states[:, 4]), jnp.asarray(im_boxes)
    )
    np.testing.assert_allclose(np.asarray(got), states[:, 4], rtol=1e-5)


def test_vanishing_point():
    # lines through a common point (123, -45)
    vp = np.array([123.0, -45.0])
    rng = np.random.default_rng(3)
    angles = rng.uniform(0, np.pi, 12)
    p0 = vp + np.stack([np.cos(angles), np.sin(angles)], 1) * 100
    p1 = vp + np.stack([np.cos(angles), np.sin(angles)], 1) * 300
    lines = np.concatenate([p0, p1], axis=1)
    got = find_vanishing_point(lines)
    np.testing.assert_allclose(got, vp, atol=1e-6)


def test_select_eb_wb():
    y = jnp.asarray([10.0, 70.0])
    eb = jnp.zeros((2, 3))
    wb = jnp.ones((2, 3))
    out = np.asarray(select_eb_wb(y, eb, wb))
    assert out[0].sum() == 0 and out[1].sum() == 3


def test_space_footprint(rng):
    states = make_states(rng, 5)
    space = state_to_space(jnp.asarray(states))
    fp = np.asarray(space_footprint_xyxy(space))
    assert (fp[:, 2] >= fp[:, 0]).all() and (fp[:, 3] >= fp[:, 1]).all()
    # footprint area == l * w
    area = (fp[:, 2] - fp[:, 0]) * (fp[:, 3] - fp[:, 1])
    np.testing.assert_allclose(area, states[:, 2] * states[:, 3], rtol=1e-4)


def test_registry_save_load(toy_camera, tmp_path):
    reg = toy_camera["registry"]
    p = str(tmp_path / "cams.npz")
    reg.save(p)
    from playground3d_tpu.geometry import CameraRegistry

    reg2 = CameraRegistry.load(p)
    assert reg2.names == reg.names
    np.testing.assert_allclose(reg2.H, reg.H)
    np.testing.assert_allclose(reg2.P, reg.P)
