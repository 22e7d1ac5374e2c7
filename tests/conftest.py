"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding code
paths (pjit / shard_map over a Mesh) are exercised without TPU hardware.
These env vars must be set before jax initializes its backends, which is why
they live at conftest import time.
"""

import os

# The axon sitecustomize imports jax at interpreter start, so env vars are
# already consumed; override through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: takes >~10s on the 1-core dev box; excluded by the fast "
        "selection `pytest -m 'not slow'` (full suite stays the green gate)",
    )


def pytest_collection_modifyitems(config, items):
    """Data-driven slow marking: tests/slow_tests.txt lists node ids measured
    >~10s on this box (regenerate with `pytest --durations=0` and
    scripts/update_slow_list.py). Keeping the list in a file instead of
    scattering decorators makes it trivially regenerable after perf work."""
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as fh:
            slow = {
                line.strip() for line in fh
                if line.strip() and not line.startswith("#")
            }
    except OSError:
        return
    for item in items:
        if item.nodeid in slow or item.nodeid.split("::")[0] in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


from playground3d_tpu.data.toy_cameras import (  # noqa: E402
    make_projector,
    register_toy_camera,
)


@pytest.fixture(scope="session")
def toy_cameras3():
    """Three overlapping pole cameras along the roadway (like p1c2-p1c4)."""
    from playground3d_tpu.geometry.homography import CameraRegistry

    reg = CameraRegistry()
    projectors = {}
    ranges = {"p1c1": (350, 560), "p1c2": (480, 700), "p1c3": (620, 840)}
    for i, (name, rng_x) in enumerate(ranges.items()):
        proj = make_projector(cam_x=rng_x[0] - 30.0)
        register_toy_camera(reg, name, proj, rng_x, seed=7 + i)
        projectors[name] = proj
    centers = np.array([[(a + b) / 2.0, 60.0] for a, b in ranges.values()], np.float32)
    return {"registry": reg, "projectors": projectors, "ranges": ranges, "centers": centers}


@pytest.fixture(scope="session")
def toy_camera():
    """A synthetic but realistic camera correspondence: a plausible
    perspective ground-plane homography for a pole-mounted highway camera,
    used across geometry/tracker tests."""
    from playground3d_tpu.geometry.homography import (
        CameraRegistry,
        build_projection,
    )

    # Ground-truth camera: world (ft) -> image (px) pinhole-ish model.
    # Camera at x=400 ft along road, 30 ft above ground, looking down-road.
    rng = np.random.default_rng(7)
    # Define a ground plane mapping by projecting known space points through
    # a synthetic 3x4 camera matrix.
    f = 2000.0
    cx, cy = 960.0, 540.0
    cam_pos = np.array([350.0, 60.0, -45.0])  # z negative is up (ref conv)

    def project(pts3):
        # look direction: down the +x road, pitched down
        d = pts3 - cam_pos
        # rotate: camera x-axis = world y, camera y-axis tilted, z = +x road
        yaw = np.deg2rad(8.0)
        pitch = np.deg2rad(12.0)
        Ry = np.array(
            [
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ]
        )
        Rx = np.array(
            [
                [1, 0, 0],
                [0, np.cos(pitch), -np.sin(pitch)],
                [0, np.sin(pitch), np.cos(pitch)],
            ]
        )
        # world (road x, lane y, up -z) -> cam coords
        cam = np.stack([d[:, 1], -d[:, 2], d[:, 0]], axis=1)
        cam = cam @ Ry.T @ Rx.T
        u = f * cam[:, 0] / cam[:, 2] + cx
        v = f * cam[:, 1] / cam[:, 2] + cy
        return np.stack([u, v], axis=1)

    # correspondences on the ground plane
    gx = rng.uniform(380, 650, size=24)
    gy = rng.uniform(0, 120, size=24)
    space_pts = np.stack([gx, gy], axis=1)
    ground3 = np.concatenate([space_pts, np.zeros((24, 1))], axis=1)
    corr_pts = project(ground3)

    # z vanishing point: the limit of projections of increasingly tall points
    vp_z = project(np.array([[500.0, 60.0, -1e7]]))[0]
    vps = np.array([[1e6, cy], [cx, 1e6], vp_z])

    reg = CameraRegistry()
    reg.add_camera("p1c1", corr_pts, space_pts, vps)
    return {"registry": reg, "project": project, "cam": "p1c1"}
