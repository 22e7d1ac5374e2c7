"""Batched KF correctness: equivalence with a scalar numpy reference filter,
slot lifecycle, direction-signed dynamics, multi-measurement models.
(Modeled on the reference's kf.py self-benchmark, util_track/kf.py:430-504.)
"""

import numpy as np
import pytest

from playground3d_tpu.track.kf import (
    BatchedKF,
    default_params,
    DT_DEFAULT,
    STATE_SIZE,
)


def numpy_kf_predict(x, P, d, dt, params):
    F = np.asarray(params.F).copy()
    F[0, 5] = d * dt
    Q = np.asarray(params.Q)
    x2 = F @ x
    P2 = F @ P @ F.T + Q * dt / DT_DEFAULT
    return x2, P2


def numpy_kf_update(x, P, z, params):
    H = np.asarray(params.H)
    R = np.asarray(params.R)
    mu_R = np.asarray(params.mu_R)
    y = z + mu_R - H @ x
    S = H @ P @ H.T + R
    K = P @ H.T @ np.linalg.inv(S)
    x2 = x + K @ y
    P2 = (np.eye(STATE_SIZE) - K @ H) @ P
    return x2, P2


def test_matches_scalar_filter(rng):
    params = default_params()
    kf = BatchedKF(params, capacity=16)

    n = 4
    det0 = rng.uniform(0, 50, (n, 5)).astype(np.float32)
    dirs = np.array([1, -1, 1, -1], dtype=np.float32)
    times = np.zeros(n)
    kf.add(det0, list(range(n)), dirs, times)

    # scalar replicas
    xs = [np.concatenate([det0[i], [0.0]]) for i in range(n)]
    Ps = [np.asarray(params.P0).copy() for _ in range(n)]

    for step in range(5):
        dt = DT_DEFAULT * (1 + step * 0.1)
        kf.predict(dt)
        z = rng.uniform(0, 50, (n, 5)).astype(np.float32)
        kf.update(z, list(range(n)))
        for i in range(n):
            xs[i], Ps[i] = numpy_kf_predict(xs[i], Ps[i], dirs[i], dt, params)
            xs[i], Ps[i] = numpy_kf_update(xs[i], Ps[i], z[i], params)

    ids, states = kf.view()
    assert ids == list(range(n))
    np.testing.assert_allclose(states, np.stack(xs), rtol=2e-3, atol=2e-3)


def test_direction_signed_velocity():
    params = default_params()
    kf = BatchedKF(params, capacity=8)
    det = np.array([[100.0, 50, 20, 6, 5], [100.0, 50, 20, 6, 5]], np.float32)
    kf.add(det, [0, 1], np.array([1.0, -1.0]), np.zeros(2))
    # manually set speed
    import jax.numpy as jnp

    kf.slots = kf.slots._replace(x=kf.slots.x.at[:, 5].set(30.0))
    kf.predict(1.0)
    _, states = kf.view()
    assert states[0, 0] > 100.0  # EB moves +x
    assert states[1, 0] < 100.0  # WB moves -x
    np.testing.assert_allclose(states[0, 0] - 100.0, 30.0, atol=1e-3)
    np.testing.assert_allclose(states[1, 0] - 100.0, -30.0, atol=1e-3)


def test_add_remove_lifecycle(rng):
    kf = BatchedKF(capacity=8)
    det = rng.uniform(0, 50, (3, 5)).astype(np.float32)
    kf.add(det, [10, 11, 12], np.ones(3), np.zeros(3))
    assert len(kf) == 3
    kf.remove([11])
    ids, states = kf.view()
    assert ids == [10, 12]
    # slot is recycled
    kf.add(det[:1], [13], np.ones(1), np.zeros(1))
    assert len(kf) == 3
    ids, _ = kf.view()
    assert set(ids) == {10, 12, 13}


def test_view_with_direction(rng):
    kf = BatchedKF(capacity=8)
    det = rng.uniform(0, 50, (2, 5)).astype(np.float32)
    kf.add(det, [0, 1], np.array([1.0, -1.0]), np.zeros(2))
    ids, states = kf.view(with_direction=True)
    assert states.shape == (2, 7)
    np.testing.assert_allclose(states[:, 5], [1.0, -1.0])


def test_class_size_init():
    params = default_params()
    kf = BatchedKF(params, capacity=8)
    det = np.array([[100.0, 50, 99, 99, 99]], np.float32)
    kf.add(det, [0], np.ones(1), np.zeros(1), classes=[4])  # semi
    _, states = kf.view()
    np.testing.assert_allclose(states[0, 2:5], [55.0, 9.0, 12.0])  # class mean


def test_measurement_model_3_size_nudge():
    params = default_params()
    kf = BatchedKF(params, capacity=8)
    det = np.array([[100.0, 50, 20, 6, 5]], np.float32)
    kf.add(det, [0], np.ones(1), np.zeros(1))
    before = kf.view()[1][0].copy()
    kf.update(np.array([[30.0, 8.0, 7.0]], np.float32), [0], measurement_idx=3)
    after = kf.view()[1][0]
    # l,w,h moved toward the nudge; x,y untouched
    assert abs(after[2] - 30) < abs(before[2] - 30)
    np.testing.assert_allclose(after[0:2], before[0:2], atol=1e-5)


def test_per_object_dt(rng):
    kf = BatchedKF(capacity=8)
    det = rng.uniform(0, 50, (2, 5)).astype(np.float32)
    kf.add(det, [0, 1], np.ones(2), np.array([0.0, 0.5]))
    dts = kf.get_dt(1.0)
    live = sorted(kf.slot_of.values())
    np.testing.assert_allclose(dts[live], [1.0, 0.5])
    # targeted dt for subset
    dts = kf.get_dt([2.0], idxs=[1])
    np.testing.assert_allclose(dts[kf.slot_of[1]], 1.5)
    np.testing.assert_allclose(dts[kf.slot_of[0]], DT_DEFAULT)


def test_dead_slots_untouched(rng):
    kf = BatchedKF(capacity=8)
    det = rng.uniform(0, 50, (1, 5)).astype(np.float32)
    kf.add(det, [0], np.ones(1), np.zeros(1))
    x_before = np.asarray(kf.slots.x).copy()
    kf.predict(1.0)
    x_after = np.asarray(kf.slots.x)
    live = kf.slot_of[0]
    dead = [i for i in range(8) if i != live]
    np.testing.assert_allclose(x_after[dead], x_before[dead])


def test_spd_solve_matches_linalg():
    """_spd_solve (unrolled Cholesky) == jnp.linalg.solve on random SPD
    batches for both measurement sizes."""
    import numpy as np
    import jax.numpy as jnp

    from playground3d_tpu.track.kf import _spd_solve

    rng = np.random.default_rng(0)
    for m in (3, 5, 6):
        A = rng.normal(0, 1, (32, m, m)).astype(np.float32)
        S = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(m, dtype=np.float32)
        B = rng.normal(0, 1, (32, m, 4)).astype(np.float32)
        want = np.linalg.solve(S, B)
        got = np.asarray(_spd_solve(jnp.asarray(S), jnp.asarray(B)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
