"""Tests for motion and measurement models vs hand-computed references."""

import numpy as np
import jax
import jax.numpy as jnp

from rfs_slam_tpu.models.motion import Odometry2D, Ackerman2D, StaticLandmark
from rfs_slam_tpu.models.measurement import RangeBearing, XY, Range1D


def ref_odometry2d_step(pose, u):
    # reference: ProcessModel_Odometry2D.cpp:41-89
    x, y, th = pose
    dx, dy, dth = u
    c, s = np.cos(th), np.sin(th)
    C_km = np.array([[c, s], [-s, c]])
    p = np.array([x, y]) + C_km.T @ np.array([dx, dy])
    cu, su = np.cos(dth), np.sin(dth)
    C_u = np.array([[cu, su], [-su, cu]])
    C_k = C_u @ C_km
    th_k = np.arctan2(C_k[0, 1], C_k[0, 0])
    return np.array([p[0], p[1], th_k])


def test_odometry2d_step(rng):
    model = Odometry2D(Q=jnp.eye(3) * 0.01)
    poses = rng.normal(size=(32, 3)).astype(np.float32)
    us = (rng.normal(size=(32, 3)) * 0.3).astype(np.float32)
    out = np.asarray(model.step(jnp.asarray(poses), jnp.asarray(us), 0.1))
    for i in range(32):
        expect = ref_odometry2d_step(poses[i], us[i])
        np.testing.assert_allclose(out[i, :2], expect[:2], atol=1e-5)
        np.testing.assert_allclose(np.cos(out[i, 2]), np.cos(expect[2]), atol=1e-5)
        np.testing.assert_allclose(np.sin(out[i, 2]), np.sin(expect[2]), atol=1e-5)


def test_ackerman_step():
    # reference: ProcessModel_Ackerman2D.cpp:49-77
    model = Ackerman2D(Q=jnp.zeros((3, 3)), h=0.76, l=2.83, dx=0.5, dy=0.5)
    pose = np.array([1.0, 2.0, 0.3])
    u = np.array([2.0, 0.1])
    dt = 0.025
    v, r = u
    v = v / (1 - np.tan(r) * 0.76 / 2.83)
    c, s = np.cos(0.3), np.sin(0.3)
    t = np.tan(r)
    exp = pose + dt * np.array(
        [
            v * c - v / 2.83 * t * (0.5 * s + 0.5 * c),
            v * s + v / 2.83 * t * (0.5 * c - 0.5 * s),
            v / 2.83 * t,
        ]
    )
    out = np.asarray(model.step(jnp.asarray(pose), jnp.asarray(u), dt))
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


def test_static_landmark():
    m = StaticLandmark(Q=jnp.eye(2) * 0.1)
    mean, cov = m.static_step(jnp.ones((4, 2)), jnp.broadcast_to(jnp.eye(2), (4, 2, 2)), 0.1)
    np.testing.assert_allclose(np.asarray(mean), 1.0)
    np.testing.assert_allclose(np.asarray(cov[0]), np.eye(2) * 1.1, atol=1e-6)


def test_rngbrg_measure_jacobians(rng):
    model = RangeBearing(R=jnp.eye(2) * 0.01)
    pose = jnp.asarray([0.5, -0.2, 0.7])
    lm = jnp.asarray([2.0, 1.5])

    pred = model.measure(pose, lm)
    # analytic h
    dx, dy = 2.0 - 0.5, 1.5 + 0.2
    r = np.hypot(dx, dy)
    b = np.arctan2(dy, dx) - 0.7
    np.testing.assert_allclose(np.asarray(pred.z), [r, b], atol=1e-5)

    # Jacobians vs autodiff
    h_lmk = jax.jacfwd(lambda m: model.measure(pose, m).z)(lm)
    h_pose = jax.jacfwd(lambda p: model.measure(p, lm).z)(pose)
    np.testing.assert_allclose(np.asarray(pred.H_lmk), np.asarray(h_lmk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred.H_pose), np.asarray(h_pose), atol=1e-4)

    # S = H Sigma H^T + R
    cov = jnp.asarray([[0.02, 0.005], [0.005, 0.03]])
    pred2 = model.measure(pose, lm, cov)
    S_np = np.asarray(pred.H_lmk) @ np.asarray(cov) @ np.asarray(pred.H_lmk).T + 0.01 * np.eye(2)
    np.testing.assert_allclose(np.asarray(pred2.S), S_np, atol=1e-4)


def test_rngbrg_inverse_roundtrip():
    model = RangeBearing(R=jnp.eye(2) * 0.01)
    pose = jnp.asarray([0.5, -0.2, 0.7])
    z = jnp.asarray([2.0, 0.3])
    mean, cov = model.inverse(pose, z)
    pred = model.measure(pose, mean)
    np.testing.assert_allclose(np.asarray(pred.z), np.asarray(z), atol=1e-5)
    # cov = Hinv R Hinv^T is SPD
    assert np.linalg.eigvalsh(np.asarray(cov)).min() > 0


def test_rngbrg_pd_zones():
    model = RangeBearing(R=jnp.eye(2) * 0.01, pd_const=0.9,
                         r_max=5.0, r_min=0.3, r_buf=0.25)
    pose = jnp.zeros((3,))
    lms = jnp.asarray([[1.0, 0.0], [4.9, 0.0], [5.1, 0.0], [6.0, 0.0], [0.1, 0.0]])
    pd, close = model.pd(pose, lms)
    np.testing.assert_allclose(np.asarray(pd), [0.9, 0.9, 0.0, 0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(close), [False, True, True, False, True])


def test_xy_roundtrip():
    model = XY(R=jnp.eye(2) * 0.01)
    pose = jnp.asarray([1.0, 2.0, -0.4])
    lm = jnp.asarray([3.0, 1.0])
    pred = model.measure(pose, lm)
    mean, _ = model.inverse(pose, pred.z)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(lm), atol=1e-5)
    h_lmk = jax.jacfwd(lambda m: model.measure(pose, m).z)(lm)
    np.testing.assert_allclose(np.asarray(pred.H_lmk), np.asarray(h_lmk), atol=1e-5)
    h_pose = jax.jacfwd(lambda p: model.measure(p, lm).z)(pose)
    np.testing.assert_allclose(np.asarray(pred.H_pose), np.asarray(h_pose), atol=1e-5)


def test_range1d():
    model = Range1D(R=jnp.asarray([[0.01]]))
    pose = jnp.asarray([1.0])
    lm = jnp.asarray([3.0])
    pred = model.measure(pose, lm)
    np.testing.assert_allclose(np.asarray(pred.z), [2.0])
    mean, cov = model.inverse(pose, pred.z)
    np.testing.assert_allclose(np.asarray(mean), [3.0])
