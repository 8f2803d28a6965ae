"""Victoria Park model + app wiring tests (CPU, tiny shapes).

Covers the VictoriaPark measurement model (measure/inverse round-trip,
scan-dependent Pd, clutter), and the FastSLAM/RB-PHD Victoria Park app
builders parsing the reference XML configs unchanged
(fastslam_VictoriaPark.cpp:85-184, rbphdslam_VictoriaPark.cpp:85-184).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfs_slam_tpu.models.victoria_park import VictoriaPark, fov_area_clutter

REF_CFG = "/root/reference/cfg"


def make_model():
    return VictoriaPark(
        R=jnp.diag(jnp.asarray([0.025, 2.5e-5, 2e-3])),
        slb=jnp.asarray(1e-5),
        pd_table=jnp.asarray([0.0, 0.2, 0.4, 0.6, 0.8, 0.9]),
        r_max=70.0, r_min=1.0, b_max=3.09, b_min=-3.09,
        clutter_value=fov_area_clutter(3.0, 1.0, 70.0, -3.09, 3.09),
    )


def test_measure_inverse_roundtrip():
    m = make_model()
    pose = jnp.asarray([1.0, 2.0, 0.3])
    lm = jnp.asarray([6.0, 8.0, 0.5])
    pred = m.measure(pose, lm)
    mean, cov = m.inverse(pose, pred.z)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(lm), atol=1e-5)
    # S is symmetric PSD
    S = np.asarray(pred.S)
    np.testing.assert_allclose(S, S.T, atol=1e-7)
    assert np.all(np.linalg.eigvalsh(S) > 0)
    # diameter variance grows with range^2 * slb
    lm_far = jnp.asarray([40.0, 40.0, 0.5])
    S_far = np.asarray(m.measure(pose, lm_far).S)
    assert S_far[2, 2] > S[2, 2]


def test_pd_geometry():
    m = make_model()
    pose = jnp.zeros(3)
    # lidar frame is pose rotated -pi/2: a tree at -y is at bearing ~0
    near = jnp.asarray([0.0, -5.0, 1.0])
    far = jnp.asarray([0.0, -200.0, 1.0])
    pd_near, _ = m.pd(pose, near)
    pd_far, _ = m.pd(pose, far)
    assert float(pd_near) > 0.0
    assert float(pd_far) == 0.0  # beyond range limit
    # a bigger tree at the same spot subtends more beams -> pd >= smaller
    small = jnp.asarray([0.0, -5.0, 0.05])
    pd_small, _ = m.pd(pose, small)
    assert float(pd_near) >= float(pd_small)


def test_with_scan_blocks_detection():
    m = make_model()
    pose = jnp.zeros(3)
    # lidar bearing 90 deg (vehicle +x): beam window lies inside the real
    # 361-beam half of the 720-bin circle (no wrap into zero padding)
    tree = jnp.asarray([10.0, 0.0, 1.0])
    pd_open, _ = m.pd(pose, tree)
    # a wall at 2 m in front of everything blocks the tree at 10 m
    m_wall = m.with_scan(jnp.full((361,), 2.0))
    pd_blocked, _ = m_wall.pd(pose, tree)
    assert float(pd_blocked) < float(pd_open)
    assert m_wall.has_scan
    assert float(m_wall.clutter_value) > 0


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference cfg absent")
def test_fastslam_vp_build_and_step():
    from rfs_slam_tpu.apps.fastslam_victoriapark import build
    from rfs_slam_tpu.io.xmlconfig import XmlConfig

    cfg = XmlConfig(os.path.join(REF_CFG, "fastslam_VictoriaPark.xml"))
    filt, input_cov, ack = build(cfg, z_capacity=8, map_capacity=32,
                                 n_particles=4)
    assert filt.cfg.max_hypotheses == 1
    state = filt.init_state(jax.random.PRNGKey(0), jnp.zeros(3), d=3)
    state = filt.predict(state, jnp.asarray([3.0, 0.1]), 0.025,
                         use_model_noise=False, use_input_noise=True,
                         input_cov=input_cov)
    z = jnp.zeros((8, 3)).at[0].set(jnp.asarray([10.0, 1.5, 0.6]))
    z_mask = jnp.zeros((8,), bool).at[0].set(True)
    state = filt.update(state, z, z_mask)
    assert np.isfinite(np.asarray(state.particles.log_w)).all()
    assert np.isfinite(np.asarray(state.particles.pose)).all()


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference cfg absent")
def test_mhfastslam_vp_build():
    from rfs_slam_tpu.apps.fastslam_victoriapark import build
    from rfs_slam_tpu.io.xmlconfig import XmlConfig

    cfg = XmlConfig(os.path.join(REF_CFG, "mhfastslam_VictoriaPark.xml"))
    filt, _, _ = build(cfg, z_capacity=8, map_capacity=32, n_particles=4)
    assert filt.cfg.max_hypotheses > 1


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference cfg absent")
def test_rbphd_vp_build():
    from rfs_slam_tpu.apps.rbphdslam_victoriapark import build
    from rfs_slam_tpu.io.xmlconfig import XmlConfig

    cfg = XmlConfig(os.path.join(REF_CFG, "rbphdslam_VictoriaPark.xml"))
    filt, input_cov, ack = build(cfg, z_capacity=8, map_capacity=32,
                                 n_particles=4)
    assert filt.cfg.n_particles == 4
