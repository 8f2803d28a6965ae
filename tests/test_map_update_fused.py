"""Fused Pallas map-update kernel vs the XLA path (interpret mode on CPU).

The kernel (ops/pallas/map_update2d.py) must reproduce the XLA
implementation of filters/rbphd.py:_map_update bit-for-bit up to float
reassociation: same Pd/close semantics, same EKF planes, same weight table
normalization, same missed-detection compensation, same hierarchical
selection survivors.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfs_slam_tpu.core import planar
from rfs_slam_tpu.io import sim2d
from rfs_slam_tpu.ops.ekf import correct_all
from rfs_slam_tpu.ops.pallas.map_update2d import (fused_map_update2d,
                                                  pack_params)
from tests.test_rbphd_filter import build_filter


@pytest.fixture(scope="module")
def midrun_state():
    """A realistic mid-stream filter state (maps populated, XLA path)."""
    sim_cfg = sim2d.Sim2DConfig(timesteps=60, n_landmarks=20, n_segments=4)
    data = sim2d.generate(sim_cfg, traj_seed=3, noise_seed=4, z_capacity=24)
    filt = build_filter(sim_cfg, n_particles=16)
    filt.cfg = dataclasses.replace(filt.cfg, map_capacity=128)
    state = filt.init_state(jax.random.PRNGKey(0), jnp.zeros(3))

    @jax.jit
    def step(state, inp):
        odo, z, z_mask, gt = inp
        state = filt.predict(state, odo, sim_cfg.dt)
        pose = jnp.broadcast_to(gt, state.particles.pose.shape)
        state = state.replace(particles=state.particles.replace(pose=pose))
        return filt.update(state, z, z_mask), None

    inputs = (
        jnp.asarray(data.odometry[1:], jnp.float32),
        jnp.asarray(data.z[1:], jnp.float32),
        jnp.asarray(data.z_mask[1:]),
        jnp.asarray(data.gt_pose[1:], jnp.float32),
    )
    state, _ = jax.lax.scan(step, state, inputs)
    t = 45
    return (filt, state,
            jnp.asarray(data.z[t], jnp.float32),
            jnp.asarray(data.z_mask[t]))


def test_kernel_planes_match_xla(midrun_state):
    """Kernel intermediate outputs == the XLA formulas, elementwise."""
    filt, state, z, z_mask = midrun_state
    cfg = filt.cfg
    gm = state.gm
    pose = state.particles.pose
    meas, gates = filt.meas, filt.gates
    P, M = gm.w.shape
    Zc = z.shape[0]

    params = pack_params(meas, gates, cfg.new_gaussian_md_threshold,
                         cfg.birth_gaussian_weight)
    fo = fused_map_update2d(
        pose, gm.mean[0], gm.mean[1], gm.cov[0], gm.cov[1], gm.cov[2],
        gm.w, gm.w_prev, gm.alive, z, z_mask, params,
        new_per_z=cfg.new_per_z, interpret=True)

    # ---- XLA reference quantities (the _map_update head, verbatim)
    pd_raw, close = meas.pd_p(pose[:, None, :], gm.mean, gm.cov)
    pd_raw = jnp.where(gm.alive, pd_raw, 0.0)
    close = close & gm.alive
    pd = jnp.where(close, 1.0, pd_raw)
    corr = correct_all(meas, gates, pose, gm.mean, gm.cov, z)
    md_gate = corr.md2 <= cfg.new_gaussian_md_threshold**2
    cell = (gm.alive[:, None, :] & (pd[:, None, :] > 0.0)
            & z_mask[None, :, None] & md_gate & (corr.likelihood > 0.0))
    w_tab = jnp.where(cell, pd[:, None, :] * gm.w[:, None, :]
                      * corr.likelihood, 0.0)
    clutter = meas.clutter_intensity(z, jnp.sum(z_mask))
    col_sum = clutter + jnp.sum(w_tab, axis=2)
    w_tab = jnp.where(z_mask[None, :, None], w_tab / col_sum[:, :, None], 0.0)
    w_miss = (1.0 - pd) * gm.w
    delta = pd * gm.w - jnp.sum(w_tab, axis=1)
    comp = close & (gm.w > cfg.birth_gaussian_weight) & (delta > 0.0)
    w_miss = jnp.where(comp, jnp.minimum(w_miss + delta, 1.0), w_miss)
    used = jnp.any(w_tab > 0.0, axis=2)
    unused = z_mask[None, :] & ~used

    np.testing.assert_allclose(np.asarray(fo.pd), np.asarray(pd),
                               rtol=1e-6, atol=1e-7)
    # col_sum is a [M]=128-term f32 reduction: its sum order depends on the
    # XLA:CPU instruction selection, which varies when the persistent cache
    # replays an executable compiled on a different host (observed: a
    # cross-machine AOT cache hit shifted col_sum by up to 1.4e-5 relative,
    # tripping the old 1e-5 gate only in full-suite runs).  5e-5 keeps the
    # parity claim (f32 roundoff, not algorithmic drift).
    np.testing.assert_allclose(np.asarray(fo.col_sum), np.asarray(col_sum),
                               rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(fo.w), np.asarray(jnp.where(gm.alive, w_miss, gm.w)),
        rtol=5e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(fo.unused), np.asarray(unused))
    np.testing.assert_allclose(np.asarray(fo.K), np.asarray(corr.K),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fo.cov_upd),
                               np.asarray(corr.cov_upd),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fo.z_exp), np.asarray(corr.z_exp),
                               rtol=1e-5, atol=1e-6)

    # hierarchical selection survivors (iterated first-max, XLA formulation)
    T_pz = min(cfg.new_per_z, M)
    m_ids = jnp.arange(M)
    v = w_tab
    col_vals, col_midx = [], []
    for _ in range(T_pz):
        am = jnp.argmax(v, axis=2)
        col_vals.append(jnp.max(v, axis=2))
        col_midx.append(am)
        v = jnp.where(m_ids[None, None, :] == am[:, :, None], 0.0, v)
    cand_w = jnp.concatenate(col_vals, axis=1)
    cand_m = jnp.concatenate(col_midx, axis=1)
    np.testing.assert_allclose(np.asarray(fo.cand_w), np.asarray(cand_w),
                               rtol=1e-5, atol=1e-8)
    # indices must agree wherever the weight is nonzero (zero-weight slots
    # are never selected downstream; their argmax tie-break is arbitrary)
    nz = np.asarray(cand_w) > 0
    np.testing.assert_array_equal(np.asarray(fo.cand_m)[nz],
                                  np.asarray(cand_m)[nz])


def test_filter_step_fused_vs_xla(midrun_state):
    """_map_update end-to-end: fused path == XLA path."""
    filt, state, z, z_mask = midrun_state
    filt_x = build_filter_like(filt, fused="off", cluster=True)
    filt_f = build_filter_like(filt, fused="interpret", cluster=True)
    out_x = filt_x._map_update(state, z, z_mask, filt.meas)
    out_f = filt_f._map_update(state, z, z_mask, filt.meas)
    gm_x, lw_x, un_x, fov_x, cz_x = out_x
    gm_f, lw_f, un_f, fov_f, cz_f = out_f
    np.testing.assert_array_equal(np.asarray(gm_f.alive),
                                  np.asarray(gm_x.alive))
    a = np.asarray(gm_x.alive)
    for name, fx, ff in (("mean", gm_x.mean, gm_f.mean),
                         ("cov", gm_x.cov, gm_f.cov)):
        np.testing.assert_allclose(np.asarray(ff)[:, a], np.asarray(fx)[:, a],
                                   rtol=1e-4, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(gm_f.w)[a], np.asarray(gm_x.w)[a],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lw_f), np.asarray(lw_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(un_f), np.asarray(un_x))
    np.testing.assert_array_equal(np.asarray(fov_f), np.asarray(fov_x))
    np.testing.assert_allclose(np.asarray(cz_f), np.asarray(cz_x))


def build_filter_like(filt, fused, cluster=False):
    from rfs_slam_tpu.filters.rbphd import RBPHDFilter

    cfg = dataclasses.replace(filt.cfg, fused_map_update=fused,
                              use_cluster_process=cluster)
    return RBPHDFilter(filt.motion, filt.lmk, filt.meas, filt.gates, cfg)
