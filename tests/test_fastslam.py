"""Integration tests: FastSLAM 1.0 and MH-FastSLAM on the short 2-D sim."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfs_slam_tpu.filters.fastslam import FastSLAMConfig, FastSLAMFilter
from rfs_slam_tpu.io import sim2d
from rfs_slam_tpu.models.motion import Odometry2D, StaticLandmark
from rfs_slam_tpu.models.measurement import RangeBearing
from rfs_slam_tpu.ops.ekf import InnovationGates


def build_filter(sim_cfg, n_particles=24, max_hypotheses=1):
    dt = sim_cfg.dt
    motion = Odometry2D(
        Q=jnp.diag(jnp.asarray([sim_cfg.vardx, sim_cfg.vardy, sim_cfg.vardz]))
        * (1.5 * dt * dt))
    lmk = StaticLandmark(
        Q=jnp.diag(jnp.asarray([sim_cfg.varlmx, sim_cfg.varlmy])) * dt * dt)
    meas = RangeBearing(
        R=jnp.diag(jnp.asarray([sim_cfg.varzr, sim_cfg.varzb])) * 10.0,
        pd_const=sim_cfg.pd, clutter=sim_cfg.clutter,
        r_max=sim_cfg.range_max, r_min=sim_cfg.range_min,
        r_buf=sim_cfg.range_buffer)
    gates = InnovationGates.range_bearing(range_t=1.0, bearing_t=0.2)
    cfg = FastSLAMConfig(
        n_particles=n_particles, map_capacity=64, z_capacity=24,
        nmz_capacity=28, candidate_capacity=8,
        max_hypotheses=max_hypotheses,
        min_log_likelihood=-10.0, existence_prior=0.5,
        prune_threshold=-5.0, min_updates_before_resample=2,
        ess_threshold=n_particles / 2.0)
    return FastSLAMFilter(motion, lmk, meas, gates, cfg)


@pytest.fixture(scope="module")
def short_sim():
    cfg = sim2d.Sim2DConfig(timesteps=260, n_landmarks=20, n_segments=4)
    return cfg, sim2d.generate(cfg, traj_seed=3, noise_seed=4, z_capacity=24)


def run_filter(filt, sim_cfg, data):
    state = filt.init_state(jax.random.PRNGKey(0), jnp.zeros(3))

    @jax.jit
    def step(state, inp):
        odo, z, z_mask, gt, lock = inp
        state = filt.predict(state, odo, sim_cfg.dt)
        pose = jnp.where(lock, jnp.broadcast_to(gt, state.particles.pose.shape),
                         state.particles.pose)
        state = state.replace(particles=state.particles.replace(pose=pose))
        state = filt.update(state, z, z_mask)
        best = jnp.argmax(state.particles.log_w)
        return state, (state.particles.pose[best], state.gm.count()[best])

    T = sim_cfg.timesteps
    inputs = (
        jnp.asarray(data.odometry[1:], jnp.float32),
        jnp.asarray(data.z[1:], jnp.float32),
        jnp.asarray(data.z_mask[1:]),
        jnp.asarray(data.gt_pose[1:], jnp.float32),
        jnp.arange(1, T) <= 100,
    )
    return jax.lax.scan(step, state, inputs)


def test_fastslam_short_run(short_sim):
    sim_cfg, data = short_sim
    filt = build_filter(sim_cfg)
    state, (best_poses, gm_sizes) = run_filter(filt, sim_cfg, data)
    best_poses = np.asarray(best_poses)
    assert np.isfinite(best_poses).all()
    err = np.linalg.norm(best_poses[:, :2] - data.gt_pose[1:, :2], axis=1)
    assert err[99] < 1e-4
    assert np.median(err[150:]) < 0.6, f"median pose error {np.median(err[150:])}"
    # map tracks roughly the observable landmark count
    assert int(gm_sizes[-1]) > 3
    # log-odds weights finite
    w = np.asarray(state.gm.w)
    assert np.isfinite(w[np.asarray(state.gm.alive)]).all()


def test_mh_fastslam_runs(short_sim):
    sim_cfg, data = short_sim
    filt = build_filter(sim_cfg, n_particles=8, max_hypotheses=3)
    state, (best_poses, gm_sizes) = run_filter(filt, sim_cfg, data)
    best_poses = np.asarray(best_poses)
    assert np.isfinite(best_poses).all()
    err = np.linalg.norm(best_poses[:, :2] - data.gt_pose[1:, :2], axis=1)
    assert np.median(err[150:]) < 1.0
    # grow mode (reference FastSLAM.hpp:335, 728-757): the particle axis is
    # nParticlesMax = 3 * n, and the LIVE set (finite weights) stays within
    # [n, 3n]
    assert state.particles.pose.shape[0] == 24
    n_live = int(np.isfinite(np.asarray(state.particles.log_w)).sum())
    assert 8 <= n_live <= 24
    # live weights are normalized
    lw = np.asarray(state.particles.log_w)
    np.testing.assert_allclose(
        np.exp(lw[np.isfinite(lw)]).sum(), 1.0, rtol=1e-4)


def test_existence_log_odds_hand_computed():
    """Pin the existence-probability update to hand-evaluated values of the
    reference formulas (FastSLAM.hpp:599-620)."""
    import math

    from rfs_slam_tpu.filters.fastslam import existence_log_odds_delta

    pd, p_fa, prior = 0.7, 0.5, 0.5
    # updated: p = ((1-Pd)*Pfa*prior + Pd*prior) / (Pfa + (1-Pfa)*Pd*prior)
    #            = (0.3*0.25 + 0.35) / (0.5 + 0.175) = 0.425/0.675
    p_up = 0.425 / 0.675
    dw = existence_log_odds_delta(pd, p_fa, prior, updated=True, locked=False)
    np.testing.assert_allclose(
        float(dw), math.log(p_up / (1 - p_up)), rtol=1e-6)

    # missed: p = (1-Pd)*prior / ((1-prior) + (1-Pd)*prior) = 0.15/0.65
    p_down = 0.15 / 0.65
    dw = existence_log_odds_delta(pd, p_fa, prior, updated=False, locked=False)
    np.testing.assert_allclose(
        float(dw), math.log(p_down / (1 - p_down)), rtol=1e-6)

    # locked landmark missed: p = 0.5 -> delta exactly 0
    dw = existence_log_odds_delta(pd, p_fa, prior, updated=False, locked=True)
    np.testing.assert_allclose(float(dw), 0.0, atol=1e-7)

    # Pd = 0 (out of range): both branches give delta 0 / 0-ish sanity
    dw = existence_log_odds_delta(0.0, p_fa, prior, updated=False,
                                  locked=False)
    np.testing.assert_allclose(float(dw), 0.0, atol=1e-6)

    # second hand-computed point: pd=0.9, p_fa=0.2, prior=0.6
    pd, p_fa, prior = 0.9, 0.2, 0.6
    p_up = (0.1 * 0.2 * 0.6 + 0.9 * 0.6) / (0.2 + 0.8 * 0.9 * 0.6)
    dw = existence_log_odds_delta(pd, p_fa, prior, updated=True, locked=False)
    np.testing.assert_allclose(
        float(dw), math.log(p_up / (1 - p_up)), rtol=1e-6)


def test_mh_growth_semantics(short_sim):
    """The live particle set grows by hypothesis expansion and collapses to
    n_particles on the force/ESS resample (FastSLAM.hpp:728-757)."""
    import jax

    sim_cfg, data = short_sim
    # huge gates: no ESS resample unless forced by count > nParticlesMax;
    # huge log-lik window so every valid Murty hypothesis is kept
    filt = build_filter(sim_cfg, n_particles=4, max_hypotheses=3)
    cfg = dataclasses.replace(filt.cfg, min_updates_before_resample=10**6,
                              ess_threshold=0.0, max_da_loglik_diff=1e6)
    filt = FastSLAMFilter(filt.motion, filt.lmk, filt.meas, filt.gates, cfg)
    state = filt.init_state(jax.random.PRNGKey(0), jnp.zeros(3))
    assert state.particles.pose.shape[0] == 12
    counts = [int(np.isfinite(np.asarray(state.particles.log_w)).sum())]
    for t in range(1, 10):
        state = filt.predict(state, jnp.asarray(data.odometry[t]), sim_cfg.dt)
        state = filt.update(state, jnp.asarray(data.z[t]),
                            jnp.asarray(data.z_mask[t]))
        counts.append(int(np.isfinite(np.asarray(state.particles.log_w)).sum()))
    # grows past n_particles at least once, never exceeds nParticlesMax,
    # and collapses back to n_particles after a forced resample
    assert max(counts) > 4
    assert max(counts) <= 12
    # the collapse must actually be observed (a grown set followed by a
    # step where the further expansion would exceed n_particles_max forces
    # a resample back to exactly n_particles) — this is the path holding
    # the growth-mode resample, so assert it unconditionally
    collapses = [i for i in range(1, len(counts))
                 if counts[i] == 4 and counts[i - 1] > 4]
    assert collapses, f"no force-resample collapse observed: {counts}"
