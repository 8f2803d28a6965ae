"""Experiment: plane-layout EKF correct vs current [P,M,2,2] layout."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rfs_slam_tpu.utils import cache
cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from rfs_slam_tpu.core import gaussian
from rfs_slam_tpu.ops.ekf import correct_all

P, M, ZC = 200, 128, 40

filt = ge._build(n_particles=P, map_capacity=M, z_capacity=ZC,
                 new_capacity=64, eval_capacity=15, z_dp_max=10)
key = jax.random.PRNGKey(0)
state, odo, z, z_mask = ge._example_inputs(filt, key)
z = jnp.tile(z[: ZC // 4], (4, 1))[:ZC]
pose = state.particles.pose
gm = state.gm
meas = filt.meas
gates = filt.gates


def planar_correct(pose, mean, cov, z):
    px, py, pth = pose[:, 0:1], pose[:, 1:2], pose[:, 2:3]   # [P,1]
    mx, my = mean[..., 0], mean[..., 1]                       # [P,M]
    c00, c01, c11 = cov[..., 0, 0], cov[..., 0, 1], cov[..., 1, 1]
    R = meas.R
    r00, r01, r11 = R[0, 0], R[0, 1], R[1, 1]

    dx, dy = mx - px, my - py
    r2 = dx * dx + dy * dy
    r = jnp.sqrt(r2)
    b = gaussian.wrap_angle(jnp.arctan2(dy, dx) - pth)
    h00, h01 = dx / r, dy / r
    h10, h11 = -dy / r2, dx / r2
    # S = H C H^T + R
    t00 = c00 * h00 + c01 * h01
    t01 = c01 * h00 + c11 * h01
    t10 = c00 * h10 + c01 * h11
    t11 = c01 * h10 + c11 * h11
    s00 = h00 * t00 + h01 * t01 + r00
    s01 = h10 * t00 + h11 * t01 + r01
    s11 = h10 * t10 + h11 * t11 + r11
    dS = s00 * s11 - s01 * s01
    i00, i01, i11 = s11 / dS, -s01 / dS, s00 / dS
    # K = C H^T Sinv ; C H^T = [[t00,t10],[t01,t11]]
    k00 = t00 * i00 + t10 * i01
    k01 = t00 * i01 + t10 * i11
    k10 = t01 * i00 + t11 * i01
    k11 = t01 * i01 + t11 * i11
    # cov_upd = (I - K H) C, symmetrized
    a00 = 1.0 - (k00 * h00 + k01 * h10)
    a01 = -(k00 * h01 + k01 * h11)
    a10 = -(k10 * h00 + k11 * h10)
    a11 = 1.0 - (k10 * h01 + k11 * h11)
    u00 = a00 * c00 + a01 * c01
    u01 = a00 * c01 + a01 * c11
    u10 = a10 * c00 + a11 * c01
    u11 = a10 * c01 + a11 * c11
    u01s = 0.5 * (u01 + u10)
    norm = 2.0 * jnp.pi * jnp.sqrt(dS)
    mvalid = (r <= meas.r_max) & (r >= meas.r_min)

    e0 = z[:, 0][:, None, None] - r[None]                    # [Z,P,M]
    e1 = gaussian.wrap_angle(z[:, 1][:, None, None] - b[None])
    md2 = e0 * (i00 * e0 + i01 * e1) + e1 * (i01 * e0 + i11 * e1)
    lik = jnp.exp(-0.5 * md2) / norm[None]
    thr = gates.thresholds
    ok = jnp.ones((), bool)
    ok = ok & jnp.where(thr[0] > 0, jnp.abs(e0) <= thr[0], True)
    ok = ok & jnp.where(thr[1] > 0, jnp.abs(e1) <= thr[1], True)
    valid = ok & mvalid[None]
    lik = jnp.where(valid & jnp.isfinite(lik), lik, 0.0)
    mux = mx[None] + k00[None] * e0 + k01[None] * e1
    muy = my[None] + k10[None] * e0 + k11[None] * e1
    return lik, md2, mux, muy, u00, u01s, u11, valid, mvalid


def timeit(name, fn, *args, n=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:8.3f} ms")
    return out


old = timeit("correct_all (current)",
             lambda p, m, c: correct_all(meas, gates, p, m, c, z),
             pose, gm.mean, gm.cov)
new = timeit("correct planar",
             planar_correct, pose, gm.mean, gm.cov, z)

# numeric agreement
lik_o = np.asarray(old.likelihood)          # [P,M,Z]
lik_n = np.moveaxis(np.asarray(new[0]), 0, -1)
print("max |lik diff| =", np.abs(lik_o - lik_n).max())
md_o = np.asarray(old.md2)
md_n = np.moveaxis(np.asarray(new[1]), 0, -1)
m = np.asarray(old.valid)
print("max |md2 diff| (valid) =", np.abs((md_o - md_n))[m].max())
mu_o = np.asarray(old.mean_upd)[..., 0]
mu_n = np.moveaxis(np.asarray(new[2]), 0, -1)
print("max |mux diff| (valid) =", np.abs(mu_o - mu_n)[m].max())
cu_o = np.asarray(old.cov_upd)
print("max |u00 diff| =", np.abs(cu_o[..., 0, 0] - np.asarray(new[4])).max())
