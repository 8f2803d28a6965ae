"""Per-phase XLA compile-time profiler (TPU backend).

The round-1 bench recorded 1,030 s of compile time for the whole-run scan
(BENCH_r01.json).  This script lowers + compiles each filter phase separately
on the TPU backend and times the compiles, so optimization targets the actual
hotspot instead of guesses.

Usage: python scripts/compile_profile.py [piece ...]
Pieces: predict correct weight_table rfs merge update scan
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402

from rfs_slam_tpu.ops import gm as gm_ops  # noqa: E402
from rfs_slam_tpu.ops import rfs_likelihood  # noqa: E402
from rfs_slam_tpu.ops.ekf import correct_all  # noqa: E402


def timed_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_comp = time.time() - t0
    print(f"{name:16s} lower {t_lower:7.2f}s  compile {t_comp:8.2f}s",
          flush=True)


def main():
    pieces = set(sys.argv[1:]) or {
        "predict", "correct", "weight_table", "rfs", "merge", "update"
    }
    sim_cfg, data, filt = bench.build()
    state = filt.init_state(jax.random.PRNGKey(0), jnp.zeros(3))
    z = jnp.asarray(data.z[1], jnp.float32)
    z_mask = jnp.asarray(data.z_mask[1])
    odo = jnp.asarray(data.odometry[1], jnp.float32)
    cfg = filt.cfg
    P, M, Zc, E = cfg.n_particles, cfg.map_capacity, cfg.z_capacity, cfg.eval_capacity

    if "predict" in pieces:
        timed_compile("predict",
                      lambda s: filt.predict(s, odo, sim_cfg.dt), state)

    if "correct" in pieces:
        timed_compile(
            "correct_all",
            lambda pose, m, c: correct_all(filt.meas, filt.gates, pose, m, c, z),
            state.particles.pose, state.gm.mean, state.gm.cov)

    if "rfs" in pieces:
        key = jax.random.PRNGKey(1)
        L = jax.random.uniform(key, (P, E, Zc))
        pd = jnp.full((P, E), 0.9)
        row_active = jnp.ones((P, E), bool)
        clutter = jnp.full((P, Zc), 1e-4)
        timed_compile(
            "rfs_likelihood",
            lambda L: rfs_likelihood.rfs_log_likelihood(
                L, pd, row_active, clutter, z_mask, 0.0,
                z_dp_max=cfg.z_dp_max),
            L)

    if "merge" in pieces:
        timed_compile(
            "merge(xla)",
            lambda g: gm_ops.merge(g, cfg.merge_threshold,
                                   cfg.merge_inflation, impl="xla"),
            state.gm)
        timed_compile(
            "merge(auto)",
            lambda g: gm_ops.merge(g, cfg.merge_threshold,
                                   cfg.merge_inflation),
            state.gm)

    if "update" in pieces:
        timed_compile("update",
                      lambda s: filt.update(s, z, z_mask), state)

    if "scan" in pieces:
        def step(s, inp):
            o, zz, zm = inp
            s = filt.predict(s, o, sim_cfg.dt)
            s = filt.update(s, zz, zm)
            return s, s.particles.pose[0]

        inputs = (
            jnp.asarray(data.odometry[1:], jnp.float32),
            jnp.asarray(data.z[1:], jnp.float32),
            jnp.asarray(data.z_mask[1:]),
        )
        timed_compile(
            "scan(full)",
            lambda s: jax.lax.scan(step, s, inputs), state)


if __name__ == "__main__":
    main()
