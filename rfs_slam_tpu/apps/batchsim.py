"""batchsim — parameter-sweep regression harness.

Equivalent of the reference's ``scripts/batchSim/batchSim_*.bash``
(batchSim_rbphdslam.bash:9-40): sweep P_D x clutter x seeds on the 2-D sim,
run the filter + analysis per combo, and append the FINAL pose / map errors
to a results file (the de-facto regression suite, SURVEY.md section 4).

Fixed shapes make the sweep cheap on TPU: every combo reuses the same
compiled whole-run scan (P_D / clutter / seed are runtime values, not trace
constants).

Usage::

    python -m rfs_slam_tpu.apps.batchsim --cfg cfg/rbphdslam2dSim.xml \
        --filter rbphd --pd 0.99 0.9 0.75 --clutter 1e-4 1e-3 \
        --seeds 3 --steps 500 --out results_rbphd.dat
"""

from __future__ import annotations

import argparse
import dataclasses
import time

from rfs_slam_tpu.utils import cache

cache.enable()

import numpy as np

from rfs_slam_tpu.io import sim2d
from rfs_slam_tpu.io.xmlconfig import XmlConfig, load_sim2d


def run_one(filter_kind, cfg, sim_cfg, traj_seed, noise_seed, z_capacity,
            n_particles):
    data = sim2d.generate(sim_cfg, traj_seed=traj_seed, noise_seed=noise_seed,
                          z_capacity=z_capacity)
    if filter_kind == "rbphd":
        from rfs_slam_tpu.apps import rbphdslam2dsim as app
    else:
        from rfs_slam_tpu.apps import fastslam2dsim as app
    filt = app.build_filter_from_xml(cfg, sim_cfg, z_capacity=z_capacity,
                                     n_particles=n_particles)
    _, outs, wall = app.run(filt, sim_cfg, data)
    poses, weights, best = outs[0], outs[1], outs[2]
    T = sim_cfg.timesteps
    # final-quarter errors (the reference batch scripts record the tail)
    k0 = (3 * (T - 1)) // 4
    best_pose = poses[np.arange(T - 1), best]
    err = np.linalg.norm(best_pose[k0:, :2] - data.gt_pose[1 + k0:, :2],
                         axis=1)
    return float(np.mean(err)), float(err[-1]), wall


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--filter", choices=["rbphd", "fastslam"], default="rbphd")
    ap.add_argument("--pd", type=float, nargs="+",
                    default=[0.99, 0.95, 0.9, 0.75, 0.5])
    ap.add_argument("--clutter", type=float, nargs="+",
                    default=[1e-4, 1e-3, 1e-2])
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--particles", type=int, default=None)
    ap.add_argument("--out", default="batchResults.dat")
    args = ap.parse_args(argv)

    cfg = XmlConfig(args.cfg)
    base = load_sim2d(cfg)
    if args.steps:
        base = dataclasses.replace(base, timesteps=args.steps)
    zc = 48

    n = 0
    with open(args.out, "a") as f:
        f.write(f"# filter={args.filter} cfg={args.cfg} "
                f"steps={base.timesteps}\n")
        f.write("# pd  clutter  seed  meanTailErr  finalErr  wall_s\n")
        for pd in args.pd:
            for clutter in args.clutter:
                sim_cfg = dataclasses.replace(base, pd=pd, clutter=clutter)
                for seed in range(args.seeds):
                    t0 = time.time()
                    try:
                        mean_err, final_err, wall = run_one(
                            args.filter, cfg, sim_cfg, traj_seed=seed,
                            noise_seed=seed + 1, z_capacity=zc,
                            n_particles=args.particles)
                    except Exception as e:  # noqa: BLE001
                        # the tunneled TPU worker can hand the FIRST request
                        # after a crash an inherited UNAVAILABLE; retry once
                        print(f"retrying after {type(e).__name__}: {e}",
                              flush=True)
                        time.sleep(20)
                        mean_err, final_err, wall = run_one(
                            args.filter, cfg, sim_cfg, traj_seed=seed,
                            noise_seed=seed + 1, z_capacity=zc,
                            n_particles=args.particles)
                    f.write(f"{pd:.4f}  {clutter:.6g}  {seed}  "
                            f"{mean_err:.6f}  {final_err:.6f}  {wall:.2f}\n")
                    f.flush()
                    n += 1
                    print(f"[{n}] pd={pd} clutter={clutter} seed={seed}: "
                          f"tail err {mean_err:.3f} m "
                          f"({time.time() - t0:.1f}s)")
    print(f"results -> {args.out}")


if __name__ == "__main__":
    main()
