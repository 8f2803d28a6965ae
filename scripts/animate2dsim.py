#!/usr/bin/env python
"""Animate a 2-D sim log directory (particles, best-particle GM ellipses,
measurements) and optionally export mp4.

Equivalent of the reference's scripts/sim/animate2dSim.py, consuming the
same .dat formats (rbphdslam2dSim.cpp:369-441, 609-641).

Usage::

    python scripts/animate2dsim.py LOGDIR [--save out.mp4] [--stride N]
"""

import argparse
import os

import numpy as np
import matplotlib
import matplotlib.pyplot as plt
from matplotlib import animation
from matplotlib.patches import Ellipse


def group_by_time(arr):
    out = {}
    for r in arr:
        out.setdefault(round(float(r[0]), 6), []).append(r)
    return {k: np.asarray(v) for k, v in out.items()}


def cov_ellipse(x, y, sxx, sxy, syy, nsig=2.0, **kw):
    cov = np.array([[sxx, sxy], [sxy, syy]])
    vals, vecs = np.linalg.eigh(cov)
    ang = np.degrees(np.arctan2(vecs[1, 1], vecs[0, 1]))
    w, h = 2 * nsig * np.sqrt(np.maximum(vals, 0))
    return Ellipse((x, y), h, w, angle=ang, fill=False, **kw)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir")
    ap.add_argument("--save", default=None, help="output mp4/gif path")
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--fps", type=int, default=20)
    args = ap.parse_args()
    d = args.logdir

    gt = np.loadtxt(os.path.join(d, "gtPose.dat"))
    gtl = np.loadtxt(os.path.join(d, "gtLandmark.dat"))
    pp = group_by_time(np.loadtxt(os.path.join(d, "particlePose.dat")))
    le = group_by_time(np.loadtxt(os.path.join(d, "landmarkEst.dat")))
    meas_path = os.path.join(d, "measurement.dat")
    zz = group_by_time(np.loadtxt(meas_path)) if os.path.exists(meas_path) else {}

    times = sorted(t for t in pp if t > 0)[:: args.stride]
    if args.save:
        matplotlib.use("Agg")

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.set_aspect("equal")
    pad = 1.0
    ax.set_xlim(gt[:, 1].min() - pad, gt[:, 1].max() + pad)
    ax.set_ylim(gt[:, 2].min() - pad, gt[:, 2].max() + pad)
    ax.plot(gt[:, 1], gt[:, 2], "k-", lw=0.5, label="ground truth")
    ax.scatter(gtl[:, 0], gtl[:, 1], marker="+", c="k", label="landmarks")
    particles = ax.scatter([], [], s=4, c="tab:blue", label="particles")
    (best_trace,) = ax.plot([], [], "r-", lw=1, label="best particle")
    title = ax.set_title("")
    ax.legend(loc="upper right", fontsize=8)

    ell_artists = []
    best_hist = []

    def update(t):
        for e in ell_artists:
            e.remove()
        ell_artists.clear()
        rows = pp[t]
        particles.set_offsets(rows[:, 2:4])
        i_hi = int(rows[np.argmax(rows[:, 5]), 1])
        best = rows[rows[:, 1] == i_hi][0]
        best_hist.append(best[2:4])
        bh = np.asarray(best_hist)
        best_trace.set_data(bh[:, 0], bh[:, 1])
        for r in le.get(t, []):
            if int(r[1]) == i_hi and r[7] >= 0.5:
                e = cov_ellipse(r[2], r[3], r[4], r[5], r[6],
                                color="tab:green", lw=0.8, alpha=0.8)
                ax.add_patch(e)
                ell_artists.append(e)
        title.set_text(f"t = {t:.1f}s  map = "
                       f"{sum(1 for r in le.get(t, []) if int(r[1]) == i_hi)}")
        return [particles, best_trace, title, *ell_artists]

    ani = animation.FuncAnimation(fig, update, frames=times,
                                  interval=1000 // args.fps, blit=False)
    if args.save:
        ani.save(args.save, fps=args.fps)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
