#!/usr/bin/env python
"""Plot pose / dead-reckoning / map error curves from an analyzed log dir.

Equivalent of the reference's scripts/sim/plotError2dSim.py; reads the
outputs of ``python -m rfs_slam_tpu.apps.analysis2dsim LOGDIR``
(poseEstError.dat, deadReckoningError.dat, landmarkEstError.dat —
analysis2dSim.cpp:388-418).

Usage::

    python scripts/ploterror2dsim.py LOGDIR [--save out.png]
"""

import argparse
import os

import numpy as np
import matplotlib
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    d = args.logdir
    if args.save:
        matplotlib.use("Agg")

    pe = np.loadtxt(os.path.join(d, "poseEstError.dat"))
    dr = np.loadtxt(os.path.join(d, "deadReckoningError.dat"))
    lm = np.loadtxt(os.path.join(d, "landmarkEstError.dat"))

    fig, axs = plt.subplots(3, 1, figsize=(9, 10), sharex=True)
    axs[0].plot(pe[:, 0], pe[:, 4], label="estimate")
    axs[0].plot(dr[:, 0], dr[:, 4], label="dead reckoning", alpha=0.6)
    axs[0].set_ylabel("position error [m]")
    axs[0].legend()

    axs[1].plot(pe[:, 0], np.abs(pe[:, 3]), label="estimate")
    axs[1].plot(dr[:, 0], np.abs(dr[:, 3]), label="dead reckoning", alpha=0.6)
    axs[1].set_ylabel("|rotation error| [rad]")
    axs[1].legend()

    axs[2].plot(lm[:, 0], lm[:, 3], label="map COLA error")
    axs[2].plot(lm[:, 0], lm[:, 1], "k--", lw=0.8, label="observable landmarks")
    axs[2].plot(lm[:, 0], lm[:, 2], "g:", lw=0.8, label="cardinality estimate")
    axs[2].set_ylabel("map error / cardinality")
    axs[2].set_xlabel("time [s]")
    axs[2].legend()

    fig.tight_layout()
    if args.save:
        fig.savefig(args.save, dpi=120)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
