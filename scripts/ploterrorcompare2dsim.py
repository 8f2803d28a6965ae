#!/usr/bin/env python
"""Overlay error curves from several analyzed log dirs.

Equivalent of the reference's scripts/sim/plotErrorCompare2dSim.py.

Usage::

    python scripts/ploterrorcompare2dsim.py DIR1 DIR2 ... [--save out.png]
"""

import argparse
import os

import numpy as np
import matplotlib
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdirs", nargs="+")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    if args.save:
        matplotlib.use("Agg")

    fig, axs = plt.subplots(2, 1, figsize=(9, 8), sharex=True)
    for d in args.logdirs:
        label = os.path.basename(os.path.normpath(d))
        pe = np.loadtxt(os.path.join(d, "poseEstError.dat"))
        lm = np.loadtxt(os.path.join(d, "landmarkEstError.dat"))
        axs[0].plot(pe[:, 0], pe[:, 4], label=label)
        axs[1].plot(lm[:, 0], lm[:, 3], label=label)
    axs[0].set_ylabel("position error [m]")
    axs[1].set_ylabel("map COLA error")
    axs[1].set_xlabel("time [s]")
    for a in axs:
        a.legend(fontsize=8)
    fig.tight_layout()
    if args.save:
        fig.savefig(args.save, dpi=120)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
