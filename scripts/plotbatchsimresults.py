#!/usr/bin/env python
"""Plot batchsim sweep results (mean tail error vs P_D, one line per
clutter level, errorbars over seeds).

Equivalent of the reference's scripts/batchSim/plotBatchSimResults.py,
reading the results file of ``python -m rfs_slam_tpu.apps.batchsim``.

Usage::

    python scripts/plotbatchsimresults.py RESULTS.dat [--save out.png]
"""

import argparse

import numpy as np
import matplotlib
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("results")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    if args.save:
        matplotlib.use("Agg")

    rows = np.loadtxt(args.results, comments="#")
    if rows.ndim == 1:
        rows = rows[None, :]
    pds = np.unique(rows[:, 0])[::-1]
    clutters = np.unique(rows[:, 1])

    fig, ax = plt.subplots(figsize=(8, 5))
    for c in clutters:
        means, stds = [], []
        for pd in pds:
            sel = rows[(rows[:, 0] == pd) & (rows[:, 1] == c)][:, 3]
            means.append(sel.mean())
            stds.append(sel.std())
        ax.errorbar(pds, means, yerr=stds, marker="o", capsize=3,
                    label=f"clutter {c:g}")
    ax.set_xlabel("probability of detection")
    ax.set_ylabel("mean tail position error [m]")
    ax.invert_xaxis()
    ax.legend()
    fig.tight_layout()
    if args.save:
        fig.savefig(args.save, dpi=120)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
