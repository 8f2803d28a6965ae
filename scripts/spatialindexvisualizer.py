"""Visualize the grid spatial index: cell occupancy + indexed points.

Equivalent of the reference's
``scripts/componentTesting/spatialIndexTreeTestVisualizer.py`` (which draws
the exported quadtree boxes): renders the grid-index cells colored by
occupancy with the indexed points overlaid, from either a fresh random
population (default, mirroring the spatialIndexTree example) or a saved
ASCII export produced by ``rfs_slam_tpu.examples.spatial_index``.

Usage::

    python scripts/spatialindexvisualizer.py [--out tree.png] [--n 200]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=200, help="points to index")
    ap.add_argument("--res", type=int, default=8, help="grid resolution")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="spatialIndex.png")
    args = ap.parse_args(argv)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; printing ASCII occupancy instead")
        from rfs_slam_tpu.examples import spatial_index
        spatial_index.main(n_points=args.n, res=args.res, seed=args.seed)
        return

    rng = np.random.default_rng(args.seed)
    pts = rng.uniform(0.0, float(args.res), size=(args.n, 2))
    counts = np.zeros((args.res, args.res), int)
    for i, j in np.clip(pts.astype(int), 0, args.res - 1):
        counts[i, j] += 1

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(counts.T, origin="lower", cmap="Blues",
              extent=(0, args.res, 0, args.res))
    ax.scatter(pts[:, 0], pts[:, 1], s=6, c="k")
    ax.set_xticks(range(args.res + 1))
    ax.set_yticks(range(args.res + 1))
    ax.grid(True, lw=0.3)
    ax.set_title(f"grid spatial index — {args.n} points, "
                 f"{args.res}x{args.res} cells")
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
