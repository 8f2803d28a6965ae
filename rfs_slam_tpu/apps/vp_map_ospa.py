"""vp_map_ospa — OSPA/COLA map-error figures for Victoria Park runs.

The Victoria Park dataset ships no ground-truth tree map, so absolute map
error cannot be scored the way ``analysis2dsim`` scores the simulations
(reference: analysis2dSim.cpp:182-247, COLA c=0.2 p=1 against known
landmarks).  What CAN be scored, mirroring that machinery:

* **cross-filter consistency**: OSPA/COLA between the final best-particle
  maps of two runs (e.g. RB-PHD vs FastSLAM, or two seeds of one filter) —
  landmarks that are real trees should be found by both;
* **cardinality**: number of map landmarks above the weight threshold.

Usage::

    python -m rfs_slam_tpu.apps.vp_map_ospa A/landmarkEst.dat B/landmarkEst.dat \
        [--cutoff 5.0] [--order 1] [--min-weight 0.75] [--log-odds-a/-b]

Reads the reference-format ``landmarkEst.dat`` (t, i, x, y, Sxx, Sxy, Syy, w
— rbphdslam2dSim.cpp:635-638), takes the LAST timestep's landmark set per
file, and prints OSPA (total, localization, cardinality components) and COLA.
"""

from __future__ import annotations

import argparse

import numpy as np


def load_final_map(path: str, min_weight: float, log_odds: bool):
    """Final-timestep landmark positions with weight above threshold."""
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    t_final = rows[:, 0].max()
    final = rows[np.abs(rows[:, 0] - t_final) < 1e-9]
    w = final[:, 7]
    if log_odds:
        # FastSLAM logs log-odds existence weights; threshold on P(exist)
        w = 1.0 / (1.0 + np.exp(-w))
    return final[w >= min_weight, 2:4]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("map_a")
    ap.add_argument("map_b")
    ap.add_argument("--cutoff", type=float, default=5.0,
                    help="OSPA cutoff c in metres (trees; sim analysis uses "
                         "0.2 for point landmarks, analysis2dSim.cpp:238)")
    ap.add_argument("--order", type=float, default=1.0)
    ap.add_argument("--min-weight", type=float, default=0.75,
                    help="landmark weight threshold (analysis2dSim.cpp:182)")
    ap.add_argument("--log-odds-a", action="store_true",
                    help="map A weights are log-odds (FastSLAM logs)")
    ap.add_argument("--log-odds-b", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from rfs_slam_tpu.ops.ospa import ospa

    a = load_final_map(args.map_a, args.min_weight, args.log_odds_a)
    b = load_final_map(args.map_b, args.min_weight, args.log_odds_b)
    print(f"map A: {len(a)} landmarks (>= {args.min_weight}), "
          f"map B: {len(b)}")
    err = ospa(jnp.asarray(a, jnp.float32), jnp.ones((len(a),), bool),
               jnp.asarray(b, jnp.float32), jnp.ones((len(b),), bool),
               cutoff=args.cutoff, order=args.order)
    print(f"OSPA(c={args.cutoff}, p={args.order}): {float(err.ospa):.3f} m "
          f"(loc sum {float(err.loc):.2f}, card sum {float(err.card):.2f})")
    print(f"COLA: {float(err.cola):.3f}")


if __name__ == "__main__":
    main()
