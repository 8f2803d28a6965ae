"""Victoria Park raw Matlab data -> reference ASCII format converter.

Equivalent of the reference's
``tools/VictoriaPark/DataConvert_Matlab_to_ASCII.m``: converts the original
Sydney Victoria Park ``.mat`` files (``aa3_lsr2.mat``, ``aa3_dr.mat``,
``aa3_gpsx.mat``) into the ASCII files the runners consume
(``measurements.dat``, ``inputs.dat``, ``gps.dat``), applying the same
transformations:

* lidar scans: low 13 bits of each uint16 beam / 100 -> meters (.m:24)
* lidar / odometry timestamps: rebased to t0 with the reference's fixed
  initial message offsets (852 ms lidar, 973 ms odometry), / 1000 (.m:9-12)
* GPS: rebased time / 1000, (Lo_m + 67, La_m + 39) rotated by -33 deg
  (.m:58-65)
* tree detections: the reference calls an external ``detectTrees`` (not
  shipped with the reference either, .m:25); here a simple range-cluster
  detector stands in — pass ``--no-detect`` to skip and convert only
  inputs/gps.

Usage::

    python scripts/dataconvert_matlab_to_ascii.py --in-dir raw/ --out-dir data/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def detect_trees(scan_m, angles, max_range=75.0, max_gap=0.5,
                 min_points=3, max_diameter=3.0):
    """Range-discontinuity cluster detector (stand-in for detectTreesI16.m).

    Groups consecutive beams whose ranges differ by < max_gap into segments;
    a segment well inside max_range with enough beams becomes a detection
    (range to center, bearing of the segment middle, diameter from the arc).
    Returns [n, 3] array of (range, bearing, diameter).
    """
    valid = scan_m < max_range
    out = []
    i = 0
    n = len(scan_m)
    while i < n:
        if not valid[i]:
            i += 1
            continue
        j = i
        while (j + 1 < n and valid[j + 1]
               and abs(scan_m[j + 1] - scan_m[j]) < max_gap):
            j += 1
        if j - i + 1 >= min_points:
            r = float(np.min(scan_m[i : j + 1]))
            brg = float(angles[(i + j) // 2])
            arc = r * (angles[j] - angles[i])
            diam = float(min(arc, max_diameter))
            if diam > 0.0:
                out.append((r + diam / 2.0, brg, diam))
        i = j + 1
    return np.asarray(out).reshape(-1, 3)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in-dir", required=True,
                    help="directory with aa3_lsr2.mat, aa3_dr.mat, aa3_gpsx.mat")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--no-detect", action="store_true",
                    help="skip tree detection / measurements.dat")
    args = ap.parse_args(argv)

    from scipy.io import loadmat

    os.makedirs(args.out_dir, exist_ok=True)

    lsr = loadmat(os.path.join(args.in_dir, "aa3_lsr2.mat"))
    dr = loadmat(os.path.join(args.in_dir, "aa3_dr.mat"))

    t_lsr = lsr["TLsr"].ravel().astype(np.float64)
    t_lsr = (t_lsr - t_lsr[0] + 852.0) / 1000.0
    t_odo = dr["time"].ravel().astype(np.float64)
    t_odo = (t_odo - t_odo[0] + 973.0) / 1000.0
    speed = dr["speed"].ravel().astype(np.float64)
    steering = dr["steering"].ravel().astype(np.float64)

    with open(os.path.join(args.out_dir, "inputs.dat"), "w") as f:
        for row in zip(t_odo, speed, steering):
            f.write("%10.3f %10.3f %10.4f\n" % row)
    print(f"inputs.dat: {len(t_odo)} rows")

    if not args.no_detect:
        laser = lsr["LASER"]
        scans = (laser.astype(np.uint16) & np.uint16((1 << 13) - 1))
        scans = scans.astype(np.float64) / 100.0
        angles = np.arange(361) * np.pi / 360.0   # AAr, .m:17
        n_det = 0
        with open(os.path.join(args.out_dir, "measurements.dat"), "w") as f:
            for k in range(scans.shape[0]):
                for r, b, d in detect_trees(scans[k], angles):
                    f.write("%10.3f %10.5f %10.5f %10.5f\n"
                            % (t_lsr[k], r, b, d))
                    n_det += 1
        print(f"measurements.dat: {n_det} detections "
              f"from {scans.shape[0]} scans")

    gps_path = os.path.join(args.in_dir, "aa3_gpsx.mat")
    if os.path.exists(gps_path):
        g = loadmat(gps_path)
        t_gps = g["timeGps"].ravel().astype(np.float64)
        t_gps = (t_gps - t_gps[0]) / 1000.0
        lo = g["Lo_m"].ravel().astype(np.float64) + 67.0
        la = g["La_m"].ravel().astype(np.float64) + 39.0
        a = -33.0 / 180.0 * np.pi
        x = np.cos(a) * lo - np.sin(a) * la
        y = np.sin(a) * lo + np.cos(a) * la
        with open(os.path.join(args.out_dir, "gps.dat"), "w") as f:
            for row in zip(t_gps, x, y):
                f.write("%10.3f %10.3f %10.3f\n" % row)
        print(f"gps.dat: {len(t_gps)} fixes")


if __name__ == "__main__":
    main()
