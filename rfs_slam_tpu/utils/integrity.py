"""Map-integrity self-check — the reference's debug sanity pass.

Reference: ``RBPHDFilter::checkMapIntegrity`` (RBPHDFilter.hpp:1087-1150)
scans every particle's Gaussian mixture for NaN means/covariances and for a
non-positive quadratic form 1^T S 1 (a cheap positive-definiteness probe).
Here the scan is one batched masked reduction over the plane-major map SoA;
it is a debug tool, not part of the jitted hot path (the release path keeps
planes finite by construction — see models/measurement.py and ops/ekf.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from rfs_slam_tpu.core.state import GMState


def check_map_integrity(gm: GMState, weights_are_log_odds: bool = False):
    """Return (ok, report) for the alive Gaussians of every particle.

    ``report`` maps failure kind -> number of offending (particle, slot)
    pairs: non-finite mean, non-finite covariance, non-positive 1^T S 1
    (RBPHDFilter.hpp:1126-1135), and (for PHD maps) negative weight.
    """
    alive = gm.alive
    d = gm.dim

    mean_bad = jnp.any(~jnp.isfinite(gm.mean), axis=0) & alive
    cov_bad = jnp.any(~jnp.isfinite(gm.cov), axis=0) & alive

    # ones^T S ones = sum of all matrix entries (off-diagonals twice)
    from rfs_slam_tpu.core import planar

    quad = jnp.zeros_like(gm.w)
    for i in range(d):
        for j in range(i, d):
            v = gm.cov[planar.tri_index(i, j, d)]
            quad = quad + (v if i == j else 2.0 * v)
    psd_bad = (quad <= 0.0) & alive & ~cov_bad

    # w != w is an explicit failure in the reference check
    # (RBPHDFilter.hpp:1087-1150); `w < 0` alone would let NaN through.
    w_nonfinite = (~jnp.isfinite(gm.w)) & alive
    w_bad = jnp.zeros_like(alive)
    if not weights_are_log_odds:
        w_bad = (gm.w < 0.0) & alive & ~w_nonfinite

    report = {
        "mean_nonfinite": int(jnp.sum(mean_bad)),
        "cov_nonfinite": int(jnp.sum(cov_bad)),
        "cov_nonpositive": int(jnp.sum(psd_bad)),
        "weight_nonfinite": int(jnp.sum(w_nonfinite)),
        "weight_negative": int(jnp.sum(w_bad)),
    }
    ok = not any(report.values())
    return ok, report
