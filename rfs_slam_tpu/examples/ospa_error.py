"""OSPA metric on hand-made point sets.

Equivalent of the reference's ``ospaError`` example
(src/examples/ospaError.cpp:30-167): compute the OSPA distance (and the
COLA rescaling) between two small 2-D point sets, showing the localization
vs cardinality split for (a) identical sets, (b) a perturbed set, (c) a
set with a missing point, at the analysis defaults cutoff c=0.2, order p=1
(analysis2dSim.cpp:229-249).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from rfs_slam_tpu.ops.ospa import ospa


def _run(name, x, y, c=0.2, p=1.0, verbose=True):
    nx, ny = len(x), len(y)
    n = nx + ny
    xp = np.zeros((n, 2))
    yp = np.zeros((n, 2))
    xp[:nx] = x
    yp[:ny] = y
    xm = np.arange(n) < nx
    ym = np.arange(n) < ny
    err = ospa(jnp.asarray(xp), jnp.asarray(xm), jnp.asarray(yp),
               jnp.asarray(ym), cutoff=c, order=p)
    if verbose:
        print(f"{name}: |X|={nx} |Y|={ny}  OSPA={float(err.ospa):.4f}  "
              f"COLA={float(err.cola):.4f}  loc={float(err.loc):.4f}  "
              f"card={float(err.card):.4f}")
    return err


def main(verbose: bool = True):
    rng = np.random.default_rng(5)
    x = rng.uniform(-1.0, 1.0, size=(5, 2))

    e0 = _run("identical sets   ", x, x.copy(), verbose=verbose)
    assert float(e0.ospa) < 1e-5  # f32 Hungarian noise on identical sets

    y = x + rng.normal(scale=0.02, size=x.shape)
    e1 = _run("perturbed set    ", x, y, verbose=verbose)
    assert 1e-5 < float(e1.ospa) < 0.2

    e2 = _run("one point missing", x, x[:-1], verbose=verbose)
    assert float(e2.card) > 0.1
    return e0, e1, e2


if __name__ == "__main__":
    main()
