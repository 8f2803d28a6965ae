"""Bisect the update-body compile blowup: compile update with phases disabled.

Usage: python scripts/compile_bisect.py VARIANT
Variants: noimp nomerge nonew noresample noekf bare full
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402

from rfs_slam_tpu.filters import rbphd  # noqa: E402
from rfs_slam_tpu.ops import gm as gm_ops  # noqa: E402


def main():
    variant = sys.argv[1]
    sim_cfg, data, filt = bench.build()
    state = filt.init_state(jax.random.PRNGKey(0), jnp.zeros(3))
    z = jnp.asarray(data.z[1], jnp.float32)
    z_mask = jnp.asarray(data.z_mask[1])

    if variant == "noimp":
        filt._importance_weights = (
            lambda log_w, pose, gm, z, z_mask, clutter_z, nZ, meas=None: log_w
        )
    elif variant == "nomerge":
        gm_ops.merge = lambda gm, t, f, **kw: gm
    elif variant == "nonew":
        # keep the EKF + weight table but skip the top-k compaction/append
        orig_append = gm_ops.append
        gm_ops.append = lambda gm, m, c, w, a, capacity=None: gm
    elif variant == "noresample":
        from rfs_slam_tpu.ops import resample as rs
        rs.maybe_resample = lambda key, log_w, t, allow=True, force=False: (
            jnp.arange(log_w.shape[0], dtype=jnp.int32), log_w,
            jnp.asarray(False))
    elif variant == "minimal":
        # only EKF + weight table: stub everything downstream
        gm_ops.merge = lambda gm, t, f, **kw: gm
        gm_ops.append = lambda gm, m, c, w, a, capacity=None: gm
        filt._importance_weights = (
            lambda log_w, pose, gm, z, z_mask, clutter_z, nZ, meas=None: log_w
        )

    fn = lambda s: filt.update(s, z, z_mask)
    t0 = time.time()
    jaxpr = jax.make_jaxpr(fn)(state)
    t_trace = time.time() - t0
    n_eqns = len(jaxpr.jaxpr.eqns)
    t0 = time.time()
    lowered = jax.jit(fn).lower(state)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    print(f"update[{variant}] trace {t_trace:.2f}s ({n_eqns} eqns) "
          f"lower {t_lower:.2f}s compile {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
