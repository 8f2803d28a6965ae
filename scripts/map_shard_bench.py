"""Landmark-axis (map-block) sharding: measure it, don't just assert it.

SURVEY §2.8 row 4: for very large per-particle maps the landmark axis can be
sharded across devices (2-D particles x map mesh).  This script measures the
full RB-PHD step on the virtual CPU mesh at a large map capacity under

* a pure particle-axis mesh (n, 1), and
* particles x map meshes (n/2, 2), (n/4, 4),

and counts the collectives XLA inserts for the cross-M reductions (weight
table column sums, top-k compactions, merge) by grepping the compiled HLO.

Run: JAX_PLATFORMS=cpu python scripts/map_shard_bench.py [--map 2048]
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        + " --xla_backend_optimization_level=0"
        + " --xla_llvm_disable_expensive_passes=true"
    ).strip()

from rfs_slam_tpu.utils import cache  # noqa: E402

cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from rfs_slam_tpu.parallel import mesh as mesh_lib  # noqa: E402

COLLECTIVES = ("all-gather", "all-reduce", "collective-permute",
               "all-to-all", "reduce-scatter")


def bench_mesh(p_shards: int, m_shards: int, n_particles: int, map_cap: int,
               steps: int, devices):
    filt = ge._build(n_particles=n_particles, map_capacity=map_cap,
                     z_capacity=8, new_capacity=32, eval_capacity=8,
                     z_dp_max=6)
    with jax.default_device(devices[0]):
        state, odo, z, z_mask = ge._example_inputs(filt, jax.random.PRNGKey(0))
        if m_shards == 1:
            mesh = mesh_lib.make_mesh(p_shards,
                                      devices=devices[:p_shards])
            shardings = mesh_lib.state_shardings(state, mesh, n_particles)
            repl = mesh_lib.replicated(mesh)
        else:
            mesh = mesh_lib.make_mesh_2d(p_shards, m_shards,
                                         devices=devices[:p_shards * m_shards])
            shardings = mesh_lib.state_shardings_2d(state, mesh, n_particles,
                                                    map_cap)
            repl = jax.sharding.NamedSharding(mesh,
                                              jax.sharding.PartitionSpec())
        state = jax.tree_util.tree_map(jax.device_put, state, shardings)
        odo, z, z_mask = jax.device_put((odo, z, z_mask), repl)

        def step(s, _):
            s = filt.predict(s, odo, 0.1)
            return filt.update(s, z, z_mask), None

        def run(s):
            return jax.lax.scan(step, s, None, length=steps)[0]

        lowered = jax.jit(run).lower(state)
        compiled = lowered.compile()
        txt = compiled.as_text()
        counts = {c: len(re.findall(c, txt)) for c in COLLECTIVES}

        out = compiled(state)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = compiled(state)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
    return best / steps, counts


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--map", type=int, default=2048)
    ap.add_argument("--particles", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="map_shard_results.dat")
    args = ap.parse_args()

    devices = jax.devices("cpu")
    rows = []
    for p_sh, m_sh in [(8, 1), (4, 2), (2, 4)]:
        dt, counts = bench_mesh(p_sh, m_sh, args.particles, args.map,
                                args.steps, devices)
        cstr = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        rows.append((p_sh, m_sh, dt, cstr))
        print(f"mesh ({p_sh} particles x {m_sh} map): {dt*1e3:9.2f} ms/step   "
              f"collectives: {cstr or 'none'}", flush=True)

    with open(args.out, "w") as f:
        f.write(f"# P={args.particles} M={args.map} steps={args.steps} "
                f"(virtual CPU mesh)\n# p_shards m_shards ms_per_step "
                f"collectives\n")
        for p_sh, m_sh, dt, cstr in rows:
            f.write(f"{p_sh}  {m_sh}  {dt*1e3:.3f}  {cstr}\n")
    print(f"results -> {args.out}")


if __name__ == "__main__":
    main()
