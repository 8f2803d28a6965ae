"""Benchmark: RB-PHD SLAM, reference rbphdslam2dSim workload, on TPU.

Workload anchors (BASELINE.md): 3000 timesteps, 200 particles, 50 landmarks,
P_D 0.99, clutter 1e-4 (cfg/rbphdslam2dSim.xml).  The metric is filter
timesteps/second for the full pipeline (predict + births + batched EKF map
update + importance weighting with the exact RFS likelihood + merge + prune +
ESS-gated resampling), steady-state (post-compile), whole-run scan on device.

``vs_baseline`` compares against the OpenMP C++ baseline measured on this
host by ``native/baseline`` (same workload, same phases, double precision,
all cores — the reference's own parallelization model, CMakeLists.txt:38-46).
If the native baseline binary hasn't been built/run yet, a stored measurement
is used (see native/README.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

from rfs_slam_tpu.utils import cache

cache.enable()
# NOTE: no warm_transfers() here.  The tunneled TPU's FIRST device-to-host
# fetch in a process costs 100-1300 s cold, and the relay channel serializes:
# a warm-up D2H started at import makes every timed dispatch queue behind it
# (that is exactly how BENCH_r02 recorded compile_s 930 s).  Execution and
# host-to-device transfers do NOT pay this cost (measured: tiny compile+exec
# 1.5 s while the first D2H took 69 s in the same cold process), so the bench
# keeps all D2H strictly out of the timed path and pays the one cold fetch at
# the end, reported separately as first_d2h_s.

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rfs_slam_tpu.filters.rbphd import RBPHDConfig, RBPHDFilter  # noqa: E402
from rfs_slam_tpu.io import sim2d  # noqa: E402
from rfs_slam_tpu.models.motion import Odometry2D, StaticLandmark  # noqa: E402
from rfs_slam_tpu.models.measurement import RangeBearing  # noqa: E402
from rfs_slam_tpu.ops.ekf import InnovationGates  # noqa: E402

N_PARTICLES = 200
T = 3000
Z_CAPACITY = 40
MAP_CAPACITY = 128


def build():
    sim_cfg = sim2d.Sim2DConfig()  # the rbphdslam2dSim.xml defaults
    data = sim2d.generate(sim_cfg, traj_seed=1, noise_seed=1,
                          z_capacity=Z_CAPACITY)
    dt = sim_cfg.dt
    motion = Odometry2D(
        Q=np.diag(np.asarray([sim_cfg.vardx, sim_cfg.vardy, sim_cfg.vardz]))
        * (1.5 * dt * dt)
    )
    lmk = StaticLandmark(
        Q=np.diag(np.asarray([sim_cfg.varlmx, sim_cfg.varlmy])) * dt * dt
    )
    meas = RangeBearing(
        R=np.diag(np.asarray([sim_cfg.varzr, sim_cfg.varzb])) * 10.0,
        pd_const=sim_cfg.pd, clutter=sim_cfg.clutter,
        r_max=sim_cfg.range_max, r_min=sim_cfg.range_min,
        r_buf=sim_cfg.range_buffer,
    )
    gates = InnovationGates.range_bearing(range_t=1.0, bearing_t=0.2)
    cfg = RBPHDConfig(
        n_particles=N_PARTICLES, map_capacity=MAP_CAPACITY,
        z_capacity=Z_CAPACITY, new_capacity=48, new_per_z=8, birth_capacity=16,
        eval_capacity=15, z_dp_max=10,
        birth_gaussian_weight=0.01, new_gaussian_md_threshold=3.0,
        eval_pt_min_weight=0.75, weighting_md_threshold=3.0,
        merge_threshold=0.5, merge_inflation=1.5, prune_threshold=0.01,
        min_updates_before_resample=2, ess_threshold=100.0,
    )
    filt = RBPHDFilter(motion, lmk, meas, gates, cfg)
    return sim_cfg, data, filt


def _cold_d2h_with_liveness(log_every_s: float = 60.0,
                            give_up_s: float = 2400.0) -> float:
    """First device-to-host fetch with liveness logging.

    The tunnel's one-time cold D2H ranges 33-1300 s on this host; a silent
    multi-minute block is indistinguishable from a hang to the driver.  Run
    the fetch on a daemon thread, print a status line to stderr every
    ``log_every_s`` while it is in flight, and give up (returning the elapsed
    time, fetch still pending) after ``give_up_s`` — later timed sections
    will then absorb the remainder, which the detail output makes visible.
    """
    import threading

    done = threading.Event()
    t0 = time.time()

    def fetch():
        np.asarray(jnp.zeros((1,), jnp.float32) + 1.0)
        done.set()

    th = threading.Thread(target=fetch, daemon=True)
    th.start()
    while not done.wait(timeout=log_every_s):
        waited = time.time() - t0
        print(f"bench: cold first D2H still in flight after {waited:.0f}s "
              f"(tunnel constant, measured range 33-1300s)", file=sys.stderr,
              flush=True)
        if waited > give_up_s:
            print("bench: giving up waiting for cold D2H; proceeding "
                  "(remainder will surface in first_run_s)", file=sys.stderr,
                  flush=True)
            break
    return time.time() - t0


def run_tpu(sim_cfg, data, filt):
    state = filt.init_state(jax.random.PRNGKey(0), jnp.zeros(3))

    def step(state, inp):
        odo, z, z_mask, gt, lock = inp
        state = filt.predict(state, odo, sim_cfg.dt)
        pose = jnp.where(
            lock, jnp.broadcast_to(gt, state.particles.pose.shape),
            state.particles.pose,
        )
        state = state.replace(particles=state.particles.replace(pose=pose))
        state = filt.update(state, z, z_mask)
        best = jnp.argmax(state.particles.log_w)
        return state, state.particles.pose[best]

    inputs = (
        jnp.asarray(data.odometry[1:], jnp.float32),
        jnp.asarray(data.z[1:], jnp.float32),
        jnp.asarray(data.z_mask[1:]),
        jnp.asarray(data.gt_pose[1:], jnp.float32),
        jnp.arange(1, T) <= 100,
    )

    def run(state, inputs):
        return jax.lax.scan(step, state, inputs)

    # True XLA compile time (persistent cache makes reruns a disk hit).
    t0 = time.time()
    compiled = jax.jit(run).lower(state, inputs).compile()
    compile_s = time.time() - t0

    # Pay the relay's one-time cold device-to-host cost NOW, on a trivial
    # fetch, so it cannot contaminate any timed section below.  This cost is
    # an environment constant of this host's TPU tunnel (measured 33-1300 s),
    # not a property of the compiled program.  The fetch runs on a worker
    # thread with liveness logging to stderr: on a bad tunnel day the bench
    # degrades to a logged wait instead of an apparent hang.
    t0 = time.time()
    first_d2h_s = _cold_d2h_with_liveness()

    def timed_run(s):
        """Run + hard sync.  block_until_ready does not reliably block on
        this relay backend for AOT-dispatched executables, so the sync is a
        small fetch of an output leaf (milliseconds on the warm channel)."""
        t0 = time.time()
        out = compiled(s, inputs)
        np.asarray(out[0].particles.log_w)
        return time.time() - t0, out

    def run_err(out):
        best_poses = np.asarray(out[1])
        err = np.linalg.norm(best_poses[:, :2] - data.gt_pose[1:, :2], axis=1)
        return float(np.median(err[150:]))

    first_run_s, out = timed_run(state)
    errs = [run_err(out)]

    # ---- second, DETERMINISTIC accuracy gate: replay the committed C++
    # baseline dump (data/bl_dump, written by `native/baseline --dump`)
    # through the same compiled executable (identical shapes, zero extra
    # compile).  Fixed data + fixed PRNGKey(0) makes this nearly noise-free
    # (operating point ~0.059 m vs the C++ double baseline's 0.574 m on the
    # same data, RESULTS.md), unlike the 4-seed median below, whose run-level
    # spread is ~0.05-0.17 m on this chaotic resampling workload.
    id_gt, id_inputs = load_identical_data()
    t0 = time.time()
    id_out = compiled(filt.init_state(jax.random.PRNGKey(0), jnp.zeros(3)),
                      id_inputs)
    id_best = np.asarray(id_out[1])
    identical_s = time.time() - t0
    id_err = np.linalg.norm(id_best[:, :2] - id_gt[1:, :2], axis=1)
    identical_err = float(np.median(id_err[150:]))

    # 3 more timed runs with DIFFERENT filter init seeds: the accuracy
    # metric is the median over the 4 runs.  A single-seed median pose
    # error on this chaotic resampling workload spans ~0.05-0.17 m across
    # seeds (measured round 4, 6-seed study) and moves under 1-ulp
    # arithmetic changes; gating a single draw made the gate a coin flip.
    times = []
    for seed in range(2, 5):
        s2 = filt.init_state(jax.random.PRNGKey(seed), jnp.zeros(3))
        dt_, out = timed_run(s2)
        times.append(dt_)
        errs.append(run_err(out))
    best_t = min(times)

    return {
        "timesteps_per_sec": (T - 1) / best_t,
        "wall_s": best_t,
        "compile_s": compile_s,
        "first_run_s": first_run_s,
        "first_d2h_s": first_d2h_s,
        "median_pose_err_m": float(np.median(errs)),
        "pose_err_runs_m": [round(e, 4) for e in errs],
        "identical_data_err_m": identical_err,
        "identical_data_s": identical_s,
    }


def load_identical_data():
    """The committed C++ baseline dump as bench-shaped scan inputs."""
    here = os.path.dirname(os.path.abspath(__file__))
    d = os.path.join(here, "native", "bl_dump")
    go = np.loadtxt(os.path.join(d, "gt_odo.txt"))
    gt, odo = go[:, :3], go[:, 3:]
    z = np.zeros((T, Z_CAPACITY, 2), np.float32)
    z_mask = np.zeros((T, Z_CAPACITY), bool)
    counts = np.zeros(T, np.int32)
    for k, r, b in np.loadtxt(os.path.join(d, "z.txt")):
        k = int(k)
        if counts[k] < Z_CAPACITY:
            z[k, counts[k]] = (r, b)
            z_mask[k, counts[k]] = True
            counts[k] += 1
    inputs = (
        jnp.asarray(odo[1:], jnp.float32),
        jnp.asarray(z[1:]),
        jnp.asarray(z_mask[1:]),
        jnp.asarray(gt[1:], jnp.float32),
        jnp.arange(1, T) <= 100,
    )
    return gt, inputs


def baseline_tps():
    """OpenMP C++ baseline timesteps/s (measured on this host).

    The binary is always (re)built from the committed ``native/baseline.cpp``
    — no prebuilt blob is trusted (the full ~200 s measurement run only
    happens when no stored result exists; rebuild is <10 s).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    result_file = os.path.join(here, "native", "baseline_result.json")
    binary = os.path.join(here, "native", "baseline")
    src = os.path.join(here, "native", "baseline.cpp")
    if not os.path.exists(binary) or (
        os.path.getmtime(binary) < os.path.getmtime(src)
    ):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(here, "native"), "baseline"],
                check=True, capture_output=True, timeout=300,
            )
        except Exception:
            pass
    if not os.path.exists(result_file) and os.path.exists(binary):
        try:
            out = subprocess.run(
                [binary], capture_output=True, text=True, timeout=1800
            )
            with open(result_file, "w") as f:
                f.write(out.stdout.strip().splitlines()[-1])
        except Exception:
            pass
    if os.path.exists(result_file):
        with open(result_file) as f:
            return json.load(f)["timesteps_per_sec"]
    return None


# Accuracy anchors.  Two gates since round 5:
#
# 1. ACCURACY_ANCHOR_M — the MEDIAN over the bench's 4 runs (4 filter init
#    seeds).  History: r2 0.0326 -> r3 0.0597 (hot-path rewrites) on a
#    single seed; round 4 measured the single-seed spread at 0.056-0.166 m
#    (6 seeds) — wider than the old 0.10 gate itself, so single-draw gating
#    was a coin flip.  The 4-seed median operating point is ~0.09-0.11 m
#    after the round-4 mass-conserving merge fix (which matches the
#    reference's sequential-sweep behavior; the old lossy merge happened to
#    delete ambiguous chain clusters and scored ~0.06).  Gate = ~1.4x the
#    operating point (BENCH_r04 median: 0.1138 m).
# 2. IDENTICAL_DATA_ANCHOR_M — deterministic replay of the committed C++
#    dump (native/bl_dump, fixed data + fixed seed; run-to-run noise ~0).
#    Operating point
#    0.0589 m (RESULTS.md; the C++ double baseline scores 0.574 m on this
#    same data).  Gate = ~2x the operating point.  This is the low-variance
#    regression anchor; it does NOT move when the 4-seed gate is re-fit.
ACCURACY_ANCHOR_M = 0.15
IDENTICAL_DATA_ANCHOR_M = 0.12


def main():
    sim_cfg, data, filt = build()
    stats = run_tpu(sim_cfg, data, filt)
    base = baseline_tps()
    vs = stats["timesteps_per_sec"] / base if base else None
    accuracy_ok = stats["median_pose_err_m"] <= ACCURACY_ANCHOR_M
    identical_ok = stats["identical_data_err_m"] <= IDENTICAL_DATA_ANCHOR_M
    print(json.dumps({
        "metric": "rbphd2dsim_200p_timesteps_per_sec",
        "value": round(stats["timesteps_per_sec"], 2),
        "unit": "timesteps/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "compile_s": round(stats["compile_s"], 1),
            "first_run_s": round(stats["first_run_s"], 1),
            "first_d2h_s": round(stats["first_d2h_s"], 1),
            "wall_s": round(stats["wall_s"], 3),
            "median_pose_err_m": round(stats["median_pose_err_m"], 4),
            "pose_err_runs_m": stats["pose_err_runs_m"],
            "accuracy_anchor_m": ACCURACY_ANCHOR_M,
            "accuracy_ok": accuracy_ok,
            "identical_data_err_m": round(stats["identical_data_err_m"], 4),
            "identical_data_anchor_m": IDENTICAL_DATA_ANCHOR_M,
            "identical_data_ok": identical_ok,
            "baseline_timesteps_per_sec": base,
            "device": str(jax.devices()[0]),
        },
    }))
    if not (accuracy_ok and identical_ok):
        sys.exit(1)


if __name__ == "__main__":
    main()
