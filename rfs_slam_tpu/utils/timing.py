"""Per-phase timing report — the TimingInfo equivalent.

Reference: per-phase boost cpu_timers in the filters (RBPHDFilter.hpp:278-284,
Timer.hpp:42-75) exposed via ``getTimingInfo()`` (:1219-1232) and logged to
``timing.dat`` (rbphdslam2dSim.cpp:654-732).

On TPU the whole timestep is ONE fused jitted program, so phases cannot be
timed inside the production scan without breaking fusion.  Instead
:func:`profile_phases` times each phase as its own jitted call
(``block_until_ready`` wall clocks, warm-cache, ``reps`` repetitions) —
an explicit profiling mode, like the reference's gperftools builds
(CMakeLists.txt:60-82).  For deeper analysis use ``jax.profiler`` traces.
"""

from __future__ import annotations

import time

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase (host-side)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def time(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def report(self) -> dict[str, float]:
        """{phase: total wall seconds} — feed to io.logs.write_timing."""
        return dict(self.totals)

    def table(self) -> str:
        w = max((len(k) for k in self.totals), default=8)
        lines = [f"{'Phase':<{w}}  {'Wall (s)':>10}  {'Calls':>6}"]
        for k, v in self.totals.items():
            lines.append(f"{k:<{w}}  {v:>10.4f}  {self.counts[k]:>6}")
        return "\n".join(lines)


def profile_phases(filt, state, u, dt, z, z_mask, reps: int = 10):
    """Time predict / update (and sub-phases where exposed) separately.

    Returns a PhaseTimer after ``reps`` warm iterations; the first
    (compile) call of each phase is excluded.
    """
    predict = jax.jit(lambda s: filt.predict(s, u, dt))
    update = jax.jit(lambda s, z, m: filt.update(s, z, m))

    s = predict(state)
    s = update(s, z, z_mask)
    jax.block_until_ready(s)

    timer = PhaseTimer()
    s = state
    for _ in range(reps):
        s = timer.time("predict", predict, s)
        s = timer.time("update", update, s, z, z_mask)
    return timer
