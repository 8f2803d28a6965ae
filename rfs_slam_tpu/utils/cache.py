"""Persistent XLA compilation cache setup.

Compile times dominate small-host workflows (tests, CLI apps); enabling the
JAX persistent cache makes every recompile of an unchanged computation a disk
hit.  Call :func:`enable` before building any computation.

The cache directory is segregated by the ``JAX_PLATFORMS`` value: processes
running under a PJRT plugin (e.g. a tunneled TPU backend) can emit CPU
executables with plugin-specific target features (``prefer-no-scatter`` /
``prefer-no-gather``); loading those from a plain-CPU process trips XLA's
machine-feature check ("could lead to execution errors such as SIGILL").
Separate directories keep the two executable families apart.
"""

from __future__ import annotations

import os
import re


_BUILTIN_BACKENDS = frozenset({"cpu", "cuda", "rocm", "tpu", "metal"})


def _pjrt_plugin_present() -> bool:
    """True when an out-of-tree PJRT plugin is registered in this process.

    Probes JAX's backend-factory registry — every discovery mechanism
    (``jax_plugins`` namespace package, entry points, a ``sitecustomize``
    hook) ends there — so the cache is keyed on the plugin actually being
    loadable, not on how it reached ``sys.path``.
    """
    try:
        from jax._src import xla_bridge

        extras = set(map(str.lower, xla_bridge._backend_factories)) \
            - _BUILTIN_BACKENDS
        return bool(extras)
    except Exception:  # noqa: BLE001 — private registry; fall back below
        pass
    try:
        import importlib.util

        if importlib.util.find_spec("jax_plugins") is not None:
            return True
        import importlib.metadata

        return bool(tuple(
            importlib.metadata.entry_points(group="jax_plugins")))
    except Exception:  # noqa: BLE001 — metadata backends vary
        import os

        return ".axon_site" in os.environ.get("PYTHONPATH", "")


def _host_cpu_fingerprint() -> str:
    """Short hash of the host CPU's feature set.

    XLA:CPU executables are specialized to the compile host's machine
    features, and jax's persistent-cache key does NOT include them: when the
    container that owns the cache directory migrates to a different physical
    host, stale entries load with a "machine type ... doesn't match" warning
    and subtly different codegen (observed: two semantically-identical merge
    kernels, one replayed from the old host and one compiled locally,
    disagreed in f32 rounding and broke a bit-exactness test).  Keying
    CPU-platform cache dirs on this fingerprint keeps each host's
    executables separate.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform as _platform

    return re.sub(r"[^\w-]+", "_", _platform.machine() or "unknown")


def enable(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "RFS_SLAM_TPU_CACHE",
            os.path.expanduser("~/.cache/rfs_slam_tpu_xla"),
        )
    # Platform segregation applies to EVERY cache root, including explicit
    # ones — an explicit path shared across JAX_PLATFORMS values would
    # reintroduce the cross-platform executable poisoning this exists to fix.
    # NOTE (layout change vs round 2): callers that passed an exact path now
    # get a per-platform subdirectory under it; cache entries written at the
    # old exact path are orphaned (never read again), not corrupted — delete
    # the old root to reclaim the disk.
    platform = os.environ.get("JAX_PLATFORMS", "auto") or "auto"
    # the JAX_PLATFORMS value alone is NOT a sufficient key: a process with
    # the PJRT plugin importable emits CPU executables carrying
    # plugin-specific machine features (prefer-no-scatter/gather) EVEN when
    # JAX_PLATFORMS=cpu, and plain-CPU processes then warn about possible
    # SIGILL when loading them — include plugin presence in the key.
    # Plugin presence = any discoverable jax_plugins entry point / namespace
    # package (the mechanism PJRT plugins register through), not a PYTHONPATH
    # substring, so site-packages or .pth installs are keyed too.
    plugged = "-plug" if _pjrt_plugin_present() else ""
    # Explicit-CPU processes additionally key on the host CPU's feature
    # fingerprint (see _host_cpu_fingerprint): XLA:CPU code is specialized to
    # the compile host and the container's cache dir can outlive the host it
    # ran on.  TPU-targeting dirs ("auto"/"tpu") are left host-independent —
    # their executables are compiled by the TPU toolchain and re-keying them
    # would cold-restart every device program after a host migration.
    host = ("-h" + _host_cpu_fingerprint()
            if "cpu" in platform.lower() else "")
    cache_dir = os.path.join(
        cache_dir, re.sub(r"[^\w-]+", "_", platform) + plugged + host)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
