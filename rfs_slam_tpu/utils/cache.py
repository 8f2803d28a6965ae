"""Persistent XLA compilation cache setup.

Compile times dominate small-host workflows (tests, CLI apps); enabling the
JAX persistent cache makes every recompile of an unchanged computation a disk
hit.  Call :func:`enable` before building any computation.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "RFS_SLAM_TPU_CACHE", os.path.expanduser("~/.cache/rfs_slam_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
