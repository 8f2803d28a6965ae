"""Checkpoint / resume for filter state.

The reference has NO checkpointing (SURVEY.md section 5 — runs restart from
scratch); this is a required robustness addition for long multi-host TPU
runs.  A snapshot is the full filter-state pytree (particles, GM SoA
arrays, RNG key) plus the step index, serialized with
``flax.serialization`` and written atomically (tmp + rename), with
``keep``-deep rotation.  Restore returns the pytree with the saved dtypes /
shapes re-validated against a template state.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")


def save(ckpt_dir: str, step: int, state, keep: int = 3) -> str:
    """Write an atomic snapshot; returns the file path."""
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = jax.tree_util.tree_map(np.asarray, state)
    payload = serialization.to_bytes({"step": step, "state": host_state})
    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _rotate(ckpt_dir, keep)
    return path


def latest_step(ckpt_dir: str) -> int | None:
    """Step index of the newest snapshot, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for n in os.listdir(ckpt_dir)
             if (m := _CKPT_RE.match(n))]
    return max(steps) if steps else None


def restore(ckpt_dir: str, template_state, step: int | None = None):
    """Load a snapshot into the structure of ``template_state``.

    Returns ``(step, state)``.  Raises FileNotFoundError if absent.
    """
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    with open(path, "rb") as f:
        payload = f.read()
    template = {"step": 0,
                "state": jax.tree_util.tree_map(np.asarray, template_state)}
    data = serialization.from_bytes(template, payload)
    state = jax.tree_util.tree_map(
        lambda t, v: jax.numpy.asarray(v, getattr(t, "dtype", None)),
        template_state, data["state"])
    return int(data["step"]), state


def _rotate(ckpt_dir: str, keep: int) -> None:
    entries = sorted(
        (int(m.group(1)), n) for n in os.listdir(ckpt_dir)
        if (m := _CKPT_RE.match(n)))
    for _, name in entries[:-keep] if keep > 0 else []:
        os.unlink(os.path.join(ckpt_dir, name))
