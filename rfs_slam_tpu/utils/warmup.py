"""Device-transfer warm-up for high-latency (tunneled) TPU backends.

On this host the TPU is reached through a relay tunnel whose FIRST
device-to-host transfer in a process pays a very large cold-start cost
(measured 230 s - 1300 s); every subsequent transfer is milliseconds.
``jax.jit(...).lower()`` triggers such a transfer whenever the traced
function closes over a committed device array (the constant is fetched to
embed it in the StableHLO module), which is how round 1's bench recorded a
1030 s "compile" (BENCH_r01.json) while actual XLA compilation took ~5 s.

Two-part mitigation, both used by the apps and the bench:

1. Keep model/config constants as **numpy** arrays so lowering never needs a
   device fetch (see the app builders).
2. Call :func:`warm_transfers` at process start: a daemon thread performs one
   tiny device-to-host fetch so the cold path is paid concurrently with
   tracing/compilation, and the final result read-out finds a warm channel.
   The fetch was verified not to block unrelated H2D / compile / execute
   work on the main thread.
"""

from __future__ import annotations

import atexit
import threading

_LOCK = threading.Lock()
_THREAD: threading.Thread | None = None


def _fetch_once() -> None:
    import numpy as np  # noqa: PLC0415

    import jax  # noqa: PLC0415
    import jax.numpy as jnp  # noqa: PLC0415

    try:
        np.asarray(jax.block_until_ready(jnp.zeros((1,), jnp.float32) + 1.0))
    except Exception:
        pass  # warm-up is best-effort; never take down the app


def warm_transfers(block: bool = False) -> None:
    """Start (once) the background device-to-host warm-up fetch.

    Args:
      block: wait for the fetch to finish before returning (tests only).
    """
    global _THREAD
    with _LOCK:
        if _THREAD is None:
            _THREAD = threading.Thread(
                target=_fetch_once, name="rfs-d2h-warmup", daemon=True
            )
            _THREAD.start()
            # Exiting while the fetch RPC is in flight aborts the process
            # (PJRT client teardown with a pending transfer -> std::terminate).
            # Every real flow performs a device read-out long before exit, so
            # this join is instant in practice; an early-exiting process waits
            # for the handshake instead of dumping core.  The timeout bounds
            # the wait when the relay itself is wedged (a documented failure
            # mode of this host) — a hung exit is worse than the rare abort.
            atexit.register(lambda: _THREAD.join(timeout=120.0))
        th = _THREAD
    if block:
        th.join()
