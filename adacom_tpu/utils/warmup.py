"""Device link warmup.

The tunneled TPU backend used in this environment initializes its
device->host transfer path lazily, and the FIRST pull in a process can take
minutes (later pulls are ~30 ms). `ensure_transfer_warm()` frontloads that
cost once, at engine init, so query execution never eats it. No-op on CPU
and after the first call."""

from __future__ import annotations

import threading

_done = False
_lock = threading.Lock()
_thread = None
_lock_start = threading.Lock()


def warm_in_background() -> None:
    """Kick the device-link warmup off on a daemon thread so engine init
    (and the caller's ingest) overlaps it instead of blocking on a
    potentially minutes-long first tunneled pull."""
    global _thread
    if _done or _thread is not None:
        return
    with _lock_start:
        if _done or _thread is not None:
            return
        _thread = threading.Thread(
            target=ensure_transfer_warm, name="adacom-warmup", daemon=True)
        _thread.start()


def ensure_transfer_warm(force: bool = False) -> None:
    global _done
    if _done:
        return
    with _lock:
        if _done:
            return
        import jax

        try:
            backend = jax.default_backend()
        except Exception:
            _done = True
            return
        if backend not in ("tpu",) and not force:
            _done = True
            return
        import numpy as np

        a = jax.device_put(np.arange(64, dtype=np.uint32))
        np.asarray(a)  # the expensive first pull
        _done = True
