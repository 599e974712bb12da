"""Bounded atexit cleanup of abandoned device-transfer threads.

Why this exists: error-path teardown (``LoopContext.abort``, a consumer
abandoning ``device_prefetch``) stops its worker thread with an event and a
short bounded join. If the worker is mid device transfer on a slow link (an
image-panel fetch is tens of MB — many seconds on this host's ~26 MB/s TPU
tunnel), the join times out and the daemon thread is left inside PJRT C++
frames. At interpreter finalization CPython forces such threads out via
``pthread_exit``, whose forced-unwind exception crossing C++ PJRT frames
aborts the process: ``terminate called after throwing an instance of '' /
FATAL: exception not rethrown`` — observed after ``tools/bench_e2e.py``
printed its final row (round 3).

The registry gives those threads one more bounded chance to finish *before*
finalization: ``atexit`` callbacks run after the main thread ends but before
daemon threads are torn down, so a join that completes here exits the thread
cleanly through normal Python frames. A thread still alive after the budget
(dead link) is reported and left to its fate — no worse than before.

The reference has no analogue (single-threaded Lightning teardown); this is
runtime hardening the TPU build needs because its loop overlaps device
transfers on worker threads (`training/loop.py`, `parallel/mesh.py`).
"""
from __future__ import annotations

import atexit
import sys
import threading
import time

_LOCK = threading.Lock()
_THREADS: list[threading.Thread] = []
_registered = False


def adopt(thread: threading.Thread) -> None:
    """Register a possibly-mid-transfer thread for a final atexit join."""
    global _registered
    with _LOCK:
        if not _registered:
            atexit.register(drain)
            _registered = True
        _THREADS.append(thread)


def drain(budget_s: float = 60.0) -> bool:
    """Join adopted threads within one shared budget; True if all exited.

    Runs automatically at interpreter exit once ``adopt`` has been called;
    callable directly by entry points that want to flush earlier (tests,
    bench tools between rows).
    """
    with _LOCK:
        threads, _THREADS[:] = list(_THREADS), []
    deadline = time.monotonic() + budget_s
    ok = True
    for t in threads:
        t.join(timeout=max(0.0, deadline - time.monotonic()))
        if t.is_alive():
            ok = False
            print(f"WARNING: abandoned transfer thread {t.name!r} still "
                  "alive at exit (device link stuck?)",
                  file=sys.stderr, flush=True)
    return ok
