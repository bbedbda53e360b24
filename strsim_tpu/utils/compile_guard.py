"""Guarded AOT compilation with timeout.

The TPU remote-compile tunnel in some environments can hang individual compile
requests indefinitely. This module compiles jitted functions ahead-of-time in
daemon worker threads with a deadline: callers either get a compiled
executable, or a definitive "not ready" answer so they can fall back to the
host path (exact, just slower) instead of blocking the whole pipeline.

Compiles are memoized per key; a compile that eventually finishes after its
deadline still lands in the memo (and the persistent XLA disk cache), so later
calls — including retries in a fresh process — hit it instantly.
"""
from __future__ import annotations

import os
import threading
from typing import Callable, Dict, Optional, Tuple

_lock = threading.Lock()
_futures: Dict[Tuple, "_CompileFuture"] = {}

# Cap concurrent compiles: remote-compile services can degrade under
# parallel requests; queued compiles still overlap with pipeline compute.
_compile_slots = threading.Semaphore(
    int(os.environ.get("TPU_STRSIM_COMPILE_CONCURRENCY", "2"))
)


class _CompileFuture:
    def __init__(self, fn: Callable, abstract_args: Tuple):
        import time

        self.event = threading.Event()
        self.compiled = None
        self.error: Optional[BaseException] = None
        self.started_at = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, args=(fn, abstract_args), daemon=True
        )
        self._thread.start()

    def _run(self, fn, abstract_args):
        import time

        try:
            with _compile_slots:
                self.started_at = time.monotonic()  # deadline from actual start
                self.compiled = fn.lower(*abstract_args).compile()
        except BaseException as e:  # noqa: BLE001 — surfaced to the caller
            self.error = e
        finally:
            self.event.set()

    def wait(self, timeout: Optional[float]):
        """Deadline counts from compile START, not from this call — several
        callers waiting on prewarmed futures must not serialize timeouts."""
        import time

        if timeout is None:
            self.event.wait()
        else:
            remaining = self.started_at + timeout - time.monotonic()
            if remaining > 0:
                self.event.wait(remaining)
        if self.error is not None:
            raise self.error
        return self.compiled  # None if still compiling


def compile_with_timeout(
    key: Tuple,
    jitfn: Callable,
    abstract_args: Tuple,
    timeout_s: Optional[float],
):
    """Return the compiled executable for (key), or None if the compile has
    not finished within timeout_s (it keeps going in the background)."""
    with _lock:
        fut = _futures.get(key)
        if fut is None:
            fut = _CompileFuture(jitfn, abstract_args)
            _futures[key] = fut
    return fut.wait(timeout_s)


def prewarm(key: Tuple, jitfn: Callable, abstract_args: Tuple) -> None:
    """Kick off a compile without waiting (e.g. warm all bucket shapes at
    pipeline start so they compile concurrently)."""
    with _lock:
        if key not in _futures:
            _futures[key] = _CompileFuture(jitfn, abstract_args)


def run_with_timeout(fn: Callable, timeout_s: Optional[float]):
    """Run fn() in a daemon thread with a deadline. Returns (True, result) or
    (False, None) on timeout/error — the device call keeps running detached
    (it cannot be cancelled mid-flight) while the caller falls back to the
    host path. For guarding device EXECUTION (uploads, dispatches, fetches)
    against wedged interconnects; compiles use compile_with_timeout above."""
    if timeout_s is None:
        return True, fn()
    box: list = []

    def runner():
        try:
            box.append(("ok", fn()))
        except BaseException as e:  # noqa: BLE001
            box.append(("err", e))

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    t.join(timeout_s)
    if not box:
        return False, None
    tag, val = box[0]
    if tag == "err":
        raise val
    return True, val
