"""Threaded pipeline runtime: the mapping/loop-closing worker.

Reproduces the reference's concurrency runtime (SURVEY §2.3 P1/P2): the
System spawns LocalMapping and LoopClosing on their own threads
(reference src/System.cpp:63-77) and they drain a keyframe queue while
the tracker keeps processing frames. Here both stages share ONE worker
thread (they were already serialized in the reference: LoopClosing only
consumes what LocalMapping produces, LocalMapping.cpp:82), and the
synchronization fabric is the single map-update lock
(reference mMutexMapUpdate, Tracking.cpp:260) plus the convention that
long device solves (local BA, global BA) run OUTSIDE the lock — so the
tracker's frame latency is bounded by the worker's host sections, never
by a bundle adjustment. JAX dispatch is async and the chunked BA syncs
between iteration groups, so tracker device programs interleave with the
solve on the device stream as well.
"""

from __future__ import annotations

import threading


class MappingWorker:
    """Background thread draining the LocalMapper's keyframe queue.

    The reference's LocalMapping::Run poll loop (LocalMapping.cpp:22-107)
    with a condition variable instead of the 3 ms sleep. LoopClosing runs
    downstream via the LocalMapper's on_processed hook, in this same
    thread (the reference's loop thread consumes the mapping thread's
    output queue — same serialization, one fewer thread)."""

    def __init__(self, local_mapper):
        self.lm = local_mapper
        self._cv = threading.Condition()
        self._stop = False
        self._busy = False
        self._error = None
        self._thread = threading.Thread(
            target=self._run, name="mapping-worker", daemon=True
        )
        self.lm.worker = self
        self._thread.start()

    # -------------------------------------------------------- tracker API

    def notify(self):
        with self._cv:
            self._cv.notify()

    def idle(self) -> bool:
        return not self._busy and not self.lm._queue

    def wait_idle(self, timeout: float = 60.0):
        """Block until the queue is drained (shutdown barrier — reference
        System::Shutdown spin-wait, System.cpp:239-242)."""
        import time

        t0 = time.monotonic()
        while not self.idle():
            if self._error is not None:
                raise self._error
            if time.monotonic() - t0 > timeout:
                raise TimeoutError("mapping worker did not drain in time")
            time.sleep(0.002)
        if self._error is not None:
            raise self._error

    def finish(self):
        """Stop the thread after draining the queue (RequestFinish)."""
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=120.0)
        if self._error is not None:
            raise self._error

    # ----------------------------------------------------------- internals

    def _run(self):
        while True:
            with self._cv:
                while not self._stop and (
                    not self.lm._queue or self.lm._stopped
                ):
                    self._cv.wait(timeout=0.01)
                if self._stop and (not self.lm._queue or self.lm._stopped):
                    return
                self._busy = True
            try:
                self.lm.pump()
            except Exception as e:  # surface in wait_idle/finish
                self._error = e
                self.lm._queue.clear()
            finally:
                self._busy = False
