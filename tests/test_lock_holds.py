"""Map-lock hold-time discipline.

Round-2 postmortem: the mapping worker held the map lock across the
triangulation and fusion DEVICE solves (~0.5 s per keyframe), starving
the tracker's per-frame map admin and causing 37 tracking losses in the
on-chip bench. The fix gives every mapping stage the local-BA discipline:
assemble under the lock, solve unlocked, apply under the lock (reference
semantics: mapping takes mMutexMapUpdate only for write-back,
src/Optimizer.cpp:745).

This test instruments the map lock on a threaded run and asserts no
single hold approaches a device-solve duration — a regression (a solve
moved back under the lock) shows up as a multi-second hold on CPU.
"""

import threading
import time
from collections import defaultdict

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.slam.system import System
from orbslam2_tpu.slam.tracking import TrackingState


class InstrumentedRLock:
    """RLock proxy recording outermost-hold durations per thread."""

    def __init__(self):
        self._lk = threading.RLock()
        self._depth = defaultdict(int)
        self._t0 = {}
        self.holds = defaultdict(list)  # thread name -> [seconds]

    def acquire(self, *a, **kw):
        got = self._lk.acquire(*a, **kw)
        tid = threading.get_ident()
        if self._depth[tid] == 0:
            self._t0[tid] = time.monotonic()
        self._depth[tid] += 1
        return got

    def release(self):
        tid = threading.get_ident()
        self._depth[tid] -= 1
        if self._depth[tid] == 0:
            self.holds[threading.current_thread().name].append(
                time.monotonic() - self._t0[tid]
            )
        self._lk.release()

    __enter__ = acquire

    def __exit__(self, *exc):
        self.release()


@pytest.fixture(scope="module")
def instrumented_run():
    world = SyntheticWorld(
        n_points=1500, seed=5, baseline=0.2, vertical_extent=6.0,
        cylinder_radius=11.0, near_fraction=0.15,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=800),
    )
    sys_ = System(None, cfg, threaded=True)
    ilock = InstrumentedRLock()
    # install before the first frame: every component aliases map.lock
    sys_.map.lock = ilock
    sys_.local_mapper.lock = ilock
    if sys_.loop_closer is not None:
        sys_.loop_closer.lock = ilock

    n_frames = 80
    for i, T in enumerate(world.trajectory_circuit(n_frames)):
        imL, imR = world.render_stereo(T)
        sys_.track_stereo(imL, imR, i / 20.0)
    sys_.wait_idle()
    sys_.shutdown()
    return sys_, ilock


class TestLockHolds:
    def test_tracking_survives(self, instrumented_run):
        sys_, _ = instrumented_run
        assert sys_.tracker.state == TrackingState.OK
        assert sys_.map.n_keyframes() >= 5

    def test_mapper_holds_bounded(self, instrumented_run):
        """The mapping worker's lock holds must be host-admin sized, never
        device-solve sized. On this CPU run the epipolar/fusion solves are
        multi-second; holding the lock across one would show here."""
        _, ilock = instrumented_run
        mapper_holds = ilock.holds.get("mapping-worker", [])
        assert mapper_holds, "mapping worker never took the map lock"
        mx = max(mapper_holds)
        assert mx < 1.0, (
            f"mapping worker held the map lock for {mx:.2f}s — a device "
            "solve is running under the lock"
        )

    def test_solves_run_unlocked(self, instrumented_run):
        """Total mapping wall time is dominated by the (unlocked) device
        solves: summed lock holds must be a fraction of mapping time."""
        sys_, ilock = instrumented_run
        t = sys_.timers.samples
        mapping_total_s = (
            sum(t.get("Map point creation", []))
            + sum(t.get("Map point fusion", []))
            + sum(t.get("Local BA", []))
        ) / 1e6
        held_s = sum(ilock.holds.get("mapping-worker", []))
        assert mapping_total_s > 0
        assert held_s < 0.7 * mapping_total_s, (
            f"mapping held the lock {held_s:.1f}s of {mapping_total_s:.1f}s"
        )
