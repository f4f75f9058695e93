"""Threaded pipeline: mapping/loop closing overlap tracking.

The reference runs LocalMapping/LoopClosing/GBA on their own threads
(src/System.cpp:63-77, LoopClosing.cpp:566-570) so a loop-closure event
never charges essential-graph + global-BA wall time to a single frame.
These tests drive the threaded System through a full circuit with a loop
closure and assert (a) tracking never degrades, (b) frames keep flowing
DURING the loop correction, and (c) per-frame latency stays bounded.

Also covers the interruptible bundle adjustment (reference mbAbortBA,
LocalMapping.cpp:109-114): aborting mid-solve returns the partial result.
"""

import time

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.evaluation.ate import ate_rmse
from orbslam2_tpu.slam.system import System
from orbslam2_tpu.slam.tracking import TrackingState
from orbslam2_tpu.vocab import train


@pytest.fixture(scope="module")
def threaded_run():
    world = SyntheticWorld(
        n_points=2000, seed=21, baseline=0.2, vertical_extent=6.0,
        cylinder_radius=11.0, near_fraction=0.15,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=1200),
    )

    # pretrain a vocabulary from sample views (as in test_loop_closing)
    from orbslam2_tpu.slam.frontend import Frontend

    frontend = Frontend(cfg)
    descs, docs = [], []
    for d, T in enumerate(world.trajectory_circuit(8)):
        imL, _ = world.render_stereo(T)
        f = frontend.process(imL, imL)
        v = np.asarray(f.valid)
        dd = np.asarray(f.desc)[v][:400]
        descs.append(np.ascontiguousarray(dd).view(np.uint8))
        docs.append(np.full(len(dd), d))
    voc = train.train_vocabulary(
        np.concatenate(descs), k=8, depth=3, doc_ids=np.concatenate(docs)
    )

    sys_ = System(voc, cfg, threaded=True)
    n_frames = 150
    circuit = world.trajectory_circuit(n_frames)
    frames = [world.render_stereo(T) for T in circuit]
    poses_gt, est, lat, stamps = [], [], [], []

    def feed(i):
        imL, imR = frames[i % n_frames]
        poses_gt.append(circuit[i % n_frames])
        t0 = time.monotonic()
        est.append(sys_.track_stereo(imL, imR, i / 20.0))
        t1 = time.monotonic()
        lat.append(t1 - t0)
        stamps.append((t0, t1))

    for i in range(n_frames):
        feed(i)
    # keep the camera moving around the (closed) circuit until the worker
    # detects + corrects the loop — frames must flow DURING the correction
    closer = sys_.loop_closer
    i = n_frames
    while closer.n_loops_closed == 0 and i < n_frames + 300:
        feed(i)
        i += 1
    report = sys_.shutdown()
    return sys_, closer, poses_gt, est, np.asarray(lat), stamps, report


class TestThreadedPipeline:
    def test_tracking_never_degrades(self, threaded_run):
        """Tracking survives the whole run. A transient single-frame miss
        (e.g. the frame racing a correction write-back on a 2-core host)
        must recover immediately; anything beyond 2 misses means the
        pipeline starved the tracker (the failure mode this test exists
        to catch: keyframe-insertion starvation loses tracking for ~100
        frames until relocalization)."""
        sys_, _, _, est, _, _, _ = threaded_run
        assert sys_.tracker.state == TrackingState.OK
        n_lost = sum(e is None for e in est)
        assert n_lost <= 2, f"{n_lost}/{len(est)} frames lost tracking"

    def test_loop_closed(self, threaded_run):
        _, closer, _, _, _, _, _ = threaded_run
        assert closer.n_loops_closed >= 1

    def test_frames_flow_during_correction(self, threaded_run):
        """The loop correction (Sim3 propagation + essential graph + GBA)
        must overlap tracking: at least one frame is fully processed
        inside a correction window."""
        _, closer, _, _, _, stamps, _ = threaded_run
        assert closer.correction_windows, "no correction window recorded"
        overlapped = 0
        for (w0, w1) in closer.correction_windows:
            for (t0, t1) in stamps:
                if t0 >= w0 and t1 <= w1:
                    overlapped += 1
        assert overlapped >= 1, (
            f"no frame completed during the {closer.correction_windows} "
            "correction window(s) — loop closure stalled the tracker"
        )

    def test_frame_latency_bounded(self, threaded_run):
        """No frame pays the essential-graph + GBA bill (the correction
        window in this run is tens of seconds; a stalled tracker would
        show a frame of that magnitude). The worst few frames are excluded
        — XLA recompiles for grown padding buckets land mid-run on a cold
        cache — and the rest must stay within a small multiple of the
        median."""
        _, _, _, _, lat, _, _ = threaded_run
        steady = np.sort(lat[20:])[:-4]  # drop warmup + compile spikes
        med = float(np.median(steady))
        assert float(steady.max()) < max(4.0 * med, 2.5), (
            f"max steady latency {steady.max():.2f}s vs median {med:.2f}s"
        )

    def test_ate_after_loop(self, threaded_run):
        _, _, poses_gt, est, _, _, _ = threaded_run
        pairs = [(g, e) for g, e in zip(poses_gt, est) if e is not None]
        gt_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in pairs])
        est_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T in pairs])
        rmse = ate_rmse(est_xyz, gt_xyz)
        # online poses are never retro-corrected (reference System.cpp:
        # 134-135), so the pre-closure drift stays in the ATE — and the
        # number of pre-closure laps varies with worker thread timing.
        # ~69 m circuit: bound the drift, don't expect post-BA accuracy.
        assert rmse < 0.45, f"ATE RMSE {rmse:.3f} m"

    def test_timing_report(self, threaded_run):
        *_, report = threaded_run
        assert "Total tracking" in report


class TestConcurrentGBA:
    """GBA runs on its own thread (reference LoopClosing.cpp:566-570) with
    the mbStopGBA abort protocol (:397-409): loop detection for subsequent
    keyframes proceeds while the solve runs, and a newer correction aborts
    a stale in-flight GBA before rewriting poses."""

    def _make_closer(self):
        from orbslam2_tpu.config import SlamConfig
        from orbslam2_tpu.slam.frontend import Frontend
        from orbslam2_tpu.slam.loop_closing import LoopCloser
        from orbslam2_tpu.slam.map import SlamMap
        from orbslam2_tpu.slam.relocalization import Relocalizer
        from orbslam2_tpu.vocab import train

        cfg = SlamConfig()
        fe = Frontend(cfg)
        m = SlamMap(cfg.orb.n_features)
        rng = np.random.default_rng(0)
        voc = train.train_vocabulary(
            rng.integers(0, 256, (256, 32)).astype(np.uint8), k=4, depth=2
        )
        reloc = Relocalizer(cfg, fe, m, voc)
        return LoopCloser(cfg, fe, m, reloc)

    def test_gba_thread_overlaps_detection_and_aborts(self, monkeypatch):
        import threading

        lc = self._make_closer()
        lc.threaded_gba = True
        started = threading.Event()
        detect_calls = []

        def fake_gba(kf):
            started.set()
            while not lc._gba_stop:  # honors the abort flag like the solver
                time.sleep(0.002)

        monkeypatch.setattr(lc, "_global_ba", fake_gba)
        monkeypatch.setattr(
            lc, "_detect_loop", lambda kf: detect_calls.append(kf) and False
        )
        lc._start_gba(7)
        assert started.wait(5.0), "GBA thread did not start"
        assert lc.gba_running()

        # loop detection proceeds while GBA is alive: insert_keyframe must
        # return promptly (the detect stub records the call)
        lc.map.kf_valid.add_range(0, 20)  # enough KFs to pass the gate
        lc.last_loop_kf = -100
        monkeypatch.setattr(lc.reloc, "add_keyframe", lambda kf: None)
        t0 = time.monotonic()
        lc.insert_keyframe(15)
        assert time.monotonic() - t0 < 2.0
        assert detect_calls == [15]
        assert lc.gba_running(), "detection must not wait for GBA"

        # a newer correction aborts the stale GBA before proceeding
        lc._abort_gba_and_join(timeout=5.0)
        assert not lc.gba_running()

    def test_inline_gba_when_unthreaded(self, monkeypatch):
        lc = self._make_closer()  # threaded_gba defaults to False
        calls = []
        monkeypatch.setattr(lc, "_global_ba", lambda kf: calls.append(kf))
        lc._start_gba(3)
        assert calls == [3] and not lc.gba_running()
