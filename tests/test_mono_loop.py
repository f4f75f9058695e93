"""Monocular loop closure with accumulated scale drift.

The one behavior that distinguishes Sim3 from SE3 loop closure: monocular
scale drift is unobservable to tracking (a similarity-transformed submap
projects identically), so only the free-scale Sim3 solver
(reference src/Sim3Solver.cpp:250 — `mbFixScale` false for monocular) and
the 7-DoF essential graph (reference src/Optimizer.cpp:848) can detect
and repair it at loop closure.

This test drives the full monocular pipeline around the circuit world and
*injects* a scale-drift event mid-run: the recent submap (keyframes +
points created after the current local-map window opened) is transformed
by a similarity with scale s=1.3 anchored at the boundary keyframe's
camera center. Because pinhole projection is similarity-invariant, the
drifted submap remains perfectly self-consistent — tracking continues
undisturbed at the wrong scale, exactly as real accumulated drift would
have it. At loop closure the free-scale Sim3 + essential graph + global
BA must shrink the inter-segment scale error by >5x (VERDICT item 4).
"""

import os

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.slam.frontend import Frontend
from orbslam2_tpu.slam.local_mapping import LocalMapper
from orbslam2_tpu.slam.loop_closing import LoopCloser
from orbslam2_tpu.slam.map import SlamMap
from orbslam2_tpu.slam.relocalization import Relocalizer
from orbslam2_tpu.slam.tracking import Tracker, TrackingState
from orbslam2_tpu.vocab import train

DRIFT_SCALE = 1.3
FPS = 20.0


def _inject_scale_drift(m: SlamMap, tracker: Tracker, s: float) -> int:
    """Apply a similarity (scale s) to the recent submap + tracker state.

    Anchored at the oldest local-map keyframe's camera center so the
    boundary keyframe itself is a fixed point (trajectory continuity).
    Returns the boundary keyframe id."""
    kc = min(tracker.local_keyframes)
    anchor = m.kf_center(kc)

    for k in [k for k in m.kf_valid if k >= kc]:
        T = m.kf_pose[k].astype(np.float64)
        R = T[:3, :3]
        c = -R.T @ T[:3, 3]
        c2 = s * (c - anchor) + anchor
        T2 = T.copy()
        T2[:3, 3] = -R @ c2
        m.kf_pose[k] = T2.astype(np.float32)

    pids = m.pt_ids()
    sel = pids[m.pt_first_kf_id[pids] >= kc]
    m.pt_pos[sel] = s * (m.pt_pos[sel] - anchor) + anchor
    m.pt_min_dist[sel] *= s
    m.pt_max_dist[sel] *= s

    # tracker's motion-model state rides the same similarity
    lf = tracker.last_frame
    T = lf.Tcw.astype(np.float64)
    R = T[:3, :3]
    c2 = s * ((-R.T @ T[:3, 3]) - anchor) + anchor
    T2 = T.copy()
    T2[:3, 3] = -R @ c2
    lf.Tcw = T2.astype(np.float32)
    if tracker.velocity is not None:
        V = tracker.velocity.copy()
        V[:3, 3] *= s
        tracker.velocity = V
    return kc


def _segment_scale_ratio(m_snapshot, kc: int, poses_gt):
    """Ratio of (estimated/GT) inter-keyframe chord scale between the
    drifted segment (kf id >= kc) and the clean one — gauge-free: the
    monocular map's global scale cancels."""
    kf_ids, centers, stamps = m_snapshot

    def med_ratio(ids):
        ids = sorted(ids)
        r = []
        for a, b in zip(ids[:-1], ids[1:]):
            ia = int(round(stamps[a] * FPS))
            ib = int(round(stamps[b] * FPS))
            g = np.linalg.norm(_gt_center(poses_gt[ib]) - _gt_center(poses_gt[ia]))
            e = np.linalg.norm(centers[b] - centers[a])
            if g > 1e-6:
                r.append(e / g)
        return float(np.median(r))

    clean = [k for k in kf_ids if k < kc]
    drift = [k for k in kf_ids if k >= kc]
    assert len(clean) >= 3 and len(drift) >= 3
    return med_ratio(drift) / med_ratio(clean)


def _gt_center(T):
    return -T[:3, :3].T @ T[:3, 3]


def _snapshot(m: SlamMap):
    kf_ids = sorted(m.kf_valid)
    centers = {k: m.kf_center(k) for k in kf_ids}
    stamps = {k: m.kf_timestamp[k] for k in kf_ids}
    return kf_ids, centers, stamps


@pytest.fixture(scope="module")
def mono_loop_run():
    world = SyntheticWorld(
        n_points=2000, seed=21, baseline=0.2, vertical_extent=6.0,
        cylinder_radius=11.0, near_fraction=0.15,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=FPS,
        ),
        orb=OrbConfig(n_features=1200),
        sensor="monocular",
    )
    frontend = Frontend(cfg)

    # the pre-built circuit vocabulary (tools/build_vocab.py, ~10k words)
    # — the tiny 512-word fallback scored this world's places near-equal
    # and left mono loop closure marginal (flaky across hosts)
    vocab_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "vocab_circuit.npz",
    )
    if os.path.exists(vocab_path):
        from orbslam2_tpu.vocab import bow as bow_mod

        voc = bow_mod.load_npz(vocab_path)
    else:
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

    m = SlamMap(cfg.orb.n_features)
    tracker = Tracker(cfg, frontend, m)
    mapper = LocalMapper(cfg, frontend, m)
    tracker.local_mapper = mapper
    reloc = Relocalizer(cfg, frontend, m, voc)
    tracker.relocalizer = reloc
    closer = LoopCloser(
        cfg, frontend, m, reloc, local_mapper=mapper, fix_scale=False
    )
    mapper.on_processed = closer.insert_keyframe

    inject_at = 85
    # 1.16 laps: the revisit must DWELL past the seam — the same lesson
    # the stereo bench learned (bench.py): a sequence that stops at the
    # seam gives the 3-consecutive-KF consistency chain no room, and the
    # first seam keyframes share few landmark-bearing corners with the
    # initialization keyframes (n_bow climbs 5 -> 13 -> 20+ over the
    # dwell as revisit keyframes accumulate cross-pass bindings)
    lap = world.trajectory_circuit(150)
    poses_gt = lap + lap[:24]
    kc = None
    pre_snapshot = None
    for i, T in enumerate(poses_gt):
        imL, _ = world.render_stereo(T)
        tracker.track_mono(imL, i / FPS)
        if i == inject_at:
            assert tracker.state == TrackingState.OK
            before_snapshot = _snapshot(m)
            kc = _inject_scale_drift(m, tracker, DRIFT_SCALE)
            # snapshot immediately: local BA starts diffusing the scale
            # discontinuity through observations shared across the
            # boundary within ONE keyframe (pre-kc points observed by
            # post-kc keyframes anchor them), so any later snapshot
            # understates the injected drift in a host-dependent way.
            # The before/after pair isolates the injected factor from
            # NATURAL accumulated mono drift (measured ~-13% on this
            # segment), which can partially cancel the injection.
            pre_snapshot = _snapshot(m)
    post_snapshot = _snapshot(m)
    return (tracker, closer, kc, pre_snapshot, post_snapshot, poses_gt,
            before_snapshot)


class TestMonoLoopScaleDrift:
    def test_survives_injection_and_tracks(self, mono_loop_run):
        tracker, _, kc, _, _, _, _ = mono_loop_run
        assert tracker.state == TrackingState.OK
        assert kc is not None and kc > 5

    def test_loop_closed_with_free_scale(self, mono_loop_run):
        _, closer, _, _, _, _, _ = mono_loop_run
        assert not closer.fix_scale
        assert closer.n_loops_closed >= 1, "mono loop closure never fired"

    def test_drift_present_before_closure(self, mono_loop_run):
        _, _, kc, pre, _, poses_gt, before = mono_loop_run
        # the injected multiplicative factor (1.3) must be visible in the
        # before/after pair — measured relative so NATURAL accumulated
        # mono drift (either sign) cannot mask it
        r_before = _segment_scale_ratio(before, kc, poses_gt)
        r_pre = _segment_scale_ratio(pre, kc, poses_gt)
        factor = r_pre / r_before
        assert factor > 1.2, (
            f"injected factor not visible: {r_before:.3f} -> {r_pre:.3f} "
            f"(x{factor:.3f}, expected ~x{DRIFT_SCALE})"
        )

    def test_scale_drift_corrected(self, mono_loop_run):
        _, _, kc, pre, post, poses_gt, before = mono_loop_run
        # injected-factor view: the correction must remove the x1.3 the
        # injection introduced (>5x shrink of the log-scale error)
        r_before = _segment_scale_ratio(before, kc, poses_gt)
        err_pre = abs(np.log(
            _segment_scale_ratio(pre, kc, poses_gt) / r_before
        ))
        err_post = abs(np.log(
            _segment_scale_ratio(post, kc, poses_gt)
        ))
        assert err_post < err_pre / 5.0, (
            f"scale error {err_pre:.3f} -> {err_post:.3f} (need >5x shrink)"
        )
