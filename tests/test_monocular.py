"""Monocular pipeline: two-view initialization + tracking + mapping
(BASELINE config 3 capability)."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.evaluation.ate import ate_rmse
from orbslam2_tpu.slam.frontend import Frontend
from orbslam2_tpu.slam.local_mapping import LocalMapper
from orbslam2_tpu.slam.map import SlamMap
from orbslam2_tpu.slam.tracking import Tracker, TrackingState


@pytest.fixture(scope="module")
def mono_run():
    world = SyntheticWorld(n_points=1200, seed=31, depth_range=(4.0, 10.0))
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=1200),
        sensor="monocular",
    )
    frontend = Frontend(cfg)
    m = SlamMap(cfg.orb.n_features)
    tracker = Tracker(cfg, frontend, m)
    tracker.local_mapper = LocalMapper(cfg, frontend, m)

    poses = []
    for i in range(35):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = -np.array([0.06 * i, 0.01 * np.sin(0.3 * i), 0.015 * i])
        poses.append(T)
    est = []
    for i, T in enumerate(poses):
        imL, _ = world.render_stereo(T)
        est.append(tracker.track_mono(imL, i / 20.0))
    return tracker, m, poses, est


class TestMonocular:
    def test_initializes_and_tracks(self, mono_run):
        tracker, m, poses, est = mono_run
        assert tracker.state == TrackingState.OK
        n_tracked = sum(e is not None for e in est)
        assert n_tracked >= len(est) - 5  # first frames burn on initialization

    def test_no_stereo_observations(self, mono_run):
        _, m, _, _ = mono_run
        for kf in m.kf_valid:
            assert np.all(m.kf_frame[kf].u_right < 0)

    def test_map_grows_by_triangulation(self, mono_run):
        _, m, _, _ = mono_run
        assert len(m.pt_valid) > 400

    def test_scale_aligned_ate(self, mono_run):
        _, _, poses, est = mono_run
        pairs = [(g, e) for g, e in zip(poses, est) if e is not None]
        gt = np.stack([-T[:3, :3].T @ T[:3, 3] for T, _ in pairs])
        es = np.stack([-T[:3, :3].T @ T[:3, 3] for _, T in pairs])
        # monocular is up-to-scale: align with similarity transform
        rmse = ate_rmse(es, gt, with_scale=True)
        assert rmse < 0.06, f"scale-aligned ATE {rmse:.4f}"

    def test_median_initial_depth_near_unit(self, mono_run):
        """Scale normalization: map starts at ~unit median depth."""
        _, m, _, _ = mono_run
        k0 = min(m.kf_pose.keys())
        T = m.kf_pose[k0].astype(np.float64)
        zs = [
            (T[:3, :3] @ m.pt_pos[p] + T[:3, 3])[2]
            for p in list(m.pt_valid)[:200]
        ]
        # after BA + growth this drifts, but must stay O(1), not metric O(7m)
        assert 0.2 < np.median(zs) < 5.0
