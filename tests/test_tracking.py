"""End-to-end stereo odometry on the synthetic world (tracking front-end
without local mapping — the minimum slice of SURVEY.md §7 step 4)."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.evaluation.ate import ate_rmse
from orbslam2_tpu.slam.frontend import Frontend
from orbslam2_tpu.slam.map import SlamMap
from orbslam2_tpu.slam.tracking import Tracker, TrackingState


@pytest.fixture(scope="module")
def synthetic_run():
    world = SyntheticWorld(n_points=900, seed=7, baseline=0.2)
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=1200),
    )
    frontend = Frontend(cfg)
    slam_map = SlamMap(cfg.orb.n_features)
    tracker = Tracker(cfg, frontend, slam_map)

    n_frames = 40
    poses_gt, frames = world.render_sequence(n_frames, step=0.06)
    est = []
    for i, (imL, imR) in enumerate(frames):
        Tcw = tracker.track(imL, imR, timestamp=i / 20.0)
        est.append(Tcw)
    return world, tracker, poses_gt, est


class TestStereoOdometry:
    def test_initializes_and_stays_ok(self, synthetic_run):
        _, tracker, _, est = synthetic_run
        assert tracker.state == TrackingState.OK
        n_tracked = sum(1 for T in est if T is not None)
        assert n_tracked >= len(est) - 1, f"lost tracking: {n_tracked}/{len(est)}"

    def test_ate_small(self, synthetic_run):
        _, _, poses_gt, est = synthetic_run
        pairs = [(g, e) for g, e in zip(poses_gt, est) if e is not None]
        gt_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in pairs])
        est_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T in pairs])
        rmse = ate_rmse(est_xyz, gt_xyz)
        # ~2.4 m of travel; odometry without BA should stay within a few cm
        assert rmse < 0.06, f"ATE RMSE {rmse:.4f} m"

    def test_keyframes_created(self, synthetic_run):
        _, tracker, _, _ = synthetic_run
        assert tracker.map.n_keyframes() >= 2

    def test_map_points_live(self, synthetic_run):
        _, tracker, _, _ = synthetic_run
        assert len(tracker.map.pt_valid) > 300

    def test_trajectory_recorded(self, synthetic_run):
        _, tracker, _, est = synthetic_run
        assert len(tracker.trajectory) == len(est)
        # reference keyframes of trajectory entries must exist
        for e in tracker.trajectory:
            assert e.ref_kf in tracker.map.kf_pose
