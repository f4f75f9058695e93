"""End-to-end with local mapping + local BA (SURVEY.md §7 steps 5)."""

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
def mapped_run():
    world = SyntheticWorld(n_points=900, seed=11, baseline=0.2)
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
    mapper = LocalMapper(cfg, frontend, slam_map)
    tracker.local_mapper = mapper

    n_frames = 45
    poses_gt, frames = world.render_sequence(n_frames, step=0.06)
    est = [tracker.track(imL, imR, i / 20.0) for i, (imL, imR) in enumerate(frames)]
    return world, tracker, mapper, poses_gt, est


class TestLocalMapping:
    def test_stays_ok_with_mapping(self, mapped_run):
        _, tracker, _, _, est = mapped_run
        assert tracker.state == TrackingState.OK
        assert sum(e is not None for e in est) == len(est)

    def test_ate_with_ba(self, mapped_run):
        _, _, _, poses_gt, est = mapped_run
        pairs = [(g, e) for g, e in zip(poses_gt, est) if e is not None]
        gt_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in pairs])
        est_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T in pairs])
        rmse = ate_rmse(est_xyz, gt_xyz)
        assert rmse < 0.05, f"ATE RMSE {rmse:.4f} m"

    def test_triangulation_grows_map(self, mapped_run):
        """Local mapping must create points beyond the per-KF stereo init."""
        _, tracker, mapper, _, _ = mapped_run
        assert mapper.n_processed >= 2
        # triangulated points carry 2+ keyframe observations
        multi_obs = sum(
            1 for p in tracker.map.pt_valid if len(tracker.map.pt_obs[p]) >= 2
        )
        assert multi_obs > 200, f"only {multi_obs} multi-observation points"

    def test_covisibility_graph_connected(self, mapped_run):
        _, tracker, _, _, _ = mapped_run
        m = tracker.map
        for kf in m.kf_valid:
            if kf == 0:
                continue
            assert m.covis.get(kf), f"kf {kf} isolated in covisibility graph"
            assert kf in m.parent, f"kf {kf} missing spanning-tree parent"


class TestDeferredMapping:
    def test_pipeline_mode_tracks(self):
        """Deferred (pipelined) mapping — one queued keyframe processed per
        tracked frame, the host analog of the reference's mapping thread."""
        world = SyntheticWorld(n_points=900, seed=17, baseline=0.2)
        cfg = SlamConfig(
            camera=CameraConfig(
                fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                bf=world.bf, width=world.width, height=world.height, fps=20.0,
            ),
            orb=OrbConfig(n_features=1000),
        )
        frontend = Frontend(cfg)
        m = SlamMap(cfg.orb.n_features)
        tracker = Tracker(cfg, frontend, m)
        tracker.local_mapper = LocalMapper(cfg, frontend, m, deferred=True)
        poses, frames = world.render_sequence(30, step=0.06)
        est = [tracker.track(imL, imR, i / 20.0) for i, (imL, imR) in enumerate(frames)]
        assert sum(e is not None for e in est) == 30
        assert tracker.local_mapper.n_processed >= 2
        pairs = [(g, e) for g, e in zip(poses, est) if e is not None]
        gt = np.stack([-T[:3, :3].T @ T[:3, 3] for T, _ in pairs])
        es = np.stack([-T[:3, :3].T @ T[:3, 3] for _, T in pairs])
        assert ate_rmse(es, gt) < 0.08
