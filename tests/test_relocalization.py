"""Relocalization after tracking loss ("kidnapped" camera)."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.slam.frontend import Frontend
from orbslam2_tpu.slam.local_mapping import LocalMapper
from orbslam2_tpu.slam.map import SlamMap
from orbslam2_tpu.slam.relocalization import Relocalizer
from orbslam2_tpu.slam.tracking import Tracker, TrackingState
from orbslam2_tpu.vocab import train


@pytest.fixture(scope="module")
def slam_with_reloc():
    world = SyntheticWorld(n_points=900, seed=13, baseline=0.2)
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
    tracker.local_mapper = LocalMapper(cfg, frontend, slam_map)

    poses_gt, frames = world.render_sequence(35, step=0.06)
    for i, (imL, imR) in enumerate(frames):
        tracker.track(imL, imR, i / 20.0)
    assert tracker.state == TrackingState.OK

    # train a vocabulary from this run's descriptors and index the keyframes
    descs, docs = [], []
    for kf in slam_map.kf_valid:
        f = slam_map.kf_frame[kf]
        d = f.desc[f.valid][:400]
        descs.append(np.ascontiguousarray(d).view(np.uint8))
        docs.append(np.full(len(d), kf))
    voc = train.train_vocabulary(
        np.concatenate(descs), k=8, depth=3,
        doc_ids=np.concatenate(docs),
    )
    reloc = Relocalizer(cfg, frontend, slam_map, voc)
    for kf in sorted(slam_map.kf_valid):
        reloc.add_keyframe(kf)
    tracker.relocalizer = reloc
    return world, cfg, tracker, poses_gt, frames


class TestRelocalization:
    def test_recovers_after_kidnap(self, slam_with_reloc):
        world, cfg, tracker, poses_gt, frames = slam_with_reloc
        # kidnap: force LOST, then show a view from the middle of the run
        tracker.state = TrackingState.LOST
        tracker.velocity = None
        target_idx = 16
        imL, imR = frames[target_idx]
        Tcw = tracker.track(imL, imR, 99.0)
        assert tracker.state == TrackingState.OK, "relocalization failed"
        # pose close to the ground truth of that view
        T_gt = poses_gt[target_idx]
        C_est = -Tcw[:3, :3].T @ Tcw[:3, 3]
        C_gt = -T_gt[:3, :3].T @ T_gt[:3, 3]
        assert np.linalg.norm(C_est - C_gt) < 0.1, np.linalg.norm(C_est - C_gt)

    def test_mlpnp_relocalization(self, slam_with_reloc):
        """BASELINE config 4: the MLPnP relocalization path."""
        world, cfg, tracker, poses_gt, frames = slam_with_reloc
        from orbslam2_tpu.slam.relocalization import Relocalizer
        from orbslam2_tpu.slam.tracking import TrackingState

        reloc2 = Relocalizer(
            cfg, tracker.frontend, tracker.map, tracker.relocalizer.vocab,
            solver="mlpnp",
        )
        reloc2.database = tracker.relocalizer.database  # reuse the index
        old = tracker.relocalizer
        tracker.relocalizer = reloc2
        tracker.state = TrackingState.LOST
        tracker.velocity = None
        imL, imR = frames[20]
        Tcw = tracker.track(imL, imR, 123.0)
        tracker.relocalizer = old
        assert tracker.state == TrackingState.OK, "MLPnP relocalization failed"
        T_gt = poses_gt[20]
        C_est = -Tcw[:3, :3].T @ Tcw[:3, 3]
        C_gt = -T_gt[:3, :3].T @ T_gt[:3, 3]
        assert np.linalg.norm(C_est - C_gt) < 0.15

    def test_database_contains_keyframes(self, slam_with_reloc):
        _, _, tracker, _, _ = slam_with_reloc
        db = tracker.relocalizer.database
        assert len(db.kf_words) >= tracker.map.n_keyframes()
