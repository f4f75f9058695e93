"""Full-pipeline loop closure on a circuit world (SURVEY.md §7 step 7)."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.evaluation.ate import ate_rmse
from orbslam2_tpu.slam.frontend import Frontend
from orbslam2_tpu.slam.local_mapping import LocalMapper
from orbslam2_tpu.slam.loop_closing import LoopCloser
from orbslam2_tpu.slam.map import SlamMap
from orbslam2_tpu.slam.relocalization import Relocalizer
from orbslam2_tpu.slam.tracking import Tracker, TrackingState
from orbslam2_tpu.vocab import train


@pytest.fixture(scope="module")
def circuit_run():
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
    frontend = Frontend(cfg)

    # pretrain a vocabulary from sample views
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

    slam_map = SlamMap(cfg.orb.n_features)
    tracker = Tracker(cfg, frontend, slam_map)
    mapper = LocalMapper(cfg, frontend, slam_map)
    tracker.local_mapper = mapper
    reloc = Relocalizer(cfg, frontend, slam_map, voc)
    tracker.relocalizer = reloc
    closer = LoopCloser(cfg, frontend, slam_map, reloc, local_mapper=mapper)
    mapper.on_processed = closer.insert_keyframe

    n_frames = 150
    poses_gt = world.trajectory_circuit(n_frames)
    est = []
    for i, T in enumerate(poses_gt):
        imL, imR = world.render_stereo(T)
        est.append(tracker.track(imL, imR, i / 20.0))
    return world, tracker, closer, poses_gt, est


class TestLoopClosing:
    def test_full_circuit_tracked(self, circuit_run):
        _, tracker, _, _, est = circuit_run
        assert tracker.state == TrackingState.OK
        assert sum(e is not None for e in est) == len(est)

    def test_loop_detected_and_closed(self, circuit_run):
        _, _, closer, _, _ = circuit_run
        assert closer.n_loops_closed >= 1, "no loop closure fired on the circuit"

    def test_loop_edge_recorded(self, circuit_run):
        _, tracker, closer, _, _ = circuit_run
        n_edges = sum(len(v) for v in tracker.map.loop_edges.values())
        assert n_edges >= 2  # symmetric pair

    def test_ate_after_loop(self, circuit_run):
        _, _, _, poses_gt, est = circuit_run
        pairs = [(g, e) for g, e in zip(poses_gt, est) if e is not None]
        gt_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in pairs])
        est_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T in pairs])
        rmse = ate_rmse(est_xyz, gt_xyz)
        # ~69 m circuit; after loop closure drift must stay bounded
        assert rmse < 0.30, f"ATE RMSE {rmse:.3f} m"
