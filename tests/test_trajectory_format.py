"""Trajectory format compatibility with the reference's golden outputs.

The reference ships 85 golden trajectory files (result/*.txt, TUM format
written at src/System.cpp:289). Our loader must parse them and our writer
must produce files with identical structure, so result_analysis-style
tooling works across both engines.
"""

import os

import numpy as np
import pytest

from orbslam2_tpu.evaluation.ate import ate_rmse, load_tum_trajectory

REF_RESULT = "/root/reference/result"


@pytest.mark.skipif(
    not os.path.isdir(REF_RESULT), reason="reference result/ not mounted"
)
class TestReferenceGoldenFiles:
    def test_parse_golden_online(self):
        t = load_tum_trajectory(os.path.join(REF_RESULT, "CameraTrajectory_MH01_1.txt"))
        assert t.shape[0] > 3000 and t.shape[1] == 8
        # timestamps increase, quaternions normalized
        assert np.all(np.diff(t[:, 0]) > 0)
        np.testing.assert_allclose(
            np.linalg.norm(t[:, 4:8], axis=1), 1.0, atol=1e-4
        )

    def test_parse_golden_offline(self):
        t = load_tum_trajectory(
            os.path.join(REF_RESULT, "OfflineCameraTrajectory_MH01_1.txt")
        )
        assert t.shape[1] == 8

    def test_cross_run_consistency_metric(self):
        """Two golden runs of the same sequence should agree to a few cm —
        sanity check that our ATE metric behaves on real trajectories."""
        t1 = load_tum_trajectory(os.path.join(REF_RESULT, "CameraTrajectory_MH01_1.txt"))
        t2 = load_tum_trajectory(os.path.join(REF_RESULT, "CameraTrajectory_MH01_2.txt"))
        n = min(len(t1), len(t2))
        rmse = ate_rmse(t1[:n, 1:4], t2[:n, 1:4])
        assert rmse < 0.10, f"golden runs disagree by {rmse:.3f} m"

    def test_our_writer_matches_golden_structure(self, tmp_path):
        """A trajectory written by our saver must round-trip through the
        same parser with the same column structure as the golden files."""
        from orbslam2_tpu.slam import trajectory as traj_mod
        from orbslam2_tpu.slam.map import SlamMap
        from orbslam2_tpu.slam.tracking import TrajectoryEntry

        m = SlamMap(n_kp=10)
        m.kf_pose[0] = np.eye(4, dtype=np.float32)
        m.kf_valid.add(0)
        entries = []
        for i in range(5):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [0.1 * i, 0, 0]
            entries.append(TrajectoryEntry(T, 0, 1403636579.76 + i * 0.05, False, T))
        p = str(tmp_path / "traj.txt")
        traj_mod.save_lines(p, traj_mod.trajectory_tum(entries, m))
        ours = load_tum_trajectory(p)
        golden = load_tum_trajectory(
            os.path.join(REF_RESULT, "CameraTrajectory_MH01_1.txt")
        )
        assert ours.shape[1] == golden.shape[1] == 8
        assert ours.dtype == golden.dtype
