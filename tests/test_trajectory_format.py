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

    def test_associate_cli_pairs_golden_runs(self, tmp_path, capsys):
        """associate.py (reference associate.py:73-108 contract) pairs two
        stamped files one-to-one at nearest timestamps."""
        from orbslam2_tpu.evaluation import associate as assoc

        first = assoc.read_file_list(
            os.path.join(REF_RESULT, "CameraTrajectory_MH01_1.txt")
        )
        second = assoc.read_file_list(
            os.path.join(REF_RESULT, "CameraTrajectory_MH01_2.txt")
        )
        matches = assoc.associate(first, second, offset=0.0, max_difference=0.02)
        assert len(matches) > 0.9 * min(len(first), len(second))
        # one-to-one
        assert len({a for a, _ in matches}) == len(matches)
        assert len({b for _, b in matches}) == len(matches)
        for a, b in matches[:100]:
            assert abs(a - b) < 0.02

    def test_associate_offset_and_greedy_order(self):
        """Offset shifts the second stream; greedy nearest-first wins ties
        exactly like the reference's sort-by-|dt| loop."""
        from orbslam2_tpu.evaluation.associate import associate

        first = {0.0: ["a"], 1.0: ["b"]}
        second = {0.26: ["x"], 1.24: ["y"]}
        # offset -0.25 aligns second onto first
        m = associate(first, second, offset=-0.25, max_difference=0.02)
        assert m == [(0.0, 0.26), (1.0, 1.24)]
        # without offset nothing is within 0.02
        assert associate(first, second, 0.0, 0.02) == []
        # two firsts compete for one second: nearest wins
        m = associate({0.0: ["a"], 0.015: ["b"]}, {0.014: ["x"]}, 0.0, 0.02)
        assert m == [(0.015, 0.014)]

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
