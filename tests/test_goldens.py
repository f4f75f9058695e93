"""Exercise the evaluation pipeline on the reference's REAL golden
trajectories (/root/reference/result/ — 82 EuRoC runs, SURVEY §4).

No EuRoC ground truth ships in this environment, but the goldens provide
mutual ground truth: the online trajectory vs the offline (keyframe-
relative, post-BA) reconstruction of the SAME run must agree closely,
and two independent runs of the same sequence must agree after alignment
(the reference replicates 4 runs per sequence precisely because RANSAC
makes them differ slightly, result_analysis.py workflow)."""

import os

import numpy as np
import pytest

from orbslam2_tpu.evaluation import analyze
from orbslam2_tpu.evaluation.ate import (
    associate_by_time,
    ate_mean_abs,
    ate_rmse,
    load_tum_trajectory,
)

RESULT_DIR = "/root/reference/result"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RESULT_DIR), reason="reference goldens not mounted"
)


def _pair(seq, run):
    on = load_tum_trajectory(f"{RESULT_DIR}/CameraTrajectory_{seq}_{run}.txt")
    off = load_tum_trajectory(
        f"{RESULT_DIR}/OfflineCameraTrajectory_{seq}_{run}.txt"
    )
    return on, off


class TestGoldenTrajectories:
    @pytest.mark.parametrize("seq", ["MH01", "V102", "V201"])
    def test_online_vs_offline_same_run(self, seq):
        """Online poses vs the post-BA offline reconstruction of the same
        run: same frame timestamps, small ATE (the BA correction)."""
        on, off = _pair(seq, 1)
        assert len(on) > 1000 and len(off) > 1000
        ia, ib = associate_by_time(on[:, 0], off[:, 0], 0.005)
        assert len(ia) > 0.9 * min(len(on), len(off))
        mean_abs, std = ate_mean_abs(on[ia, 1:4], off[ib, 1:4])
        rmse = ate_rmse(on[ia, 1:4], off[ib, 1:4])
        # same run, same frame: difference is the mapping/loop correction
        assert 0.0 <= mean_abs < 0.5, f"{seq}: mean abs {mean_abs:.3f} m"
        assert rmse < 0.5, f"{seq}: RMSE {rmse:.3f} m"

    def test_two_runs_agree_after_alignment(self):
        """Two independent runs of MH01 (nondeterministic RANSAC) must
        still describe the same trajectory after Umeyama alignment."""
        on1, _ = _pair("MH01", 1)
        on2, _ = _pair("MH01", 2)
        ia, ib = associate_by_time(on1[:, 0], on2[:, 0], 0.005)
        assert len(ia) > 3000
        rmse = ate_rmse(on1[ia, 1:4], on2[ib, 1:4])
        assert rmse < 0.3, f"cross-run RMSE {rmse:.3f} m"

    def test_analyze_cli_on_goldens(self, capsys):
        """The analyze CLI (reference result_analysis.py analog) runs on
        real golden files end-to-end."""
        rc = analyze.main(
            [
                f"{RESULT_DIR}/CameraTrajectory_MH01_1.txt",
                f"{RESULT_DIR}/OfflineCameraTrajectory_MH01_1.txt",
                "--max-dt", "0.005",
            ]
        )
        out = capsys.readouterr().out
        assert rc == 0
        assert "mean abs trajectory error" in out
        assert "ATE RMSE" in out

    def test_full_golden_coverage_loads(self):
        """All 82 golden files parse into valid TUM trajectories."""
        files = sorted(os.listdir(RESULT_DIR))
        assert len(files) == 82
        for f in files[::7]:  # sample across sequences
            tr = load_tum_trajectory(os.path.join(RESULT_DIR, f))
            assert tr.shape[1] == 8 and len(tr) > 500
            # normalized quaternions
            qn = np.linalg.norm(tr[:, 4:8], axis=1)
            assert np.abs(qn - 1.0).max() < 1e-3
