"""End-to-end EuRoC disk-format drive (VERDICT r4 task 6).

The reference's most-exercised code path is its stereo_euroc main loop
(reference Examples/Stereo/stereo_euroc.cc:121-184): read PNGs from
mav0/cam{0,1}/data by timestamp list, rectify via the YAML's LEFT./RIGHT.
K/D/R/P blocks, and TrackStereo each pair. This test writes a synthetic
sequence in exactly that on-disk format (PNG dirs + ns-timestamp file +
OpenCV-style YAML) and drives the REAL CLI (examples/run_euroc.py main())
through EurocSequence + the rectifier, asserting the trajectory it saves
matches ground truth.
"""

import os
import sys

import numpy as np
import pytest

from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.evaluation.ate import ate_rmse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

YAML_TEMPLATE = """%YAML:1.0

Camera.fx: {fx}
Camera.fy: {fy}
Camera.cx: {cx}
Camera.cy: {cy}

Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0

Camera.width: {w}
Camera.height: {h}

Camera.fps: 20.0
Camera.bf: {bf}
Camera.RGB: 1

ThDepth: 35

LEFT.height: {h}
LEFT.width: {w}
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [0.0, 0.0, 0.0, 0.0, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [{fx}, 0.0, {cx}, 0.0, {fy}, {cy}, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [{fx}, 0.0, {cx}, 0.0, 0.0, {fy}, {cy}, 0.0, 0.0, 0.0, 1.0, 0.0]

RIGHT.height: {h}
RIGHT.width: {w}
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [0.0, 0.0, 0.0, 0.0, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [{fx}, 0.0, {cx}, 0.0, {fy}, {cy}, 0.0, 0.0, 1.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [{fx}, 0.0, {cx}, 0.0, 0.0, {fy}, {cy}, 0.0, 0.0, 0.0, 1.0, 0.0]

ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


@pytest.fixture(scope="module")
def euroc_dirs(tmp_path_factory):
    """A synthetic sequence written in the EuRoC on-disk layout."""
    import cv2

    root = tmp_path_factory.mktemp("euroc_synth")
    left = root / "mav0" / "cam0" / "data"
    right = root / "mav0" / "cam1" / "data"
    left.mkdir(parents=True)
    right.mkdir(parents=True)

    world = SyntheticWorld(n_points=900, seed=5)
    n_frames = 45
    poses = world.trajectory(n_frames, step=0.12)
    t0_ns = 1403636579763555584  # EuRoC-style epoch-ns stamps
    stamps = []
    for i, T in enumerate(poses):
        imL, imR = world.render_stereo(T)
        ns = t0_ns + int(round(i * 0.05 * 1e9))
        stamps.append(ns)
        assert cv2.imwrite(
            str(left / f"{ns}.png"), np.clip(imL, 0, 255).astype(np.uint8)
        )
        assert cv2.imwrite(
            str(right / f"{ns}.png"), np.clip(imR, 0, 255).astype(np.uint8)
        )
    times_file = root / "times.txt"
    times_file.write_text("".join(f"{ns}\n" for ns in stamps))

    yaml_file = root / "synth_euroc.yaml"
    yaml_file.write_text(
        YAML_TEMPLATE.format(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.fx * world.baseline, w=world.width, h=world.height,
        )
    )
    return root, left, right, times_file, yaml_file, poses, stamps


def _load_tum(path):
    rows = np.loadtxt(path)
    return rows[:, 0], rows[:, 1:4]


class TestEurocDiskPath:
    def test_cli_tracks_and_saves_trajectories(self, euroc_dirs):
        root, left, right, times_file, yaml_file, poses, stamps = euroc_dirs
        sys.path.insert(0, os.path.join(REPO, "examples"))
        import run_euroc

        # a tiny vocabulary is enough (relocalization/loop dbs unused in a
        # 60-frame forward run); the generic production vocab when present
        voc = os.path.join(REPO, "assets", "vocab_generic.npz")
        if not os.path.exists(voc):
            voc = os.path.join(REPO, "assets", "vocab_circuit.npz")
        out_prefix = str(root) + "/"
        rc = run_euroc.main([
            "run_euroc.py", voc, str(yaml_file), str(left), str(right),
            str(times_file), out_prefix,
        ])
        assert rc == 0

        # the CLI saved the reference's three trajectory files
        t, xyz = _load_tum(out_prefix + "CameraTrajectory.txt")
        assert len(t) == len(poses), "every frame must be tracked"
        # timestamps round-trip through the ns list (seconds)
        np.testing.assert_allclose(
            t, np.asarray(stamps, np.float64) / 1e9, rtol=0, atol=5e-4
        )

        gt = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T in poses])
        rmse = ate_rmse(xyz, gt)
        assert rmse < 0.10, f"disk-path ATE {rmse:.3f} m"

        t_off, xyz_off = _load_tum(out_prefix + "OfflineCameraTrajectory.txt")
        assert len(t_off) == len(poses)
        rmse_off = ate_rmse(xyz_off, gt)
        assert rmse_off < 0.10, f"offline disk-path ATE {rmse_off:.3f} m"
        assert os.path.exists(out_prefix + "KeyFrameTrajectory.txt")

    def test_rectifier_identity_maps_are_exercised(self, euroc_dirs):
        """The LEFT./RIGHT. blocks round-trip through cv2's
        initUndistortRectifyMap + remap (identity geometry => identical
        pixels, but the real rectification code path runs)."""
        root, left, right, times_file, yaml_file, *_ = euroc_dirs
        import cv2

        from orbslam2_tpu.config import load_config
        from orbslam2_tpu.datasets.euroc import EurocSequence, Rectifier

        cfg = load_config(str(yaml_file))
        assert cfg.rectify_left is not None and cfg.rectify_right is not None
        rect = Rectifier(cfg)
        assert rect.maps is not None, "rectifier must build maps from YAML"
        seq = EurocSequence(str(left), str(right), str(times_file), cfg)
        imL, imR, ts = seq[0]
        raw = cv2.imread(seq.left_paths[0], cv2.IMREAD_GRAYSCALE)
        assert np.max(np.abs(imL - raw.astype(np.float32))) <= 1.0
