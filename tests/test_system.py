"""System facade: public API, trajectory export, checkpoint roundtrip."""

import os

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.datasets.synthetic import SyntheticWorld
from orbslam2_tpu.evaluation.ate import load_tum_trajectory
from orbslam2_tpu.slam.system import Sensor, System
from orbslam2_tpu.slam.tracking import TrackingState
from orbslam2_tpu.vocab import train


@pytest.fixture(scope="module")
def system_run():
    world = SyntheticWorld(n_points=900, seed=5, baseline=0.2)
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=1000),
    )
    rng = np.random.default_rng(0)
    voc = train.train_vocabulary(
        rng.integers(0, 256, (2000, 32), dtype=np.uint8), k=6, depth=3,
        doc_ids=np.repeat(np.arange(20), 100),
    )
    sys_ = System(voc, cfg, Sensor.STEREO)
    poses_gt, frames = world.render_sequence(25, step=0.06)
    for i, (imL, imR) in enumerate(frames):
        sys_.track_stereo(imL, imR, i / 20.0)
    return sys_, poses_gt


class TestSystem:
    def test_tracks(self, system_run):
        sys_, _ = system_run
        assert sys_.get_tracking_state() == TrackingState.OK
        assert len(sys_.get_tracked_map_points()) > 50

    def test_trajectory_files(self, system_run, tmp_path):
        sys_, _ = system_run
        for name, fn in [
            ("traj.txt", sys_.save_trajectory_tum),
            ("offline.txt", sys_.save_offline_trajectory_tum),
            ("kf.txt", sys_.save_keyframe_trajectory_tum),
            ("kitti.txt", sys_.save_trajectory_kitti),
        ]:
            p = str(tmp_path / name)
            fn(p)
            assert os.path.getsize(p) > 0
        t = load_tum_trajectory(str(tmp_path / "traj.txt"))
        assert t.shape[0] == 25 and t.shape[1] == 8
        # quaternions normalized
        qn = np.linalg.norm(t[:, 4:8], axis=1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-5)
        with open(tmp_path / "kitti.txt") as f:
            rows = [line.split() for line in f if line.strip()]
        assert len(rows) == 25 and all(len(r) == 12 for r in rows)

    def test_offline_starts_at_origin(self, system_run, tmp_path):
        sys_, _ = system_run
        p = str(tmp_path / "off.txt")
        sys_.save_offline_trajectory_tum(p)
        t = load_tum_trajectory(p)
        np.testing.assert_allclose(t[0, 1:4], 0.0, atol=1e-4)

    def test_checkpoint_roundtrip(self, system_run, tmp_path):
        sys_, _ = system_run
        p = str(tmp_path / "map.npz")
        sys_.save_map(p)
        from orbslam2_tpu.slam.map import SlamMap

        m2 = SlamMap(sys_.config.orb.n_features)
        from orbslam2_tpu.slam import checkpoint

        checkpoint.load_map(m2, p)
        assert m2.kf_valid == sys_.map.kf_valid
        assert m2.pt_valid == sys_.map.pt_valid
        k = next(iter(m2.kf_valid))
        np.testing.assert_allclose(m2.kf_pose[k], sys_.map.kf_pose[k])
        pid = next(iter(m2.pt_valid))
        np.testing.assert_allclose(m2.pt_pos[pid], sys_.map.pt_pos[pid])
        assert m2.pt_obs[pid] == sys_.map.pt_obs[pid]

    def test_localization_mode(self, system_run):
        sys_, _ = system_run
        sys_.activate_localization_mode()
        assert sys_.tracker.only_tracking
        n_kf = sys_.map.n_keyframes()
        world = SyntheticWorld(n_points=900, seed=5, baseline=0.2)
        # continue the trajectory past the mapped region: tracking must
        # survive on map matches + visual-odometry temporal points
        poses = world.trajectory(34, step=0.06)[25:]
        ok = 0
        for i, T in enumerate(poses):
            imL, imR = world.render_stereo(T)
            if sys_.track_stereo(imL, imR, 100 + i / 20.0) is not None:
                ok += 1
        assert ok >= len(poses) - 1, f"localization mode lost tracking ({ok})"
        assert sys_.map.n_keyframes() == n_kf  # no new keyframes
        sys_.deactivate_localization_mode()

    def test_timing_report(self, system_run):
        sys_, _ = system_run
        report = sys_.shutdown()
        assert "Total tracking" in report


class TestViewer:
    def test_map_snapshot_and_frame_drawing(self, system_run, tmp_path):
        from orbslam2_tpu.slam.viewer import Viewer

        sys_, _ = system_run
        v = Viewer(sys_)
        p = str(tmp_path / "map.png")
        v.save(p)
        assert os.path.getsize(p) > 5000
        img = v.draw_frame()
        assert img is not None and img.shape[2] == 3
        # tracked features are marked in green
        assert (img[..., 1] == 255).sum() > 50

    def test_frame_drawer_status_and_map_drawer(self, system_run, tmp_path):
        from orbslam2_tpu.slam.viewer import FrameDrawer, MapDrawer

        sys_, _ = system_run
        fd = FrameDrawer(sys_)
        fd.update()
        txt = fd.status_text()
        assert "SLAM MODE" in txt and "KFs:" in txt and "Matches:" in txt
        md = MapDrawer(sys_)
        lf = sys_.tracker.last_frame
        md.set_current_camera_pose(lf.Tcw)
        p = str(tmp_path / "map_full.png")
        md.save(p)
        assert os.path.getsize(p) > 5000
        # toggles change output (points off => smaller file)
        p2 = str(tmp_path / "map_nopoints.png")
        md.save(p2, show_points=False)
        assert os.path.getsize(p2) < os.path.getsize(p)


class TestTrackStereoReturnContract:
    """What track_stereo returns in each mode (VERDICT r3 weak #7).

    Reference contract: TrackStereo returns the frame's SOLVED pose
    (src/System.cpp:90-142). The synchronous (default) mode keeps that
    contract exactly. Pipelined mode trades it for latency hiding: the
    return value is the motion-model PREDICTION for the new frame while
    the solved pose lands in the trajectory one frame later (documented
    in System.track_stereo / config.pipelined_tracking)."""

    def _run(self, pipelined):
        world = SyntheticWorld(n_points=900, seed=5, baseline=0.2)
        cfg = SlamConfig(
            camera=CameraConfig(
                fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                bf=world.bf, width=world.width, height=world.height,
                fps=20.0,
            ),
            orb=OrbConfig(n_features=1000),
            pipelined_tracking=pipelined,
        )
        sys_ = System(None, cfg, Sensor.STEREO)
        poses_gt, frames = world.render_sequence(12, step=0.06)
        rets = []
        for i, (imL, imR) in enumerate(frames):
            rets.append(sys_.track_stereo(imL, imR, i / 20.0))
        return sys_, rets

    def test_sync_mode_returns_solved_pose(self):
        sys_, rets = self._run(pipelined=False)
        traj = sys_.tracker.trajectory
        assert len(traj) == len(rets)
        # the returned pose IS the recorded (solved) pose, bit-for-bit
        for r, e in zip(rets[1:], traj[1:]):
            if r is not None and e.Tcw is not None:
                np.testing.assert_array_equal(r, e.Tcw)

    def test_pipelined_mode_returns_prediction(self):
        sys_, rets = self._run(pipelined=True)
        sys_.tracker.flush_pipeline()
        traj = sys_.tracker.trajectory
        # every frame still gets a trajectory entry with a SOLVED pose
        assert len(traj) == len(rets)
        solved = [e for e in traj if e.Tcw is not None and not e.lost]
        assert len(solved) >= len(rets) - 2
        # while the pipeline is engaged the return value is the motion
        # prediction: a finite [4,4] rigid transform, generally NOT equal
        # to the solved pose recorded later
        engaged = [
            (r, e) for r, e in zip(rets, traj)
            if r is not None and e.Tcw is not None and not e.lost
        ]
        assert engaged, "no frames returned a pose"
        for r, e in engaged:
            assert np.all(np.isfinite(r)) and r.shape == (4, 4)


class TestLiveViewer:
    """Live viewer thread (reference Viewer::Run, src/Viewer.cpp:32-113):
    System(use_viewer=True) spawns a background render loop producing
    in-memory frame buffers while tracking runs."""

    def test_live_viewer_renders_during_tracking(self, tmp_path):
        world = SyntheticWorld(n_points=900, seed=5, baseline=0.2)
        cfg = SlamConfig(
            camera=CameraConfig(
                fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                bf=world.bf, width=world.width, height=world.height,
                fps=20.0,
            ),
            orb=OrbConfig(n_features=1000),
        )
        sys_ = System(None, cfg, Sensor.STEREO, use_viewer=True)
        sys_.viewer.out_dir = str(tmp_path)
        poses_gt, frames = world.render_sequence(10, step=0.06)
        for i, (imL, imR) in enumerate(frames):
            sys_.track_stereo(imL, imR, i / 20.0)
        import time as _t

        t0 = _t.monotonic()
        while sys_.viewer.n_live_renders < 2 and _t.monotonic() - t0 < 60:
            _t.sleep(0.2)
        sys_.shutdown()
        assert sys_.viewer.live_error is None
        assert sys_.viewer.n_live_renders >= 2
        assert sys_.viewer.latest_map is not None
        assert sys_.viewer.latest_map.ndim == 3
        assert sys_.viewer.latest_frame is not None
        assert os.path.exists(os.path.join(str(tmp_path), "live_map.png"))

    def test_live_viewer_menu_controls(self):
        """Runtime menu controls (reference Viewer.cpp:46-52 Pangolin
        menus): localization-mode switch, reset, follow-camera and the
        show toggles are applied BY the live render loop."""
        world = SyntheticWorld(n_points=900, seed=5, baseline=0.2)
        cfg = SlamConfig(
            camera=CameraConfig(
                fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                bf=world.bf, width=world.width, height=world.height,
                fps=20.0,
            ),
            orb=OrbConfig(n_features=1000),
        )
        sys_ = System(None, cfg, Sensor.STEREO, use_viewer=True)
        poses_gt, frames = world.render_sequence(8, step=0.06)
        for i, (imL, imR) in enumerate(frames):
            sys_.track_stereo(imL, imR, i / 20.0)
        v = sys_.viewer
        import time as _t

        # menuLocalizationMode ON: the render loop must flip the tracker
        v.set_localization_mode(True)
        t0 = _t.monotonic()
        while not sys_.tracker.only_tracking and _t.monotonic() - t0 < 30:
            _t.sleep(0.1)
        assert sys_.tracker.only_tracking, "viewer loop must apply the menu"
        assert sys_.local_mapper.is_stopped()
        v.set_localization_mode(False)
        t0 = _t.monotonic()
        while sys_.tracker.only_tracking and _t.monotonic() - t0 < 30:
            _t.sleep(0.1)
        assert not sys_.tracker.only_tracking

        # follow-camera + show toggles are consumed by the next render
        v.set_follow_camera(True)
        v.set_show(points=False, graph=False)
        n0 = v.n_live_renders
        t0 = _t.monotonic()
        while v.n_live_renders <= n0 + 1 and _t.monotonic() - t0 < 60:
            _t.sleep(0.2)
        assert v.live_error is None
        assert v.n_live_renders > n0

        # menuReset: full system reset from the UI thread
        v.request_reset()
        t0 = _t.monotonic()
        while sys_.map.n_keyframes() > 0 and _t.monotonic() - t0 < 30:
            _t.sleep(0.1)
        assert sys_.map.n_keyframes() == 0
        sys_.shutdown()
