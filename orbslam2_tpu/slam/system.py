"""System facade: the public API of the SLAM engine.

Mirrors the reference System class (include/System.hpp:55-117,
src/System.cpp): construction wires the pipeline stages (vocabulary,
database, tracking, local mapping, loop closing), `track_stereo` is the
per-frame entry, plus localization-mode switching, reset, shutdown with
the timing report, and all four trajectory savers. The reference's three
stage threads become host-sequenced pipeline stages (SURVEY.md §2.3 P1);
the device owns every numeric kernel.
"""

from __future__ import annotations

import os

from ..config import SlamConfig, load_config
from ..vocab import bow as bow_mod
from .frontend import Frontend
from .local_mapping import LocalMapper
from .loop_closing import LoopCloser
from .map import SlamMap
from .relocalization import Relocalizer
from .timing import StageTimers
from .tracking import Tracker, TrackingState
from . import trajectory as traj_mod


class Sensor:
    STEREO = "stereo"
    MONOCULAR = "monocular"
    RGBD = "rgbd"  # accepted for API parity; stereo path is used


class System:
    """slam.System — drop-in analog of the reference's ORB_SLAM_CUSTOM::System."""

    def __init__(
        self,
        vocabulary,  # path to .npz/.txt vocabulary, or a Vocabulary, or None
        settings,  # path to an (OpenCV-style) YAML, or a SlamConfig
        sensor: str = Sensor.STEREO,
        use_viewer: bool = False,
        enable_loop_closing: bool = True,
        deferred_mapping: bool = False,
        threaded: bool = False,  # mapping/loop closing on a worker thread
        mesh=None,  # jax.sharding.Mesh: shard whole-map passes (GBA, pose graph)
    ):
        self.sensor = sensor
        self.config = settings if isinstance(settings, SlamConfig) else load_config(settings)
        self.config.sensor = "monocular" if sensor == Sensor.MONOCULAR else "stereo"


        if vocabulary is None:
            self.vocabulary = None
        elif isinstance(vocabulary, bow_mod.Vocabulary):
            self.vocabulary = vocabulary
        elif str(vocabulary).endswith(".npz"):
            self.vocabulary = bow_mod.load_npz(vocabulary)
        else:
            self.vocabulary = bow_mod.load_dbow2_text(vocabulary)

        self.frontend = Frontend(self.config)
        self.map = SlamMap(
            self.config.orb.n_features,
            self.config.orb.n_levels,
            self.config.orb.scale_factor,
        )
        self.tracker = Tracker(self.config, self.frontend, self.map)
        self.local_mapper = LocalMapper(
            self.config, self.frontend, self.map, deferred=deferred_mapping
        )
        self.tracker.local_mapper = self.local_mapper

        self.relocalizer = None
        self.loop_closer = None
        if self.vocabulary is not None:
            self.relocalizer = Relocalizer(
                self.config, self.frontend, self.map, self.vocabulary
            )
            self.tracker.relocalizer = self.relocalizer
            self.map.on_keyframe_removed = self.relocalizer.remove_keyframe
            if enable_loop_closing:
                self.loop_closer = LoopCloser(
                    self.config, self.frontend, self.map, self.relocalizer,
                    local_mapper=self.local_mapper,
                    fix_scale=(sensor != Sensor.MONOCULAR),
                    mesh=mesh,
                )
                self.local_mapper.on_processed = self.loop_closer.insert_keyframe
                self.loop_closer.on_pose_jump = self.tracker.apply_pose_jump
            else:
                self.local_mapper.on_processed = (
                    lambda kf: self.relocalizer.add_keyframe(kf)
                )

        self.timers = StageTimers()
        self.tracker.timers = self.timers
        self.local_mapper.timers = self.timers
        if self.loop_closer is not None:
            self.loop_closer.timers = self.timers

        # threaded pipeline: mapping and loop closing each drain on their
        # own worker thread (reference System.cpp:63-77 spawns separate
        # LocalMapping and LoopClosing threads); the tracker only ever
        # blocks on the map lock, never on a BA solve or a Sim3 search
        self.worker = None
        self.loop_worker = None
        if threaded:
            from .pipeline import LoopWorker, MappingWorker

            self.worker = MappingWorker(self.local_mapper)
            if self.loop_closer is not None:
                self.loop_worker = LoopWorker(self.loop_closer)
                self.local_mapper.on_processed = self.loop_worker.submit
        self.viewer = None
        if use_viewer:
            from .viewer import Viewer

            self.viewer = Viewer(self)
        self._localization_only = False

    # ------------------------------------------------------------------

    def track_stereo(self, im_left, im_right, timestamp: float):
        """Per-frame entry (reference System::TrackStereo, System.cpp:90-142).
        Returns Tcw [4,4] or None when tracking is lost."""
        with self.timers.span("Total tracking"):
            Tcw = self.tracker.track(im_left, im_right, timestamp)
        if self.viewer is not None:
            self.viewer.update(image=im_left)
        return Tcw

    def track_monocular(self, image, timestamp: float):
        """Monocular per-frame entry (upstream TrackMonocular analog)."""
        with self.timers.span("Total tracking"):
            Tcw = self.tracker.track_mono(image, timestamp)
        if self.viewer is not None:
            self.viewer.update(image=image)
        return Tcw

    def activate_localization_mode(self):
        """Reference ActivateLocalizationMode: mapping paused, tracking only."""
        self._localization_only = True
        self.tracker.only_tracking = True
        self.local_mapper.request_stop()

    def deactivate_localization_mode(self):
        self._localization_only = False
        self.tracker.only_tracking = False
        self.local_mapper.release()

    def reset(self):
        self.tracker.reset()
        if self.relocalizer is not None:
            self.relocalizer.database.clear()

    def shutdown(self, measure_frontend_split: bool = False) -> str:
        """Drain the worker (reference Shutdown barrier, System.cpp:
        227-242) and return the timing report (System.cpp:244).

        With measure_frontend_split=True the fused "ORB extraction +
        stereo matching" stage is additionally reported as the
        reference's two separate stages (Frame.cpp:112-132) by measuring
        the extraction-only program against the fused one on the last
        frame's images — the report then carries all 20 reference stage
        names."""
        if self.worker is not None:
            self.worker.finish()
            self.worker = None
        if self.loop_worker is not None:
            self.loop_worker.finish()
            self.loop_worker = None
        if measure_frontend_split and self.tracker.last_images is not None:
            imL, imR = self.tracker.last_images
            t_orb, t_full = self.frontend.measure_stage_split(imL, imR)
            for a, b in zip(t_orb, t_full):
                self.timers.add("ORB extraction", a * 1e6)
                self.timers.add("Stereo matching", max(b - a, 0.0) * 1e6)
        report = self.timers.report()
        return report

    def wait_idle(self, timeout: float = 120.0):
        """Block until queued mapping/loop-closing work is done (no-op in
        the host-sequenced modes)."""
        if self.worker is not None:
            self.worker.wait_idle(timeout)
        if self.loop_worker is not None:
            self.loop_worker.wait_idle(timeout)
            if self.worker is not None:
                # a loop correction may have re-woken the mapper
                self.worker.wait_idle(timeout)

    # ------------------------------------------------------------------

    def get_tracking_state(self) -> TrackingState:
        return self.tracker.state

    def get_tracked_map_points(self):
        lf = self.tracker.last_frame
        if lf is None:
            return []
        return [int(p) for p in lf.point_ids[lf.point_ids >= 0]]

    def map_changed(self) -> int:
        return self.map.big_change_idx

    # ------------------------------------------------------------------

    def save_trajectory_tum(self, path: str):
        traj_mod.save_lines(
            path, traj_mod.trajectory_tum(self.tracker.trajectory, self.map)
        )

    def save_offline_trajectory_tum(self, path: str):
        traj_mod.save_lines(
            path,
            traj_mod.trajectory_tum(self.tracker.trajectory, self.map, offline=True),
        )

    def save_keyframe_trajectory_tum(self, path: str):
        traj_mod.save_lines(path, traj_mod.keyframe_trajectory_tum(self.map))

    def save_trajectory_kitti(self, path: str):
        traj_mod.save_lines(
            path, traj_mod.trajectory_kitti(self.tracker.trajectory, self.map)
        )

    # ------------------------------------------------------------------

    def save_map(self, path: str):
        """Map checkpointing — absent in the reference (an explicit TODO at
        System.hpp:109-111); arrays serialize trivially here."""
        from . import checkpoint

        checkpoint.save_map(self.map, path)

    def load_map(self, path: str):
        from . import checkpoint

        checkpoint.load_map(self.map, path)
