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
                # GBA runs on its own thread so subsequent keyframes keep
                # being loop-checked during the solve (reference
                # LoopClosing.cpp:566-570 detached GBA thread)
                self.loop_closer.threaded_gba = True
        self.viewer = None
        if use_viewer:
            from .viewer import Viewer

            self.viewer = Viewer(self)
            # reference System.cpp:72-77 spawns the Viewer thread; the
            # headless live loop renders both views at ~5 fps into
            # in-memory buffers (+ PNG files when out_dir is set)
            self.viewer.run_live()
        self._localization_only = False

    # ------------------------------------------------------------------

    def track_stereo(self, im_left, im_right, timestamp: float):
        """Per-frame entry (reference System::TrackStereo, System.cpp:90-142).
        Returns Tcw [4,4] or None when tracking is lost.

        Return contract by mode (tested in test_system.py):
        default (synchronous) — the frame's SOLVED pose, matching the
        reference's TrackStereo -> Isometry3f contract exactly;
        config.pipelined_tracking=True — the motion-model PREDICTION for
        the new frame (its device step is still in flight); the solved
        pose is recorded in the trajectory when the next frame applies
        it, one frame later."""
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
        self.tracker.flush_pipeline()
        self._localization_only = True
        self.tracker.only_tracking = True
        self.local_mapper.request_stop()

    def deactivate_localization_mode(self):
        self._localization_only = False
        self.tracker.only_tracking = False
        self.local_mapper.release()

    def reset(self):
        """Full pipeline reset (reference Tracking::Reset, Tracking.cpp:
        1348-1388: clears map, database, queues, loop state)."""
        self.tracker.reset()
        self.local_mapper.recent_points = []
        self.local_mapper._queue.clear()
        if self.relocalizer is not None:
            self.relocalizer.database.clear()
        if self.loop_closer is not None:
            lc = self.loop_closer
            lc.consistent_groups = []
            lc.rejections = []
            lc._candidates = []

    def shutdown(self, measure_frontend_split: bool = False) -> str:
        """Drain the worker (reference Shutdown barrier, System.cpp:
        227-242) and return the timing report (System.cpp:244).

        With measure_frontend_split=True the fused "ORB extraction +
        stereo matching" stage is additionally reported as the
        reference's two separate stages (Frame.cpp:112-132) by measuring
        the extraction-only program against the fused one on the last
        frame's images — the report then carries all 20 reference stage
        names."""
        self.tracker.flush_pipeline()
        if self.viewer is not None:
            self.viewer.stop_live()
        if self.worker is not None:
            self.worker.finish()
            self.worker = None
        if self.loop_worker is not None:
            self.loop_worker.finish()
            self.loop_worker = None
        if self.loop_closer is not None:
            self.loop_closer.wait_gba()
        if measure_frontend_split and self.tracker.last_images is not None:
            imL, imR = self.tracker.last_images
            t_orb, t_full = self.frontend.measure_stage_split(imL, imR)
            for a, b in zip(t_orb, t_full):
                self.timers.add("ORB extraction", a * 1e6)
                self.timers.add("Stereo matching", max(b - a, 0.0) * 1e6)
        report = self.timers.report()
        return report

    def precompile(self):
        """Compile the rare-event device programs (relocalization, loop
        closing: Sim3 RANSAC/LM, essential graph, loop fusion matching,
        pose optimization) at their shape-policy buckets with dummy
        inputs, so no compile ever lands mid-run. The per-frame programs
        (frontend, fused step, epipolar, fuse, BA) compile during the
        normal warmup frames because the shape policy pins their buckets.

        Round-2 postmortem: mid-run compiles were the dominant cost of
        the on-chip bench (BENCH_r02 'Fused frame step' sigma 4.7 s);
        with `shapes.fixed=True` + this precompile the steady-state run
        observes zero compile events (asserted by bench.py via
        jax.monitoring)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        sh = self.config.shapes
        N = self.config.orb.n_features
        key = jax.random.PRNGKey(0)
        cam = self.frontend.camera

        def run(label, fn):
            try:
                jax.block_until_ready(fn())
            except Exception as e:  # pragma: no cover - diagnostics only
                import sys as _sys

                print(f"# precompile[{label}] failed: {e}", file=_sys.stderr)

        zeros_feat = dict(
            desc=jnp.zeros((N, 8), jnp.uint32),
            valid=jnp.zeros(N, bool).at[:8].set(True),
            angle=jnp.zeros(N, jnp.float32),
            uv=jnp.zeros((N, 2), jnp.float32),
            octave=jnp.zeros(N, jnp.int32),
            u_right=jnp.full(N, -1.0, jnp.float32),
        )

        # bundle adjustment at every tier (local BA moves between tiers
        # as the map grows; both must be warm before the timed run)
        if sh.fixed:
            from ..ops import ba as ba_mod

            for K, P, D in sh.ba_tiers:
                prob = ba_mod.BAProblemPM(
                    poses=jnp.tile(jnp.eye(4), (K, 1, 1)),
                    points=jnp.zeros((P, 3)).at[:, 2].set(10.0),
                    obs_kf=jnp.zeros((P, D), jnp.int32),
                    obs=jnp.zeros((P, D, 3)),
                    inv_sigma2=jnp.ones((P, D)),
                    is_stereo=jnp.ones((P, D), bool),
                    edge_valid=jnp.zeros((P, D), bool).at[:64].set(True),
                    pose_fixed=jnp.zeros(K, bool).at[0].set(True),
                )

                def ba_tier(prob=prob):
                    st = ba_mod.ba_pm_init_jit(prob, cam)
                    st = ba_mod.ba_pm_step_jit(prob, cam, st, 20)
                    # GBA runs the deeper PCG (n_cg=40, a distinct static
                    # value => distinct program)
                    st = ba_mod.ba_pm_step_jit(prob, cam, st, 40)
                    return ba_mod.pm_inlier_mask_jit(
                        st.poses, st.points, prob, cam
                    )

                run(f"ba_tier_{K}x{P}x{D}", ba_tier)

        # pose optimization (tracking fallback, relocalization refine)
        run("pose_opt", lambda: self.tracker._jit_pose_opt(
            jnp.eye(4), jnp.zeros((N, 3)), jnp.zeros((N, 3)),
            jnp.ones(N), jnp.zeros(N, bool), zeros_feat["valid"],
        ))
        # BoW-style matching (reference-KF tracking, loop candidates)
        run("match_bow", lambda: self.tracker._jit_match_bow(
            zeros_feat["desc"], zeros_feat["valid"], zeros_feat["angle"],
            zeros_feat["desc"], zeros_feat["valid"], zeros_feat["angle"],
            0.75,
        ))

        # legacy (non-fused) tracking fallbacks: motion step + local-map
        # step — these run when the fused path bails (motion_fail, post-
        # relocalization) and must not compile mid-run
        from .frontend import FrameFeatures

        fd = FrameFeatures(
            uv=zeros_feat["uv"], octave=zeros_feat["octave"],
            angle=zeros_feat["angle"], response=jnp.zeros(N, jnp.float32),
            desc=zeros_feat["desc"], valid=zeros_feat["valid"],
            u_right=zeros_feat["u_right"], depth=zeros_feat["u_right"],
        )
        run("motion_step", lambda: self.tracker._jit_motion_step(
            fd, jnp.zeros((N, 3)), zeros_feat["valid"],
            zeros_feat["octave"], zeros_feat["angle"], zeros_feat["desc"],
            jnp.eye(4), 7.0, jnp.asarray(False), jnp.asarray(False),
        ))
        Pl = sh.bucket(512, 512, sh.local_cand_cap)
        run("local_step", lambda: self.tracker._jit_local_step(
            fd, zeros_feat["valid"], jnp.zeros((N, 3)),
            jnp.zeros(N, bool),
            jnp.zeros((Pl, 2), jnp.float32), jnp.zeros(Pl, jnp.float32),
            jnp.zeros(Pl, jnp.int32), jnp.zeros(Pl, jnp.float32),
            jnp.zeros((Pl, 8), jnp.uint32), jnp.zeros(Pl, bool),
            jnp.zeros((Pl, 3), jnp.float32), jnp.eye(4), 1.0,
        ))

        # local-mapping worker programs (creation / fusion): the r5 diag
        # run caught their first compiles landing ~8 s into the timed
        # window (warmup's 30 frames hadn't yet produced a multi-neighbor
        # keyframe when the window opened)
        lm = self.local_mapper
        if lm is not None:
            Kn = sh.bucket_select(2, 1, sh.neighbor_cap)
            eye4 = jnp.eye(4, dtype=jnp.float32)
            run("epi_batch", lambda: lm._jit_epipolar_batch(
                zeros_feat["uv"], zeros_feat["desc"],
                np.zeros(N, bool), zeros_feat["angle"], np.zeros(N, bool),
                zeros_feat["u_right"], zeros_feat["u_right"],
                zeros_feat["octave"],
                (zeros_feat["uv"],) * Kn, (zeros_feat["octave"],) * Kn,
                (zeros_feat["desc"],) * Kn, (np.zeros(N, bool),) * Kn,
                (zeros_feat["angle"],) * Kn, (np.zeros(N, bool),) * Kn,
                (zeros_feat["u_right"],) * Kn, (zeros_feat["u_right"],) * Kn,
                (np.zeros((3, 3), np.float32),) * Kn,
                (np.zeros(2, np.float32),) * Kn,
                np.eye(4, dtype=np.float32),
                (np.eye(4, dtype=np.float32),) * Kn,
                np.eye(4, dtype=np.float32),
                (np.eye(4, dtype=np.float32),) * Kn,
                np.zeros(3, np.float32), (np.zeros(3, np.float32),) * Kn,
            ))
            Kt = sh.bucket_select(2, 1, sh.fuse_targets_cap)
            Ps = sh.bucket(256, 256, sh.fuse_src_cap)
            Pb = sh.bucket(256, 256, sh.fuse_pt_cap)
            run("fuse_both", lambda: lm._jit_fuse_both(
                (zeros_feat["uv"],) * Kt, (zeros_feat["octave"],) * Kt,
                (zeros_feat["u_right"],) * Kt, (zeros_feat["desc"],) * Kt,
                (zeros_feat["valid"],) * Kt,
                (np.zeros((Ps, 2), np.float32),) * Kt,
                (np.zeros(Ps, np.float32),) * Kt,
                (np.zeros(Ps, np.int32),) * Kt,
                np.zeros((Ps, 8), np.uint32),
                (np.zeros(Ps, bool),) * Kt,
                zeros_feat["uv"], zeros_feat["octave"],
                zeros_feat["u_right"], zeros_feat["desc"],
                zeros_feat["valid"],
                np.zeros((Pb, 2), np.float32),
                np.zeros(Pb, np.float32),
                np.zeros(Pb, np.int32),
                np.zeros((Pb, 8), np.uint32),
                np.zeros(Pb, bool),
            ))

        if self.relocalizer is not None:
            r = self.relocalizer
            C = sh.reloc_cands
            run("reloc_pose_opt", lambda: r._jit_pose_opt(
                jnp.eye(4), jnp.zeros((N, 3)), jnp.zeros((N, 3)),
                jnp.ones(N), jnp.zeros(N, bool), zeros_feat["valid"],
            ))
            run("reloc_transform", lambda: r._jit_transform(
                zeros_feat["desc"], zeros_feat["valid"]
            ))
            run("reloc_batch", lambda: r._jit_reloc_batch(
                zeros_feat["desc"], zeros_feat["valid"], zeros_feat["angle"],
                jnp.zeros((C, N, 8), jnp.uint32),
                jnp.zeros((C, N), bool).at[:, :8].set(True),
                jnp.zeros((C, N), jnp.float32),
                jnp.zeros((C, N, 3), jnp.float32),
                jnp.zeros((N, 2), jnp.float32), jnp.ones(N, jnp.float32),
                jax.random.split(key, C),
            ))
            P = sh.bucket(256, 256, sh.fuse_src_cap)
            run("reloc_widen", lambda: r._jit_search_proj(
                zeros_feat["uv"], zeros_feat["octave"], zeros_feat["desc"],
                zeros_feat["valid"], zeros_feat["angle"],
                jnp.zeros((P, 2), jnp.float32), jnp.zeros(P, jnp.int32),
                jnp.zeros((P, 8), jnp.uint32), jnp.zeros(P, bool),
                jnp.zeros(P, jnp.float32), self.frontend.scale_factors,
                10.0, jnp.asarray(False), jnp.asarray(False),
                check_rotation=False,
            ))

        if self.loop_closer is not None:
            lc = self.loop_closer
            run("loop_match_bow", lambda: lc._jit_match_bow(
                zeros_feat["desc"], zeros_feat["valid"],
                zeros_feat["angle"], zeros_feat["desc"],
                zeros_feat["valid"], zeros_feat["angle"], 0.75,
            ))
            Cb = sh.bucket_select(2, 2, 8)
            nodes0 = np.zeros(N, np.int32)
            run("loop_bow_batch", lambda: lc._jit_bow_batch(
                zeros_feat["desc"], zeros_feat["valid"],
                zeros_feat["angle"], nodes0,
                (zeros_feat["desc"],) * Cb,
                (np.zeros(N, bool),) * Cb,
                (zeros_feat["angle"],) * Cb,
                (nodes0,) * Cb,
            ))
            B = sh.bucket(256, 256, sh.sim3_cap)
            X = jnp.zeros((B, 3), jnp.float32)
            uv = jnp.zeros((B, 2), jnp.float32)
            me = jnp.ones(B, jnp.float32)
            val = jnp.zeros(B, bool).at[:8].set(True)
            run("sim3_ransac", lambda: lc._jit_ransac(
                key, X, X, uv, uv, me, me, val, cam,
                fix_scale=lc.fix_scale,
            ))
            from ..geometry import sim3 as sim3_mod

            S0 = sim3_mod.Sim3(
                R=jnp.eye(3), t=jnp.zeros(3), s=jnp.asarray(1.0, jnp.float32)
            )
            run("sim3_opt", lambda: lc._jit_opt_sim3(
                S0, X, X, uv, uv, me, me, val, cam, fix_scale=lc.fix_scale,
            ))
            Pf = sh.bucket(256, 256, sh.fuse_pt_cap)
            Ktc = sh.bucket_select(1, 1, sh.fuse_targets_cap)
            run("loop_fuse_proj_batch", lambda: lc._jit_fuse_proj_batch(
                (zeros_feat["uv"],) * Ktc, (zeros_feat["octave"],) * Ktc,
                (zeros_feat["desc"],) * Ktc, (zeros_feat["valid"],) * Ktc,
                (np.zeros((Pf, 2), np.float32),) * Ktc,
                (np.zeros(Pf, np.int32),) * Ktc,
                (np.zeros((Pf, 8), np.uint32),) * Ktc,
                (np.zeros(Pf, bool),) * Ktc,
            ))
            for th in (10.0, 7.5, 4.0):  # static arg: one program per th
                run(f"loop_fuse_{th}", lambda th=th: lc._jit_fuse_match(
                    zeros_feat["uv"], zeros_feat["octave"],
                    zeros_feat["u_right"], zeros_feat["desc"],
                    zeros_feat["valid"],
                    jnp.zeros((Pf, 2), jnp.float32),
                    jnp.full(Pf, -1.0, jnp.float32),
                    jnp.zeros(Pf, jnp.int32), jnp.zeros((Pf, 8), jnp.uint32),
                    jnp.zeros(Pf, bool),
                    self.frontend.scale_factors,
                    self.frontend.inv_level_sigma2, th=th,
                ))
            # essential graph at the policy buckets
            from ..ops import posegraph

            Kp = sh.bucket(16, 16, sh.pg_k_cap)
            Ep = sh.bucket(64, 64, sh.pg_e_cap)
            prob = posegraph.PoseGraphProblem(
                vertices=sim3_mod.Sim3(
                    R=jnp.tile(jnp.eye(3), (Kp, 1, 1)),
                    t=jnp.zeros((Kp, 3)), s=jnp.ones(Kp),
                ),
                edge_i=jnp.zeros(Ep, jnp.int32),
                edge_j=jnp.ones(Ep, jnp.int32),
                meas=sim3_mod.Sim3(
                    R=jnp.tile(jnp.eye(3), (Ep, 1, 1)),
                    t=jnp.zeros((Ep, 3)), s=jnp.ones(Ep),
                ),
                edge_valid=jnp.zeros(Ep, bool).at[:4].set(True),
                fixed=jnp.zeros(Kp, bool).at[0].set(True),
            )
            run("posegraph", lambda: posegraph.optimize_essential_graph_jit(
                prob, fix_scale=lc.fix_scale
            ))

    def wait_idle(self, timeout: float = 120.0):
        """Block until queued mapping/loop-closing work is done (no-op in
        the host-sequenced modes)."""
        self.tracker.flush_pipeline()
        if self.worker is not None:
            self.worker.wait_idle(timeout)
        if self.loop_worker is not None:
            self.loop_worker.wait_idle(timeout)
            if self.loop_closer is not None:
                self.loop_closer.wait_gba(timeout)
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
