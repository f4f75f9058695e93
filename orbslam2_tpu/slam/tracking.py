"""Tracking front-end: the per-frame state machine.

Re-implements the reference Tracking pipeline (src/Tracking.cpp:248-524)
over the TPU-native kernels: motion-model / reference-KF tracking, local-map
tracking, keyframe decision + creation, trajectory bookkeeping. Host code
here is control flow and map admin only — matching and optimization run as
jitted device programs with fixed shapes.

States mirror the reference enum (Tracking.hpp:80-86).
"""

from __future__ import annotations

import contextlib
import enum
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import hamming, matchers, pose_opt
from .frontend import FrameHost, Frontend
from .map import SlamMap


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


class TrajectoryEntry:
    __slots__ = ("Tcr", "ref_kf", "timestamp", "lost", "Tcw")

    def __init__(self, Tcr, ref_kf, timestamp, lost, Tcw):
        self.Tcr = Tcr
        self.ref_kf = ref_kf
        self.timestamp = timestamp
        self.lost = lost
        self.Tcw = Tcw  # online pose snapshot (reference System.cpp:134-135)


class Tracker:
    def __init__(self, config: SlamConfig, frontend: Frontend, slam_map: SlamMap):
        self.config = config
        self.frontend = frontend
        self.map = slam_map
        self.cam = frontend.camera
        self.state = TrackingState.NO_IMAGES_YET
        self.velocity: Optional[np.ndarray] = None  # Tcl (cur <- last)
        self.last_frame: Optional[FrameHost] = None
        self.ref_kf: Optional[int] = None
        self.last_kf_id = 0  # frame id at last KF insertion
        self.last_reloc_frame_id = 0
        self.frame_id = 0
        self.min_frames = config.min_frames
        self.max_frames = config.max_frames
        self.trajectory: List[TrajectoryEntry] = []
        self.local_keyframes: List[int] = []
        self.local_points: List[int] = []
        self.n_inliers = 0
        self.local_mapper = None  # wired by System; must expose interface below
        self.only_tracking = False
        self.relocalizer = None  # wired by System once place recognition exists
        self.timers = None  # StageTimers, wired by System
        self.last_images = None  # last stereo pair (for shutdown profiling)
        #: per-condition keyframe-insertion counts (diagnostics)
        self.kf_trigger_counts: dict = {}
        #: state-transition breadcrumbs (diagnostics; low volume — one
        #: entry per tracking failure, recording which gate failed with
        #: its counts, so a lost run is diagnosable from the artifact)
        self.events: List[dict] = []
        #: (frame, n_match1, n_keep1, n_new_local, n_inliers) ring buffer
        self.fused_stats: List[tuple] = []
        #: per-frame (assemble_s, step_s, apply_s) wall breakdown of the
        #: fused path — lets the bench attribute its worst frame to the
        #: lock wait (assemble/apply) vs the device step
        self.frame_breakdown: List[tuple] = []

        N = config.orb.n_features
        self._N = N
        sf = self.frontend.scale_factors
        inv_sig = self.frontend.inv_level_sigma2

        self._jit_pose_opt = jax.jit(
            lambda T0, pw, obs, isig, ster, valid: pose_opt.pose_optimize(
                T0, pw, obs, isig, ster, valid, self.cam
            )
        )
        self._jit_match_bow = jax.jit(matchers.search_by_bow)

        # ---- fused per-frame steps: match + pose optimization in ONE
        # device program each, so the host pays one round trip per stage
        # instead of one per kernel (SURVEY.md §7 "one fused jit per stage").
        camcfg = config.camera
        W, H = float(camcfg.width), float(camcfg.height)
        lvl_sig2 = jnp.asarray(self.frontend.level_sigma2, jnp.float32)

        def _frame_obs(fd):
            obs = jnp.concatenate(
                [fd.uv, fd.u_right[:, None]], axis=1
            ).astype(jnp.float32)
            is_stereo = fd.u_right >= 0
            inv_sig = 1.0 / matchers.lookup_level(lvl_sig2, fd.octave)
            return obs, is_stereo, inv_sig

        def _onehot_rows(idx, values):
            """values[idx] as a one-hot matmul (no serialized TPU gather);
            geometry positions demand precision='highest'."""
            choice = matchers._choice_matrix(
                jnp.clip(idx, 0, values.shape[0] - 1).astype(jnp.int32),
                values.shape[0],
            )
            return jnp.einsum(
                "sn,nd->sd", choice.astype(jnp.float32),
                values.astype(jnp.float32), precision="highest",
            )

        def _motion_step(fd, pw_src, src_valid, oct_src, ang_src, desc_src,
                         T_pred, th, fwd, bwd):
            """TrackWithMotionModel device body: project last-frame points
            under the predicted pose, match (with the reference's widen-
            on-few retry, Tracking.cpp:736-741), then pose-optimize."""
            Rcw, tcw = T_pred[:3, :3], T_pred[:3, 3]
            pc = jnp.einsum(
                "ij,nj->ni", Rcw, pw_src, precision="highest"
            ) + tcw
            z = pc[:, 2]
            zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
            u = camcfg.fx * pc[:, 0] / zs + camcfg.cx
            v = camcfg.fy * pc[:, 1] / zs + camcfg.cy
            in_img = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            proj_valid = src_valid & in_img
            uvp = jnp.stack([u, v], axis=-1).astype(jnp.float32)

            def match(t):
                pfk, _ = matchers.search_by_projection_frame(
                    fd.uv, fd.octave, fd.desc, fd.valid, fd.angle,
                    uvp, oct_src, desc_src, proj_valid, ang_src,
                    sf, t, fwd, bwd,
                )
                return pfk

            pfk_a = match(th)
            pfk = jax.lax.cond(
                jnp.sum(pfk_a >= 0) < 20,
                lambda: match(2.0 * th),
                lambda: pfk_a,
            )
            matched = pfk >= 0
            pw_kp = _onehot_rows(pfk, pw_src)
            obs, is_stereo, inv_sig_kp = _frame_obs(fd)
            res = pose_opt.pose_optimize(
                T_pred, pw_kp, obs, inv_sig_kp, is_stereo, matched, self.cam
            )
            return pfk, res

        self._jit_motion_step = jax.jit(_motion_step)

        def _local_step(fd, kp_free, pw_exist, valid_exist, cand_uvp, cand_ur,
                        cand_level, cand_vcos, cand_desc, cand_visible,
                        cand_pos, T0, th):
            """TrackLocalMap device body: match unmatched keypoints against
            the projected local points, merge with existing associations,
            pose-optimize."""
            pfk, _ = matchers.search_by_projection_points(
                fd.uv, fd.octave, fd.u_right, fd.desc, kp_free,
                cand_uvp, cand_ur, cand_level, cand_vcos, cand_desc,
                cand_visible, sf, th,
            )
            new_match = pfk >= 0
            pw_new = _onehot_rows(pfk, cand_pos)
            valid_i = valid_exist | new_match
            pw_i = jnp.where(valid_exist[:, None], pw_exist, pw_new)
            obs, is_stereo, inv_sig_kp = _frame_obs(fd)
            res = pose_opt.pose_optimize(
                T0, pw_i, obs, inv_sig_kp, is_stereo, valid_i, self.cam
            )
            return pfk, res

        self._jit_local_step = jax.jit(_local_step)

        # ---- ONE-SYNC fused frame step: frontend (ORB + stereo) +
        # motion-model matching + pose optimization + local-map matching +
        # pose optimization as a SINGLE device program. Over the TPU
        # tunnel every synchronous fetch costs a ~30 ms round trip and the
        # reference's real-time budget is 50 ms/frame
        # (Examples/Stereo/stereo_euroc.cc:176-183) — the hot path must be
        # one dispatch + one fetch. Local-map candidates live in a
        # device-resident cache (re-uploaded only when the map mutates);
        # frustum culling and scale prediction run on device.
        log_scale = float(np.log(config.orb.scale_factor))
        n_levels = config.orb.n_levels
        close_thr = float(config.depth_threshold)
        features_body = frontend.features_body

        def _full_step(images_u8, src_pw, src_has, src_desc, oct_src,
                       ang_src, src_cand_row, T_pred, th, fwd, bwd,
                       cand_pos, cand_desc, cand_normal, cand_dmin,
                       cand_dmax, cand_ok, th_local):
            fd = features_body(images_u8.astype(jnp.float32))

            # --- motion-model matching + first pose optimization
            # (reference TrackWithMotionModel, Tracking.cpp:714-772)
            Rcw, tcw = T_pred[:3, :3], T_pred[:3, 3]
            pc = jnp.einsum(
                "ij,nj->ni", Rcw, src_pw, precision="highest"
            ) + tcw
            z = pc[:, 2]
            zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
            u = camcfg.fx * pc[:, 0] / zs + camcfg.cx
            v = camcfg.fy * pc[:, 1] / zs + camcfg.cy
            in_img = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            proj_valid = src_has & in_img
            uvp = jnp.stack([u, v], axis=-1).astype(jnp.float32)

            def match(t):
                pfk, _ = matchers.search_by_projection_frame(
                    fd.uv, fd.octave, fd.desc, fd.valid, fd.angle,
                    uvp, oct_src, src_desc, proj_valid, ang_src,
                    sf, t, fwd, bwd,
                )
                return pfk

            pfk_a = match(th)
            # widen-on-few retry (Tracking.cpp:736-741): lax.cond runs the
            # 2x-radius rematch ONLY when needed (jnp.where computed both
            # every frame — ~2 ms of wasted matcher time in the hot path)
            pfk = jax.lax.cond(
                jnp.sum(pfk_a >= 0) < 20,
                lambda: match(2.0 * th),
                lambda: pfk_a,
            )
            hit1 = pfk >= 0
            pw1 = _onehot_rows(pfk, src_pw)
            obs, is_stereo, inv_sig = _frame_obs(fd)
            res1 = pose_opt.pose_optimize(
                T_pred, pw1, obs, inv_sig, is_stereo, hit1, self.cam
            )
            keep1 = hit1 & res1.inlier
            n_match1 = jnp.sum(hit1)

            # --- local candidates: project + frustum under the optimized
            # pose (reference SearchLocalPoints, Tracking.cpp:979-1038)
            T1 = res1.Tcw
            R1, t1 = T1[:3, :3], T1[:3, 3]
            pc2 = jnp.einsum(
                "ij,pj->pi", R1, cand_pos, precision="highest"
            ) + t1
            z2 = pc2[:, 2]
            zs2 = jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
            u2 = camcfg.fx * pc2[:, 0] / zs2 + camcfg.cx
            v2 = camcfg.fy * pc2[:, 1] / zs2 + camcfg.cy
            ur2 = u2 - camcfg.bf / zs2
            Ow = -jnp.einsum("ji,j->i", R1, t1, precision="highest")
            po = cand_pos - Ow
            dist = jnp.linalg.norm(po, axis=1)
            viewcos = jnp.sum(po * cand_normal, axis=1) / jnp.maximum(dist, 1e-9)
            visible = (
                (z2 > 0) & (u2 >= 0) & (u2 < W) & (v2 >= 0) & (v2 < H)
                & (dist >= 0.8 * cand_dmin) & (dist <= 1.2 * cand_dmax)
                & (viewcos > 0.5) & cand_ok
            )
            ratio = cand_dmax / jnp.maximum(dist, 1e-9)
            level = jnp.clip(
                jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale),
                0, n_levels - 1,
            ).astype(jnp.int32)

            # exclude candidates already matched by the motion step
            # (reference mnLastFrameSeen gate, Tracking.cpp:985-991):
            # one-hot matmuls instead of scatters
            S = src_pw.shape[0]
            kp_choice = matchers._choice_matrix(
                jnp.clip(pfk, 0, S - 1).astype(jnp.int32), S
            )
            src_matched = jnp.any(kp_choice & keep1[:, None], axis=0)
            P = cand_pos.shape[0]
            row_choice = matchers._choice_matrix(
                jnp.clip(src_cand_row, 0, P - 1).astype(jnp.int32), P
            )
            cand_matched = jnp.any(
                row_choice & (src_matched & (src_cand_row >= 0))[:, None],
                axis=0,
            )
            search = visible & ~cand_matched

            kp_free = fd.valid & ~keep1
            pfk2, _ = matchers.search_by_projection_points(
                fd.uv, fd.octave, fd.u_right, fd.desc, kp_free,
                jnp.stack([u2, v2], -1).astype(jnp.float32),
                ur2.astype(jnp.float32), level,
                viewcos.astype(jnp.float32), cand_desc, search,
                sf, th_local,
            )
            new_match = pfk2 >= 0
            pw2 = _onehot_rows(pfk2, cand_pos)
            valid_i = keep1 | new_match
            pw_i = jnp.where(keep1[:, None], pw1, pw2)
            res2 = pose_opt.pose_optimize(
                T1, pw_i, obs, inv_sig, is_stereo, valid_i, self.cam
            )

            # keyframe-decision counts (reference Tracking.cpp:846-861)
            close = fd.valid & (fd.depth > 0) & (fd.depth < close_thr)
            assoc = valid_i & res2.inlier
            host = dict(
                pfk=pfk, keep1=keep1, pfk2=pfk2, valid_i=valid_i,
                inlier2=res2.inlier, Tcw=res2.Tcw, n_match1=n_match1,
                # `search` (frustum-visible minus already-matched) so the
                # host's pt_visible bump matches the legacy bookkeeping
                visible=search,
                n_close_tracked=jnp.sum(close & assoc),
                n_close_free=jnp.sum(close & ~assoc),
            )
            return fd, host

        self._jit_full_step = jax.jit(_full_step)
        #: device-resident local-candidate cache:
        #: (ids ascending np.int64, device arrays tuple, map version)
        self._cand_cache = None
        #: pose-jump log: every loop-correction write-back appends its
        #: delta D (Tcw_new = Tcw_old @ D). The fused step snapshots the
        #: log length at assembly; if jumps landed while the device solve
        #: ran unlocked, _apply_fused composes the missed deltas into the
        #: solved pose so the frame enters the corrected world.
        self._jump_log: List[np.ndarray] = []
        #: pipelined tracking (config.pipelined_tracking): in-flight
        #: dispatched frames awaiting host application. Entries:
        #: (FrameHost, aux, host-output device handles, feature handles)
        self.pipelined = bool(getattr(config, "pipelined_tracking", False))
        self._pending: List[tuple] = []

    # ------------------------------------------------------------------

    def _span(self, name):
        return self.timers.span(name) if self.timers else contextlib.nullcontext()

    def _can_fuse(self) -> bool:
        """The one-sync fused step covers the steady-state stereo hot path
        (motion model + local map); every other state routes through the
        legacy multi-dispatch paths."""
        lm = self.local_mapper
        return (
            self.state == TrackingState.OK
            and self.velocity is not None
            and not self.only_tracking
            and not self.config.monocular
            and self.frame_id >= self.last_reloc_frame_id + 2
            and not (lm is not None and getattr(lm, "deferred", False))
            and len(self.local_points) > 0
        )

    def track(self, im_left, im_right, timestamp: float) -> Optional[np.ndarray]:
        """Process one stereo frame; returns Tcw or None when lost."""
        self.last_images = (im_left, im_right)

        # both paths quantize to uint8 before upload: over the tunnel the
        # f32 image pair costs ~28 ms more per frame than uint8, and real
        # camera streams are uint8 anyway. Already-uint8 inputs pass
        # through (the float round trip was ~10 ms/frame of host time)
        def _u8(im):
            a = np.asarray(im)
            if a.dtype == np.uint8:
                return a
            return np.clip(np.rint(a), 0, 255).astype(np.uint8)

        images_u8 = np.stack([_u8(im_left), _u8(im_right)])
        if self._can_fuse():
            # adaptive pipelining: hide the device round trip only while
            # support is comfortable — the one-frame lag costs matches,
            # which is affordable at 200+ inliers and fatal at 60
            if (
                self.pipelined
                and self.n_inliers >= self.config.pipeline_min_inliers
            ):
                return self._track_pipelined(images_u8, timestamp)
            self.flush_pipeline()
            import time as _time

            _t0 = _time.perf_counter()
            with self._span("Fused assemble"):
                with self.map.lock:
                    args, aux = self._assemble_fused(images_u8)
            _t1 = _time.perf_counter()
            with self._span("Fused frame step"):
                feats, host = self._jit_full_step(*args)
                # the synchronous per-frame fetch carries ONLY the small
                # step outputs; the frame's feature arrays (~70 KB — ~15 ms
                # of tunnel bandwidth at the measured ~5 MB/s) START their
                # transfer here asynchronously and are completed lazily by
                # the first host access (keyframe creation, ~29% of
                # frames) — by then the DMA has long finished, so neither
                # path pays the transfer in its latency
                for leaf in jax.tree_util.tree_leaves(feats):
                    try:
                        leaf.copy_to_host_async()
                    except AttributeError:  # pragma: no cover
                        break
                host = jax.device_get(host)
            frame = FrameHost(feats, timestamp, self.frame_id, eager=False)
            self.frame_id += 1
            _t2 = _time.perf_counter()
            with self._span("Fused apply"):
                with self.map.lock:
                    self._track(frame, fused=(host, aux))
            _t3 = _time.perf_counter()
            self.frame_breakdown.append((_t1 - _t0, _t2 - _t1, _t3 - _t2))
            if len(self.frame_breakdown) > 1200:
                del self.frame_breakdown[:400]
            return frame.Tcw if self.state == TrackingState.OK else None
        self.flush_pipeline()
        # ORB extraction and stereo matching are ONE fused device program
        # (the reference times them separately, Frame.cpp:112-132; here the
        # fusion is the point — the span covers both)
        with self._span("ORB extraction + stereo matching"):
            feats = self.frontend.process(images_u8[0], images_u8[1])
        frame = FrameHost(feats, timestamp, self.frame_id)
        self.frame_id += 1
        # the map-update lock is held for the frame's map admin (reference
        # Tracking.cpp:260); the frontend wait above runs outside it
        with self.map.lock:
            self._track(frame)
        return frame.Tcw if self.state == TrackingState.OK else None

    def _track_pipelined(self, images_u8, timestamp: float):
        """Latency-hiding fused tracking: dispatch frame i's device step,
        then apply frame i-1's results (its device work overlapped this
        frame's host work and dispatch). The reference hides latency with
        threads on a multicore CPU (SURVEY P1); on a single TPU chip the
        the hideable latency is the device round trip, and one frame of
        lag hides it exactly. Returns the motion-model PREDICTED pose for
        the new frame (the trajectory records solved poses at apply time,
        one frame later)."""
        steps = 1 + len(self._pending)
        with self.map.lock:
            args, aux = self._assemble_fused(images_u8, pred_steps=steps)
        feats, host_dev = self._jit_full_step(*args)  # async dispatch
        frame = FrameHost(feats, timestamp, self.frame_id, eager=False)
        self.frame_id += 1
        self._pending.append((frame, aux, host_dev, feats))
        while len(self._pending) > 1:
            self._apply_one()
        return np.asarray(aux["T_pred"])

    def _apply_one(self):
        """Apply the oldest in-flight frame's results (blocks on the
        device only if it hasn't finished yet)."""
        frame, aux, host_dev, feats = self._pending.pop(0)
        with self._span("Fused frame step"):
            # ONE transfer: step outputs + the frame's features (keyframe
            # creation would otherwise lazy-fetch them for another RTT)
            host, fd_host = jax.device_get((host_dev, feats))
        frame.attach_host(fd_host)
        with self.map.lock:
            self._track(frame, fused=(host, aux))
        if self.state != TrackingState.OK:
            # the chain downstream of a failed frame was predicted from a
            # bad pose: reprocess those frames through the legacy paths
            # (reference-KF tracking / relocalization)
            self.flush_pipeline(legacy=True)

    def flush_pipeline(self, legacy: bool = False):
        """Drain in-flight pipelined frames. legacy=True discards their
        fused results (stale chain) and re-tracks from their features."""
        while self._pending:
            if legacy:
                frame, aux, host_dev, feats = self._pending.pop(0)
                frame._fetch_host()
                with self.map.lock:
                    self._track(frame)
            else:
                self._apply_one()

    def track_mono(self, image, timestamp: float) -> Optional[np.ndarray]:
        """Process one monocular frame (reference GrabImageMonocular analog)."""
        feats = self.frontend.process_mono(image)
        frame = FrameHost(feats, timestamp, self.frame_id)
        self.frame_id += 1
        with self.map.lock:
            self._track(frame)
        return frame.Tcw if self.state == TrackingState.OK else None

    def _track(self, frame: FrameHost, fused=None):
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            self.state = TrackingState.NOT_INITIALIZED
            if self.config.monocular:
                self._monocular_initialization(frame)
            else:
                self._stereo_initialization(frame)
            if self.state != TrackingState.OK:
                self.last_frame = frame
                return
            self._record_trajectory(frame)
            self.last_frame = frame
            return

        ok = False
        local_done = False
        if self.state == TrackingState.OK:
            if fused is not None:
                # motion + local map already solved in the one-sync fused
                # device program; only the host bookkeeping remains
                status = self._apply_fused(frame, *fused)
                if status == "motion_fail":
                    with self._span("Pose prediction"):
                        ok = self._track_reference_keyframe(frame)
                else:
                    ok = status == "ok"
                    local_done = True
            else:
                if self.local_mapper is not None and getattr(self.local_mapper, "deferred", False):
                    self.local_mapper.pump()
                self._check_replaced_in_last_frame()
                with self._span("Pose prediction"):
                    if self.velocity is None or frame.frame_id < self.last_reloc_frame_id + 2:
                        ok = self._track_reference_keyframe(frame)
                    else:
                        ok = self._track_with_motion_model(frame)
                        if not ok:
                            ok = self._track_reference_keyframe(frame)
        else:  # LOST
            with self._span("Relocalization"):
                ok = self._relocalize(frame)

        if ok and not local_done:
            with self._span("Local map tracking"):
                ok = self._track_local_map(frame)

        if ok:
            self.state = TrackingState.OK
            # motion model velocity: Tcl = Tcw_cur @ Twc_last
            if self.last_frame.Tcw is not None:
                self.velocity = frame.Tcw @ np.linalg.inv(self.last_frame.Tcw)
            else:
                self.velocity = None
            # clean VO outliers
            with self._span("New keyframe decision"):
                need_kf = self._need_new_keyframe(frame)
            if need_kf:
                with self._span("New keyframe creation"):
                    self._create_new_keyframe(frame)
            # drop outlier associations for next frame
            frame.point_ids[frame.outlier] = -1
            frame.outlier[:] = False
        else:
            self.state = TrackingState.LOST
            self.velocity = None
            if self.map.n_keyframes() <= 5:
                # early loss: reset (reference Tracking.cpp:485-492)
                self.reset()
                return

        self._record_trajectory(frame)
        self.last_frame = frame

    # ------------------------------------------------------------------

    def _stereo_initialization(self, frame: FrameHost):
        """Reference Tracking::StereoInitialization (Tracking.cpp:527-581)."""
        if frame.n_keypoints <= 500:
            return
        frame.Tcw = np.eye(4, dtype=np.float32)
        kf = self.map.add_keyframe(frame, frame.Tcw)
        idxs = np.nonzero(frame.valid & (frame.depth > 0))[0]
        pids = self.map.add_stereo_points_batch(
            frame, kf, idxs, self.config.camera
        )
        frame.point_ids[idxs] = pids
        self.map.kf_point[kf] = frame.point_ids.copy()
        self.map.keyframe_origins.append(kf)
        self.ref_kf = kf
        self.last_kf_id = frame.frame_id
        self.local_keyframes = [kf]
        self.local_points = self.map.pt_ids()
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf)
        self.state = TrackingState.OK

    def _monocular_initialization(self, frame: FrameHost):
        """Two-view monocular bootstrap (upstream Tracking::Monocular-
        Initialization — present but disabled in the reference fork,
        include/Tracking.hpp:134-135; capability per BASELINE config 3)."""
        if getattr(self, "_init_ref", None) is None:
            if frame.n_keypoints > 100:
                self._init_ref = frame
            return
        ref = self._init_ref
        if frame.n_keypoints <= 100:
            self._init_ref = None
            return
        matches = self._match_for_initialization(ref, frame)
        n = int((matches >= 0).sum())
        if n < 100:
            self._init_ref = None
            return

        from ..ops import initializer as init_mod
        import jax

        N = self._N
        uv1 = np.zeros((N, 2), np.float32)
        uv2 = np.zeros((N, 2), np.float32)
        valid = matches >= 0
        uv1[valid] = ref.uv[valid]
        uv2[valid] = frame.uv[matches[valid]]
        key = jax.random.PRNGKey(frame.frame_id)
        res = jax.jit(
            init_mod.initialize_two_view, static_argnames=("n_hyp",)
        )(key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), self.cam)
        if not bool(res.success):
            return
        self._create_initial_map_monocular(ref, frame, matches, res)

    def _match_for_initialization(self, ref: FrameHost, cur: FrameHost) -> np.ndarray:
        """SearchForInitialization equivalent (ORBmatcher window 100, ratio
        0.9, octave 0 only, rotation check). Returns per-ref-kp index into
        cur (-1 none)."""
        @jax.jit
        def init_match(rd, cd):
            d = hamming.hamming_matrix(rd.desc, cd.desc)
            du = jnp.abs(rd.uv[:, 0][:, None] - cd.uv[:, 0][None, :])
            dv = jnp.abs(rd.uv[:, 1][:, None] - cd.uv[:, 1][None, :])
            window = (du <= 100) & (dv <= 100)
            o0 = (rd.octave[:, None] == 0) & (cd.octave[None, :] == 0)
            mask = window & o0 & rd.valid[:, None] & cd.valid[None, :]
            idx, best, second = hamming.masked_two_smallest(d, mask)
            ok = (best < hamming.TH_LOW) & (best < 0.9 * second)
            keep = matchers.rotation_consistency_mask(rd.angle, cd.angle[idx], ok)
            return idx, best, keep

        idx, best, keep = jax.device_get(init_match(ref.dev, cur.dev))
        out = np.full(self._N, -1, np.int64)
        used = np.zeros(self._N, bool)
        for i in np.argsort(best):
            if keep[i] and not used[idx[i]]:
                out[i] = idx[i]
                used[idx[i]] = True
        return out

    def _create_initial_map_monocular(self, ref, frame, matches, res):
        """CreateInitialMapMonocular: two keyframes, triangulated points,
        scale normalized to unit median depth, then the initial BA."""
        T21 = np.asarray(res.T21)
        point_ok = np.asarray(res.point_ok)
        X = np.asarray(res.points)

        ref.Tcw = np.eye(4, dtype=np.float32)
        frame.Tcw = T21.astype(np.float32)
        kf1 = self.map.add_keyframe(ref, ref.Tcw)
        kf2 = self.map.add_keyframe(frame, frame.Tcw)

        depths = []
        created = []
        for i in np.nonzero((matches >= 0) & point_ok)[0]:
            j = int(matches[i])
            pid = self.map.add_point(X[i], kf1, ref.desc[i])
            self.map.add_observation(pid, kf1, int(i))
            self.map.add_observation(pid, kf2, j)
            self.map.compute_distinctive_descriptor(pid)
            ref.point_ids[i] = pid
            frame.point_ids[j] = pid
            created.append(pid)
            depths.append(X[i][2])
        self.map.kf_point[kf1] = ref.point_ids.copy()
        self.map.kf_point[kf2] = frame.point_ids.copy()
        self.map.update_connections(kf1)
        self.map.update_connections(kf2)

        # scale: unit median depth (upstream CreateInitialMapMonocular)
        med = float(np.median(depths))
        if med <= 0 or len(created) < 50:
            self.map.clear()
            self._init_ref = None
            return
        inv_med = 1.0 / med
        frame.Tcw[:3, 3] *= inv_med
        self.map.kf_pose[kf2] = frame.Tcw.copy()
        for pid in created:
            self.map.pt_pos[pid] = self.map.pt_pos[pid] * inv_med
            self.map.update_normal_and_depth(pid)

        self.map.keyframe_origins.append(kf1)
        self.ref_kf = kf2
        self.last_kf_id = frame.frame_id
        self.local_keyframes = [kf1, kf2]
        self.local_points = list(created)
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf1)
            self.local_mapper.insert_keyframe(kf2)
        self.velocity = None
        self.state = TrackingState.OK

    def _unproject(self, frame: FrameHost, i: int) -> np.ndarray:
        z = frame.depth[i]
        u, v = frame.uv[i]
        cam = self.config.camera
        x = (u - cam.cx) * z / cam.fx
        y = (v - cam.cy) * z / cam.fy
        pc = np.array([x, y, z, 1.0])
        Twc = np.linalg.inv(frame.Tcw)
        return (Twc @ pc)[:3]

    def apply_pose_jump(self, T_old: np.ndarray, T_new: np.ndarray):
        """Re-anchor the motion-model state after a loop correction /
        essential graph / GBA write-back moved the current region's poses
        (called under the map lock). The reference has no equivalent — its
        tracker simply risks one failed frame after CorrectLoop rewrites
        mpCurrentKeyFrame's neighborhood (LoopClosing.cpp:429-501); here
        the last frame rides the same correction so the motion model stays
        continuous across the jump."""
        D = np.linalg.inv(T_old.astype(np.float64)) @ T_new.astype(np.float64)
        self._jump_log.append(D)  # unbounded but tiny: one per correction
        lf = self.last_frame
        if lf is None or lf.Tcw is None:
            return
        lf.Tcw = (lf.Tcw.astype(np.float64) @ D).astype(np.float32)

    def _check_replaced_in_last_frame(self):
        lf = self.last_frame
        # fast path: nothing was replaced since the last frame
        if not self.map.pt_replaced:
            return
        for i in np.nonzero(lf.point_ids >= 0)[0]:
            pid = int(lf.point_ids[i])
            r = self.map.resolve_replaced(pid)
            if r != pid:
                lf.point_ids[i] = r if r in self.map.pt_valid else -1

    # ------------------------------------------------------------------

    def _pose_optimize(self, frame: FrameHost) -> int:
        """Run device pose optimization on the frame's current matches."""
        N = self._N
        pw = np.zeros((N, 3), np.float32)
        pids = frame.point_ids
        has = pids >= 0
        valid = has & self.map.valid_mask(pids)
        frame.point_ids[has & ~valid] = -1
        pw[valid] = self.map.pt_pos[pids[valid]]
        for i, pos in frame.temp_points.items():
            if not valid[i]:
                pw[i] = pos
                valid[i] = True
        if valid.sum() < 3:
            return 0
        obs = np.concatenate([frame.uv, frame.u_right[:, None]], axis=1).astype(np.float32)
        is_stereo = frame.u_right >= 0
        inv_sig = 1.0 / self.frontend.level_sigma2[frame.octave]
        res = jax.device_get(  # one batched fetch (vs one RTT per field)
            self._jit_pose_opt(
                jnp.asarray(frame.Tcw),
                jnp.asarray(pw),
                jnp.asarray(obs),
                jnp.asarray(inv_sig, jnp.float32),
                jnp.asarray(is_stereo),
                jnp.asarray(valid),
            )
        )
        frame.Tcw = res.Tcw
        frame.outlier = valid & ~res.inlier
        return int(res.n_inliers)

    def _discard_outliers(self, frame: FrameHost) -> int:
        """Post-optimization bookkeeping shared by both tracking modes."""
        has = frame.point_ids >= 0
        bad = has & frame.outlier
        frame.point_ids[bad] = -1
        frame.outlier[bad] = False
        good = has & ~bad
        return int((self.map.pt_nobs[frame.point_ids[good]] > 0).sum())

    def _refresh_candidate_cache(self):
        """Device-resident local-map candidate tables (positions,
        descriptors, normals, depth bounds). Re-uploaded only when the
        local-point set or the map version changed (BA write-backs, loop
        corrections, per-keyframe maintenance bump `map.version`);
        steady-state frames pass device array handles — zero upload."""
        m = self.map
        sh = self.config.shapes
        ids = np.asarray(self.local_points, np.int64)
        if ids.size:
            ids = ids[m.valid_mask(ids)]
        cap = sh.bucket_select(len(ids), 512, sh.local_cand_cap)
        if len(ids) > cap:
            # fixed-cap overflow: keep the most-observed points (the
            # best-constrained landmarks); dropped ones return when the
            # local set shrinks. Bounds both compute and compile count.
            from . import shapes as shapes_mod

            ids = shapes_mod.select_top(
                ids, m.pt_nobs[ids].astype(np.float64), cap
            )
        c = self._cand_cache
        if (
            c is not None
            and c["version"] == m.version
            and np.array_equal(c["ids"], ids)
        ):
            return c
        P = sh.bucket(len(ids), 512, sh.local_cand_cap)
        pos, desc, normal, dmin, dmax = m.points_array(ids)

        def padto(a):
            out = np.zeros((P,) + a.shape[1:], a.dtype)
            out[: len(a)] = a
            return out

        dev = (
            jnp.asarray(padto(pos)), jnp.asarray(padto(desc)),
            jnp.asarray(padto(normal)), jnp.asarray(padto(dmin)),
            jnp.asarray(padto(dmax)),
            jnp.asarray(np.arange(P) < len(ids)),
        )
        c = {"ids": ids, "version": m.version, "dev": dev}
        self._cand_cache = c
        return c

    def _assemble_fused(self, images_u8, pred_steps: int = 1):
        """Host inputs for the one-sync fused step (under the map lock).

        pred_steps > 1 (pipelined tracking): the newest applied frame is
        pred_steps-1 frames behind the one being dispatched, so the pose
        prediction extrapolates the velocity that many steps and the
        motion-match radius widens accordingly."""
        lf = self.last_frame
        N = self._N
        self._check_replaced_in_last_frame()
        pids = lf.point_ids.copy()
        has_pt = (pids >= 0) & self.map.valid_mask(pids)
        pids[~has_pt] = -1
        pw = np.zeros((N, 3), np.float32)
        desc = np.zeros((N, 8), np.uint32)
        pw[has_pt] = self.map.pt_pos[pids[has_pt]]
        desc[has_pt] = self.map.pt_desc[pids[has_pt]]
        T_pred = lf.Tcw.astype(np.float64)
        for _ in range(pred_steps):
            T_pred = self.velocity.astype(np.float64) @ T_pred
        T_pred = T_pred.astype(np.float32)
        Twc = np.linalg.inv(T_pred.astype(np.float64))
        tlc = (lf.Tcw.astype(np.float64) @ Twc)[:3, 3]
        b = self.config.baseline
        fwd, bwd = bool(tlc[2] > b), bool(-tlc[2] > b)
        cache = self._refresh_candidate_cache()
        ids = cache["ids"]
        src_cand_row = np.full(N, -1, np.int32)
        if ids.size:
            loc = np.searchsorted(ids, np.clip(pids, 0, None))
            locc = np.clip(loc, 0, len(ids) - 1)
            okm = has_pt & (ids[locc] == pids)
            src_cand_row[okm] = locc[okm]
        th_local = (
            5.0 if self.frame_id < self.last_reloc_frame_id + 2 else 1.0
        )
        th_motion = 7.0 + 3.0 * (pred_steps - 1)
        # raw numpy leaves: the jit call batches all host->device
        # transfers into its one dispatch (eager jnp.asarray would issue
        # a separate tunnel transfer per array)
        args = (
            images_u8, pw, has_pt,
            desc, lf.dev.octave, lf.dev.angle,
            src_cand_row, T_pred,
            np.float32(th_motion), np.bool_(fwd), np.bool_(bwd),
            *cache["dev"], np.float32(th_local),
        )
        aux = {
            "src_pids": pids, "cand_ids": ids,
            "jump_epoch": len(self._jump_log),
            "T_pred": T_pred,
        }
        return args, aux

    def _apply_fused(self, frame: FrameHost, host, aux) -> str:
        """Host bookkeeping for the fused step's results. Returns "ok",
        "lost" (local-map support too thin — reference Tracking.cpp:
        808-819), or "motion_fail" (fall back to reference-KF tracking)."""
        m = self.map
        pfk = np.asarray(host["pfk"])
        keep1 = np.asarray(host["keep1"])
        pfk2 = np.asarray(host["pfk2"])
        valid_i = np.asarray(host["valid_i"])
        inl2 = np.asarray(host["inlier2"])
        src_pids = aux["src_pids"]
        cand_ids = aux["cand_ids"]
        if int(host["n_match1"]) < 20:
            self.events.append(dict(
                frame=frame.frame_id, gate="fused_motion_matches",
                n=int(host["n_match1"])))
            return "motion_fail"

        frame.Tcw = np.asarray(host["Tcw"]).copy()
        # a loop correction / essential graph / GBA write-back may have
        # landed while the fused solve ran unlocked: the solved pose lives
        # in the pre-correction world. Compose the missed jump deltas so
        # the frame (and the motion model seeded from it) enters the
        # corrected world (ADVICE r2: mid-frame pose-jump race).
        missed = self._jump_log[aux["jump_epoch"]:]
        if missed:
            T = frame.Tcw.astype(np.float64)
            for D in missed:
                T = T @ D
            frame.Tcw = T.astype(np.float32)
        frame.point_ids[:] = -1
        k1 = keep1 & (pfk >= 0)
        frame.point_ids[k1] = src_pids[pfk[k1]]
        if cand_ids.size:
            k2 = ~k1 & (pfk2 >= 0) & (pfk2 < len(cand_ids))
            frame.point_ids[k2] = cand_ids[pfk2[k2]]
        # drop pids the mapper invalidated between assembly and apply
        hasp = frame.point_ids >= 0
        frame.point_ids[hasp & ~m.valid_mask(frame.point_ids)] = -1

        # motion-stage map support (reference TrackWithMotionModel >= 10)
        mk = k1 & (frame.point_ids >= 0)
        n_map1 = int((m.pt_nobs[frame.point_ids[mk]] > 0).sum())
        if n_map1 < 10:
            self.events.append(dict(
                frame=frame.frame_id, gate="fused_motion_map_support",
                n=n_map1))
            return "motion_fail"

        # visibility / found statistics (reference SearchLocalPoints +
        # TrackLocalMap bookkeeping, Tracking.cpp:790-806,985-1006)
        matched_ids = np.unique(frame.point_ids[mk])
        m.pt_visible[matched_ids] += 1
        if cand_ids.size:
            vis = np.asarray(host["visible"])[: len(cand_ids)]
            m.pt_visible[cand_ids[vis]] += 1

        frame.outlier = valid_i & ~inl2
        good = (frame.point_ids >= 0) & ~frame.outlier
        good_ids = frame.point_ids[good]
        m.pt_found[good_ids] += 1
        self.n_inliers = int((m.pt_nobs[good_ids] > 0).sum())
        # stereo mode drops outliers immediately (Tracking.cpp:806)
        bad = (frame.point_ids >= 0) & frame.outlier
        frame.point_ids[bad] = -1
        frame.outlier[bad] = False
        frame._close_counts = (
            int(host["n_close_tracked"]), int(host["n_close_free"]),
        )
        # per-frame fused-step stats ring (diagnostics; bounded):
        # (frame, n_motion_matches, n_motion_kept, n_new_local, n_inliers,
        #  tracked_close, non_tracked_close) — the close counts drive the
        # NeedNewKeyFrame need_close condition (VERDICT r4: 47% of frames
        # fired it; the per-frame trace decides threshold vs matching bug)
        self.fused_stats.append((
            frame.frame_id, int(host["n_match1"]), int(k1.sum()),
            int((k2.sum()) if cand_ids.size else 0), self.n_inliers,
            int(host["n_close_tracked"]), int(host["n_close_free"]),
        ))
        if len(self.fused_stats) > 1200:
            del self.fused_stats[:400]
        # local map for the NEXT frame's candidate cache (the fused step
        # matched against the previous frame's local map — a one-frame lag
        # the reference does not have; documented deviation)
        self._update_local_map(frame)

        if (
            frame.frame_id < self.last_reloc_frame_id + self.max_frames
            and self.n_inliers < 50
        ):
            self.events.append(dict(
                frame=frame.frame_id, gate="fused_postreloc_50",
                n=self.n_inliers))
            return "lost"
        if self.n_inliers < 30:
            self.events.append(dict(
                frame=frame.frame_id, gate="fused_local_30",
                n=self.n_inliers))
            return "lost"
        return "ok"

    def _track_with_motion_model(self, frame: FrameHost) -> bool:
        """Reference Tracking::TrackWithMotionModel (Tracking.cpp:714-772).

        Projection matching (with the widen-on-few retry) and the pose
        optimization run as ONE fused device program; the host assembles
        the last frame's point table and applies the results."""
        lf = self.last_frame
        N = self._N
        T_pred = (self.velocity @ lf.Tcw).astype(np.float32)
        frame.Tcw = T_pred
        th = 15.0 if self.config.monocular else 7.0  # reference Tracking.cpp:726-730

        # last-frame source table: world position + distinctive descriptor
        # (vectorized gathers from the dense point arrays)
        pids = lf.point_ids.copy()
        has_pt = (pids >= 0) & self.map.valid_mask(pids)
        pw = np.zeros((N, 3), np.float64)
        desc = np.zeros((N, 8), np.uint32)
        is_temp = np.zeros(N, bool)
        pw[has_pt] = self.map.pt_pos[pids[has_pt]]
        desc[has_pt] = self.map.pt_desc[pids[has_pt]]
        if self.only_tracking:
            # visual-odometry points: unproject close stereo features of the
            # last frame that have no map point (reference UpdateLastFrame,
            # Tracking.cpp:648-712 — sorted by depth, close ones first)
            close = lf.valid & (lf.depth > 0) & ~has_pt
            order = np.argsort(lf.depth[np.nonzero(close)[0]])
            idxs = np.nonzero(close)[0][order]
            n_vo = 0
            for i in idxs:
                if lf.depth[i] > self.config.depth_threshold and n_vo > 100:
                    break
                pw[i] = self._unproject(lf, int(i))
                desc[i] = lf.desc[i]
                has_pt[i] = True
                is_temp[i] = True
                n_vo += 1

        # forward/backward along optical axis (reference ORBmatcher.cpp:1184-1194)
        Twc = np.linalg.inv(T_pred)
        tlc = (lf.Tcw @ Twc)[:3, 3]
        b = self.config.baseline
        fwd, bwd = bool(tlc[2] > b), bool(-tlc[2] > b)

        pfk, res = jax.device_get(
            self._jit_motion_step(
                frame.dev, jnp.asarray(pw, jnp.float32), jnp.asarray(has_pt),
                lf.dev.octave, lf.dev.angle, jnp.asarray(desc),
                jnp.asarray(T_pred), th, jnp.asarray(fwd), jnp.asarray(bwd),
            )
        )
        frame.point_ids[:] = -1
        frame.temp_points = {}
        hit = pfk >= 0
        for i in np.nonzero(hit)[0]:
            src = int(pfk[i])
            if self.only_tracking and is_temp[src]:
                frame.temp_points[int(i)] = pw[src].copy()
            else:
                frame.point_ids[i] = pids[src]
        if int(hit.sum()) < 20:
            self.events.append(dict(
                frame=frame.frame_id, gate="motion_matches_20",
                n=int(hit.sum())))
            return False
        frame.Tcw = res.Tcw
        frame.outlier = hit & ~res.inlier
        n_map = self._discard_outliers(frame)
        if n_map < 10:
            self.events.append(dict(
                frame=frame.frame_id, gate="motion_map_10", n=n_map))
        return n_map >= 10

    def _track_reference_keyframe(self, frame: FrameHost) -> bool:
        """Reference Tracking::TrackReferenceKeyFrame (Tracking.cpp:604-647).

        The reference matches via BoW buckets for speed; dense masked
        matching subsumes that (same mutual-best + ratio + rotation gates)
        without needing the vocabulary in the loop.
        """
        kf = self.ref_kf
        if kf is None or kf not in self.map.kf_valid:
            return False
        kff = self.map.kf_frame[kf]
        kf_pids = self.map.kf_point[kf]
        has_pt = (kf_pids >= 0) & self.map.valid_mask(kf_pids)
        desc = np.zeros((self._N, 8), np.uint32)
        desc[has_pt] = self.map.pt_desc[kf_pids[has_pt]]

        # BoW-free SearchByBoW equivalent: mutual-ratio Hamming matching
        n = self._match_descriptors(frame, kff, desc, has_pt, kf_pids)
        if n < 15:
            self.events.append(dict(
                frame=frame.frame_id, gate="refkf_bow_15", n=n))
            return False
        frame.Tcw = self.last_frame.Tcw.copy()
        self._pose_optimize(frame)
        n_map = self._discard_outliers(frame)
        if n_map < 10:
            self.events.append(dict(
                frame=frame.frame_id, gate="refkf_map_10", n=n_map))
        return n_map >= 10

    def _match_descriptors(self, frame, kff, desc, has_pt, kf_pids) -> int:
        """SearchByBoW(KF, Frame) equivalent: best-match with 0.7 ratio and
        rotation consistency (reference ORBmatcher.cpp:110-239)."""
        idx, best, keep = jax.device_get(
            self._jit_match_bow(
                jnp.asarray(desc), jnp.asarray(has_pt), kff.dev.angle,
                frame.dev.desc, frame.dev.valid, frame.dev.angle, 0.7,
            )
        )
        frame.point_ids[:] = -1
        # resolve collisions: best distance wins
        order = np.argsort(best)
        used = np.zeros(self._N, bool)
        cnt = 0
        for i in order:
            if keep[i] and not used[idx[i]]:
                frame.point_ids[idx[i]] = kf_pids[i]
                used[idx[i]] = True
                cnt += 1
        return cnt

    # ------------------------------------------------------------------

    def _track_local_map(self, frame: FrameHost) -> bool:
        """Reference Tracking::TrackLocalMap (Tracking.cpp:777-821).

        Local-point projection matching and the pose optimization run as
        ONE fused device program (SearchLocalPoints + PoseOptimization)."""
        self._update_local_map(frame)
        self._search_local_points(frame)

        has = frame.point_ids >= 0
        good = has & ~frame.outlier
        good_ids = frame.point_ids[good]
        self.map.pt_found[good_ids] += 1
        self.n_inliers = int((self.map.pt_nobs[good_ids] > 0).sum())
        # stereo mode drops outliers immediately (Tracking.cpp:806)
        bad = has & frame.outlier
        frame.point_ids[bad] = -1
        frame.outlier[bad] = False

        if (
            frame.frame_id < self.last_reloc_frame_id + self.max_frames
            and self.n_inliers < 50
        ):
            self.events.append(dict(
                frame=frame.frame_id, gate="local_postreloc_50",
                n=self.n_inliers))
            return False
        if self.n_inliers < 30:
            self.events.append(dict(
                frame=frame.frame_id, gate="local_30", n=self.n_inliers))
            return False
        return True

    def _update_local_map(self, frame: FrameHost):
        """UpdateLocalKeyFrames + UpdateLocalPoints (Tracking.cpp:1041-1137).
        The covisibility vote is one bincount over the map's dense
        observation mirror — no per-point dict walk in the per-frame path."""
        has = frame.point_ids >= 0
        ok = has & self.map.valid_mask(frame.point_ids)
        frame.point_ids[has & ~ok] = -1
        ids = frame.point_ids[ok]
        if ids.size == 0:
            return
        rows = self.map.pt_obs_kf[ids]
        flat = rows[rows >= 0]
        flat = flat[self.map.kf_valid.mask_of(flat)]
        if flat.size == 0:
            return
        counts = np.bincount(flat)
        voters = np.nonzero(counts)[0]
        votes = {int(k): int(counts[k]) for k in voters}
        local = list(votes)
        # add neighbors of the voters (cap 80, reference Tracking.cpp:1121)
        for kf in list(local):
            if len(local) > 80:
                break
            for nb in self.map.covisible_keyframes(kf, 10):
                if nb not in votes and nb not in local:
                    local.append(nb)
                    break  # reference adds one and breaks per category
            for ch in self.map.children.get(kf, ()):
                if ch in self.map.kf_valid and ch not in local:
                    local.append(ch)
                    break
            par = self.map.parent.get(kf)
            if par is not None and par in self.map.kf_valid and par not in local:
                local.append(par)
        self.local_keyframes = local[:80]
        self.ref_kf = max(votes, key=votes.get)

        all_pids = np.unique(
            np.concatenate([self.map.kf_point[kf] for kf in self.local_keyframes])
        )
        pts = all_pids[self.map.valid_mask(all_pids)]
        self.local_points = pts
        # reference Map::SetReferenceMapPoints (Tracking.cpp:1063): the
        # local points are what MapDrawer highlights in red
        self.map.reference_points = pts

    def _assemble_existing(self, frame: FrameHost):
        """Per-keypoint world positions for the frame's current matches
        (map points + localization-mode VO points)."""
        N = self._N
        pw = np.zeros((N, 3), np.float32)
        pids = frame.point_ids
        has = pids >= 0
        valid = has & self.map.valid_mask(pids)
        frame.point_ids[has & ~valid] = -1
        pw[valid] = self.map.pt_pos[pids[valid]]
        for i, pos in frame.temp_points.items():
            if not valid[i]:
                pw[i] = pos
                valid[i] = True
        return pw, valid

    def _search_local_points(self, frame: FrameHost):
        """SearchLocalPoints (Tracking.cpp:979-1038) + PoseOptimization as
        one fused dispatch: frustum check on host, projection matching of
        unmatched local points + pose refinement on device."""
        matched_ids = np.unique(frame.point_ids[frame.point_ids >= 0])
        self.map.pt_visible[matched_ids] += 1
        lp = np.asarray(self.local_points, np.int64)
        cand = lp[~np.isin(lp, matched_ids)]
        if cand.size == 0:
            self._pose_optimize(frame)
            return
        pos, desc, normal, dmin, dmax = self.map.points_array(cand)
        Rcw = frame.Tcw[:3, :3].astype(np.float64)
        tcw = frame.Tcw[:3, 3].astype(np.float64)
        Ow = -Rcw.T @ tcw
        pc = pos.astype(np.float64) @ Rcw.T + tcw
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        cam = self.config.camera
        u = cam.fx * pc[:, 0] / zs + cam.cx
        v = cam.fy * pc[:, 1] / zs + cam.cy
        ur = u - cam.bf / zs
        po = pos.astype(np.float64) - Ow
        dist = np.linalg.norm(po, axis=1)
        viewcos = np.einsum("ij,ij->i", po, normal) / np.maximum(dist, 1e-9)
        visible = (
            (z > 0)
            & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
            & (dist >= 0.8 * dmin) & (dist <= 1.2 * dmax)
            & (viewcos > 0.5)
        )
        self.map.pt_visible[cand[visible]] += 1
        if not visible.any():
            self._pose_optimize(frame)
            return
        # predicted scale level (MapPoint::PredictScale)
        ratio = dmax / np.maximum(dist, 1e-9)
        level = np.ceil(np.log(np.maximum(ratio, 1e-9)) / self.map.log_scale)
        level = np.clip(level, 0, self.map.n_levels - 1).astype(np.int32)

        th = 1.0
        if frame.frame_id < self.last_reloc_frame_id + 2:
            th = 5.0

        # pad candidate arrays to a stable size to limit recompiles
        P = self.config.shapes.bucket(len(cand), 512, self.config.shapes.local_cand_cap)
        def padto(a, fill=0):
            out = np.full((P,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        kp_free = frame.valid & (frame.point_ids < 0)
        pw_exist, valid_exist = self._assemble_existing(frame)
        pfk, res = jax.device_get(
            self._jit_local_step(
                frame.dev, jnp.asarray(kp_free),
                jnp.asarray(pw_exist), jnp.asarray(valid_exist),
                jnp.asarray(padto(np.stack([u, v], -1).astype(np.float32))),
                jnp.asarray(padto(ur.astype(np.float32))),
                jnp.asarray(padto(level)),
                jnp.asarray(padto(viewcos.astype(np.float32))),
                jnp.asarray(padto(desc)),
                jnp.asarray(padto(visible)),
                jnp.asarray(padto(pos.astype(np.float32))),
                jnp.asarray(frame.Tcw), th,
            )
        )
        new_hit = (pfk >= 0) & (frame.point_ids < 0) & (pfk < len(cand))
        frame.point_ids[new_hit] = cand[pfk[new_hit]]
        all_valid = valid_exist | new_hit
        if int(all_valid.sum()) >= 3:
            frame.Tcw = res.Tcw
            frame.outlier = all_valid & ~res.inlier

    # ------------------------------------------------------------------

    def _need_new_keyframe(self, frame: FrameHost) -> bool:
        """Reference Tracking::NeedNewKeyFrame (Tracking.cpp:824-897)."""
        if self.only_tracking:
            return False
        lm = self.local_mapper
        if lm is not None and lm.is_stopped():
            return False
        n_kfs = self.map.n_keyframes()
        if (
            frame.frame_id < self.last_reloc_frame_id + self.max_frames
            and n_kfs > self.max_frames
        ):
            return False
        n_min_obs = 3 if n_kfs > 2 else 2
        n_ref_matches = self._tracked_in_keyframe(self.ref_kf, n_min_obs)
        idle = lm.accept_keyframes() if lm is not None else True

        if self.config.monocular:
            need_close = False
        else:
            cc = getattr(frame, "_close_counts", None)
            if cc is not None:
                # computed on device by the fused step (no host fetch)
                tracked_close, non_tracked_close = cc
            else:
                close = frame.valid & (frame.depth > 0) & (frame.depth < self.config.depth_threshold)
                tracked_close = int((close & (frame.point_ids >= 0) & ~frame.outlier).sum())
                non_tracked_close = int((close & ((frame.point_ids < 0) | frame.outlier)).sum())
            need_close = (tracked_close < 100) and (non_tracked_close > 70)

        if n_kfs < 2:
            th_ref = 0.4
        elif self.config.monocular:
            th_ref = 0.9  # upstream monocular threshold
        else:
            th_ref = 0.75
        c1a = frame.frame_id >= self.last_kf_id + self.max_frames
        c1b = frame.frame_id >= self.last_kf_id + self.min_frames and idle
        c1c = self.n_inliers < n_ref_matches * 0.25 or need_close
        # latency-adaptive trigger (deviation from the reference, documented):
        # the reference's mapping thread turns a keyframe around in ~100 ms,
        # so waiting for idle (c1b) costs a couple of frames at most
        # (LocalMapping.cpp:22-107). Here mapping runs as batched device
        # programs whose latency can span many frames, and a fast-rotating
        # camera can lose the map entirely before the c1c emergency (0.25)
        # fires. When the mapper is busy and tracking has lost half its
        # support, force the insertion path (it still rides the reference's
        # InterruptBA + queue<3 policy below, Tracking.cpp:884-894).
        c1d = (
            not idle
            and self.n_inliers < n_ref_matches * 0.5
            and frame.frame_id >= self.last_kf_id + 3
        )
        c2 = (
            self.n_inliers < n_ref_matches * th_ref or need_close
        ) and self.n_inliers > 15

        if (c1a or c1b or c1c or c1d) and c2:
            if idle:
                decided = True
            elif lm is not None:
                lm.interrupt_ba()
                decided = lm.queue_size() < 3
            else:
                decided = False
            if decided:
                # which condition drove the insertion (diagnostics: the
                # r4 on-chip runs created ~1 KF per 2 frames — double the
                # r2 rate — and mapping work dominates the chip)
                for name, cond in (
                    ("c1a_interval", c1a), ("c1b_idle", c1b),
                    ("c1c_emergency", c1c), ("c1d_busy_decay", c1d),
                    ("need_close", need_close),
                ):
                    if cond:
                        self.kf_trigger_counts[name] = (
                            self.kf_trigger_counts.get(name, 0) + 1
                        )
            return decided
        return False

    def _tracked_in_keyframe(self, kf: Optional[int], min_obs: int) -> int:
        if kf is None or kf not in self.map.kf_valid:
            return 0
        pids = self.map.kf_point[kf]
        ok = self.map.valid_mask(pids)
        return int((self.map.pt_nobs[pids[ok]] >= min_obs).sum())

    def _create_new_keyframe(self, frame: FrameHost):
        """Reference Tracking::CreateNewKeyFrame (Tracking.cpp:899-977)."""
        kf = self.map.add_keyframe(frame, frame.Tcw)
        self.ref_kf = kf
        if self.config.monocular:
            # mono keyframes carry no stereo points; triangulation in the
            # local mapper populates the map (upstream CreateNewKeyFrame)
            self.map.update_connections(kf)
            if self.local_mapper is not None:
                self.local_mapper.insert_keyframe(kf)
            self.last_kf_id = frame.frame_id
            return
        # create close stereo points not yet mapped; the reference walks
        # depth-ascending and stops past ThDepth once 100 points exist
        # (Tracking.cpp:935-975) — both loop branches count, so the cutoff
        # is position-only and computes vectorized
        depth_ok = frame.valid & (frame.depth > 0)
        order = np.argsort(frame.depth[depth_ok])
        idxs = np.nonzero(depth_ok)[0][order]
        stop = (frame.depth[idxs] > self.config.depth_threshold) & (
            np.arange(1, len(idxs) + 1) > 100
        )
        hits = np.nonzero(stop)[0]
        if hits.size:
            idxs = idxs[: hits[0] + 1]
        cur = frame.point_ids[idxs]
        keep = (cur >= 0) & self.map.valid_mask(cur)
        keep[keep] = self.map.pt_nobs[cur[keep]] >= 1
        create = idxs[~keep]
        pids = self.map.add_stereo_points_batch(
            frame, kf, np.asarray(create, np.int64), self.config.camera
        )
        frame.point_ids[create] = pids
        self.map.kf_point[kf] = frame.point_ids.copy()
        self.map.update_connections(kf)
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf)
        self.last_kf_id = frame.frame_id

    # ------------------------------------------------------------------

    def _relocalize(self, frame: FrameHost) -> bool:
        if self.relocalizer is None:
            return False
        ok = self.relocalizer.relocalize(frame)
        if ok:
            self.last_reloc_frame_id = frame.frame_id
        return ok

    def _record_trajectory(self, frame: FrameHost):
        """Reference Tracking.cpp:503-520."""
        lost = self.state != TrackingState.OK
        if frame.Tcw is None:
            # lost before any estimate: replicate the reference (it repeats
            # the last relative pose with the lost flag set)
            if self.trajectory:
                last = self.trajectory[-1]
                self.trajectory.append(
                    TrajectoryEntry(last.Tcr, last.ref_kf, frame.timestamp, True, None)
                )
            return
        ref = self.ref_kf
        Tcr = frame.Tcw @ np.linalg.inv(self.map.kf_pose[ref])
        self.trajectory.append(
            TrajectoryEntry(Tcr, ref, frame.timestamp, lost, frame.Tcw.copy())
        )

    def reset(self):
        self._pending.clear()  # drop in-flight pipelined frames
        self.map.clear()
        self.state = TrackingState.NO_IMAGES_YET
        self.velocity = None
        self.last_frame = None
        self.ref_kf = None
        self.trajectory.clear()
        self.local_keyframes = []
        self.local_points = []
