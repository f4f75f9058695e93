"""Local mapping: keyframe processing, triangulation, fusion, local BA,
keyframe culling.

Re-implements the reference LocalMapping thread (src/LocalMapping.cpp) as a
host-sequenced pipeline stage: `insert_keyframe` runs the same steps the
mapping thread runs per queued keyframe — map-point culling, new-point
triangulation against covisible keyframes, duplicate fusion, local bundle
adjustment (TPU Schur/PCG solver), keyframe culling. The reference's
stop/interrupt flag protocol (LocalMapping.cpp:534-607) maps to simple
host flags since stages run interleaved on one queue.
"""

from __future__ import annotations

import contextlib
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import ba, matchers
from . import shapes as shapes_mod
from .ba_assembly import apply_pm_result, assemble_pm_problem
from .frontend import Frontend
from .map import SlamMap


class LocalMapper:
    def __init__(
        self,
        config: SlamConfig,
        frontend: Frontend,
        slam_map: SlamMap,
        deferred: bool = False,
    ):
        #: deferred=True approximates the reference's pipeline parallelism
        #: (P1): keyframes queue and are processed one per tracker step via
        #: pump(), spreading mapping cost across frames instead of spiking
        #: on keyframe insertion.
        self.deferred = deferred
        self.config = config
        self.shapes = config.shapes
        self.frontend = frontend
        self.map = slam_map
        self.lock = slam_map.lock  # the map-update lock (mMutexMapUpdate)
        self.cam = frontend.camera
        self.recent_points: List[int] = []  # (for MapPointCulling)
        self._stopped = False
        self._accept = True
        self._abort_ba = False
        self._queue: List[int] = []
        self.n_processed = 0
        self._kfs_since_ba = 0
        self._kfs_since_fuse = 0
        self.on_processed = None  # downstream stage hook (loop closing)
        self.timers = None  # StageTimers, wired by System
        #: MappingWorker when the pipeline runs threaded (reference
        #: System.cpp:63-65 thread spawn); None = host-sequenced
        self.worker = None

        sf = frontend.scale_factors
        sig2 = jnp.asarray(frontend.level_sigma2, jnp.float32)
        inv_sig2 = frontend.inv_level_sigma2

        # all covisible neighbors matched AND triangulated in ONE device
        # program (the reference walks neighbors sequentially and
        # triangulates per pair on the CPU, LocalMapping.cpp:202-407; the
        # host-side SVD+gates were ~100 ms of GIL/lock pressure per
        # keyframe in the r3 on-chip profile). Neighbor inputs arrive as
        # TUPLES and stack INSIDE the jit: an eager jnp.stack of K device
        # arrays dispatches a concat over the TPU tunnel per call.
        camcfg = config.camera
        fx, fy, cx, cy = camcfg.fx, camcfg.fy, camcfg.cx, camcfg.cy
        bfv = camcfg.bf
        b_half = float(config.baseline) / 2
        rfac = 1.5 * float(config.orb.scale_factor)
        _eins = lambda *a: jnp.einsum(*a, precision="highest")

        def _epi_tri_one(uv1, d1, fr1, a1, s1, dep1, ur1, o1,
                         uv2, o2, d2, fr2, a2, s2, dep2, ur2,
                         F, ep, T1, T2, Twc1, Twc2, O1, O2):
            m12 = matchers.epipolar_match(
                uv1, d1, fr1, a1, s1, uv2, o2, d2, fr2, a2, s2, F, ep,
                sf, sig2,
            )[0]
            N, M = uv1.shape[0], uv2.shape[0]
            hit = m12 >= 0
            j = jnp.clip(m12, 0, M - 1).astype(jnp.int32)
            choice = matchers._choice_matrix(j, M).astype(jnp.float32)
            vals2 = jnp.concatenate(
                [uv2, dep2[:, None], ur2[:, None],
                 o2[:, None].astype(jnp.float32),
                 s2[:, None].astype(jnp.float32)], axis=1,
            )  # [M,6]
            got = _eins("nm,mc->nc", choice, vals2)
            kp2 = got[:, :2]
            dep2m = got[:, 2]
            ur2m = got[:, 3]
            o2m = got[:, 4].astype(jnp.int32)
            s2m = got[:, 5] > 0.5

            one = jnp.ones((N, 1), jnp.float32)
            xn1 = jnp.concatenate(
                [(uv1[:, :1] - cx) / fx, (uv1[:, 1:2] - cy) / fy, one], 1)
            xn2 = jnp.concatenate(
                [(kp2[:, :1] - cx) / fx, (kp2[:, 1:2] - cy) / fy, one], 1)
            ray1 = _eins("ni,ij->nj", xn1, T1[:3, :3])
            ray2 = _eins("ni,ij->nj", xn2, T2[:3, :3])
            cos_rays = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
                jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1),
                1e-12,
            )
            cos_st1 = jnp.where(
                s1, jnp.cos(2 * jnp.arctan2(b_half, jnp.maximum(dep1, 1e-9))),
                2.0,
            )
            cos_st2 = jnp.where(
                s2m, jnp.cos(2 * jnp.arctan2(b_half, jnp.maximum(dep2m, 1e-9))),
                2.0,
            )
            cos_stereo = jnp.minimum(cos_st1, cos_st2)
            use_tri = (
                (cos_rays < cos_stereo) & (cos_rays > 0)
                & (s1 | s2m | (cos_rays < 0.9998))
            )
            use_s1 = ~use_tri & s1 & (cos_st1 < cos_st2)
            use_s2 = ~use_tri & ~use_s1 & s2m & (cos_st2 < cos_st1)

            # DLT 4x4 system (reference builds the same rows and takes the
            # SVD nullspace, LocalMapping.cpp:292-320). Finite points have
            # w != 0, so the inhomogeneous 3x3 normal-equation solve
            # B x = -b (B = A[:, :3], b = A[:, 3]) gives the same point —
            # and costs 2 ms where the batched 4x4 eigh cost 44 ms on-chip
            # (tools/profile_eigh.py). Parallax (use_tri) and chi2 gates
            # below reject the ill-conditioned cases either way.
            A = jnp.stack(
                [
                    xn1[:, 0:1] * T1[2, :] - T1[0, :],
                    xn1[:, 1:2] * T1[2, :] - T1[1, :],
                    xn2[:, 0:1] * T2[2, :] - T2[0, :],
                    xn2[:, 1:2] * T2[2, :] - T2[1, :],
                ],
                axis=1,
            )  # [N,4,4]
            B = A[..., :3]
            bb = A[..., 3]
            BtB = _eins("nij,nik->njk", B, B)
            Btb = _eins("nij,ni->nj", B, bb)
            mm = BtB
            c00 = mm[:, 1, 1] * mm[:, 2, 2] - mm[:, 1, 2] * mm[:, 2, 1]
            c10 = mm[:, 1, 2] * mm[:, 2, 0] - mm[:, 1, 0] * mm[:, 2, 2]
            c20 = mm[:, 1, 0] * mm[:, 2, 1] - mm[:, 1, 1] * mm[:, 2, 0]
            c01 = mm[:, 0, 2] * mm[:, 2, 1] - mm[:, 0, 1] * mm[:, 2, 2]
            c11 = mm[:, 0, 0] * mm[:, 2, 2] - mm[:, 0, 2] * mm[:, 2, 0]
            c21 = mm[:, 0, 1] * mm[:, 2, 0] - mm[:, 0, 0] * mm[:, 2, 1]
            c02 = mm[:, 0, 1] * mm[:, 1, 2] - mm[:, 0, 2] * mm[:, 1, 1]
            c12 = mm[:, 0, 2] * mm[:, 1, 0] - mm[:, 0, 0] * mm[:, 1, 2]
            c22 = mm[:, 0, 0] * mm[:, 1, 1] - mm[:, 0, 1] * mm[:, 1, 0]
            det = mm[:, 0, 0] * c00 + mm[:, 0, 1] * c10 + mm[:, 0, 2] * c20
            h_ok = jnp.abs(det) >= 1e-18
            inv = jnp.stack(
                [
                    jnp.stack([c00, c01, c02], -1),
                    jnp.stack([c10, c11, c12], -1),
                    jnp.stack([c20, c21, c22], -1),
                ],
                axis=1,
            ) / jnp.where(h_ok, det, 1.0)[:, None, None]
            x_tri = -_eins("nij,nj->ni", inv, Btb)

            def unproject(uv, dep, Twc):
                pc = jnp.stack(
                    [(uv[:, 0] - cx) * dep / fx, (uv[:, 1] - cy) * dep / fy,
                     dep], 1)
                return _eins("ni,ji->nj", pc, Twc[:3, :3]) + Twc[:3, 3]

            x3d = jnp.where(
                use_tri[:, None], x_tri,
                jnp.where(
                    use_s1[:, None], unproject(uv1, dep1, Twc1),
                    unproject(kp2, dep2m, Twc2),
                ),
            )
            valid = hit & ((use_tri & h_ok) | use_s1 | use_s2)

            # reprojection gates in both keyframes (chi2 5.991/7.8)
            for T, uv, urm, octv, st in (
                (T1, uv1, ur1, o1, s1), (T2, kp2, ur2m, o2m, s2m),
            ):
                pc = _eins("ni,ji->nj", x3d, T[:3, :3]) + T[:3, 3]
                z = pc[:, 2]
                zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
                u = fx * pc[:, 0] / zs + cx
                v = fy * pc[:, 1] / zs + cy
                ex = u - uv[:, 0]
                ey = v - uv[:, 1]
                er = jnp.where(st, (u - bfv / zs) - urm, 0.0)
                e2 = ex * ex + ey * ey + er * er
                th = jnp.where(st, 7.8, 5.991) * matchers.lookup_level(
                    sig2, octv
                )
                valid &= (z > 0) & (e2 <= th)

            # scale-consistency gate (LocalMapping.cpp:389-400)
            d1n = jnp.linalg.norm(x3d - O1, axis=1)
            d2n = jnp.linalg.norm(x3d - O2, axis=1)
            ratio_dist = d2n / jnp.maximum(d1n, 1e-12)
            ratio_oct = matchers.lookup_level(sf, o1) / jnp.maximum(
                matchers.lookup_level(sf, o2m), 1e-12
            )
            valid &= (d1n > 0) & (d2n > 0)
            valid &= ~(
                (ratio_dist * rfac < ratio_oct)
                | (ratio_dist > ratio_oct * rfac)
            )
            return m12, x3d, valid

        _epi_vmap = jax.vmap(
            _epi_tri_one,
            in_axes=(None,) * 8 + (0,) * 8 + (0, 0, None, 0, None, 0, None, 0),
        )

        def _epi_batch(uv1, d1, f1, a1, s1, dep1, ur1, o1,
                       uv2s, o2s, d2s, fr2s, a2s, st2s, dep2s, ur2s,
                       Fs, eps, T1, T2s, Twc1, Twc2s, O1, O2s):
            return _epi_vmap(
                uv1, d1, f1, a1, s1, dep1, ur1, o1,
                jnp.stack(uv2s), jnp.stack(o2s), jnp.stack(d2s),
                jnp.stack(fr2s), jnp.stack(a2s), jnp.stack(st2s),
                jnp.stack(dep2s), jnp.stack(ur2s),
                jnp.stack(Fs), jnp.stack(eps),
                T1, jnp.stack(T2s), Twc1, jnp.stack(Twc2s),
                O1, jnp.stack(O2s),
            )

        self._jit_epipolar_batch = jax.jit(_epi_batch)
        self._jit_fuse = jax.jit(
            lambda uv_kp, o_kp, ur_kp, d_kp, v_kp, uv_pt, ur_pt, l_pt, d_pt, v_pt: matchers.fuse_match(
                uv_kp, o_kp, ur_kp, d_kp, v_kp,
                uv_pt, ur_pt, l_pt, d_pt, v_pt,
                sf, inv_sig2,
            )
        )
        # forward fusion into ALL 1st+2nd-ring neighbors as ONE vmapped
        # device program (the reference walks targets sequentially,
        # LocalMapping.cpp:466-478; per-target round trips dominated the
        # mapping stage over the TPU tunnel). Tuple inputs, stacked
        # inside the jit (same eager-dispatch rationale as the epipolar
        # batch above).
        _fuse_vmap = jax.vmap(
            lambda uv_kp, o_kp, ur_kp, d_kp, v_kp, uv_pt, ur_pt, l_pt, d_pt, v_pt: matchers.fuse_match(
                uv_kp, o_kp, ur_kp, d_kp, v_kp,
                uv_pt, ur_pt, l_pt, d_pt, v_pt,
                sf, inv_sig2,
            )[0],
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, 0),
        )

        def _fuse_batch(kuv, koct, kur, kdesc, kval, uvs, urs, lvls, desc,
                        viss):
            return _fuse_vmap(
                jnp.stack(kuv), jnp.stack(koct), jnp.stack(kur),
                jnp.stack(kdesc), jnp.stack(kval),
                jnp.stack(uvs), jnp.stack(urs), jnp.stack(lvls), desc,
                jnp.stack(viss),
            )

        self._jit_fuse_batch = jax.jit(_fuse_batch)

        # forward (into 16 targets) AND backward (targets' points into the
        # current keyframe) fusion as ONE device program: SearchInNeighbors
        # paid two synchronous launches per keyframe (~25 ms tunnel round
        # trip each, r5 profile); the two matches are independent given
        # their host-projected inputs, so one dispatch + one fetch covers
        # both directions
        def _fuse_both(kuv, koct, kur, kdesc, kval, uvs, urs, lvls, desc,
                       viss, b_uv, b_oct, b_ur, b_desc, b_val,
                       b_uvp, b_urp, b_lvl, b_pdesc, b_vis):
            fwd = _fuse_vmap(
                jnp.stack(kuv), jnp.stack(koct), jnp.stack(kur),
                jnp.stack(kdesc), jnp.stack(kval),
                jnp.stack(uvs), jnp.stack(urs), jnp.stack(lvls), desc,
                jnp.stack(viss),
            )
            bwd = matchers.fuse_match(
                b_uv, b_oct, b_ur, b_desc, b_val,
                b_uvp, b_urp, b_lvl, b_pdesc, b_vis,
                sf, inv_sig2,
            )[0]
            return fwd, bwd

        self._jit_fuse_both = jax.jit(_fuse_both)
    # ------------------------------------------------------- tracker API
    def is_stopped(self) -> bool:
        return self._stopped

    def accept_keyframes(self) -> bool:
        return self._accept

    def interrupt_ba(self):
        self._abort_ba = True

    def queue_size(self) -> int:
        return len(self._queue)

    def request_stop(self):
        """Reference LocalMapping::RequestStop (LocalMapping.cpp:556-561):
        also aborts a running BA so the thread parks promptly."""
        self._stopped = True
        self._abort_ba = True

    def wait_stopped(self, timeout: float = 60.0):
        """Spin until no keyframe is mid-processing (reference CorrectLoop's
        isStopped() wait, LoopClosing.cpp:412-415). No-op when unthreaded."""
        if self.worker is not None:
            self.worker.wait_parked(timeout)

    def release(self):
        self._stopped = False

    # -------------------------------------------------------------------

    def insert_keyframe(self, kf: int):
        """Queue one keyframe (reference LocalMapping::InsertKeyFrame,
        LocalMapping.cpp:109-114). Threaded: wakes the mapping worker.
        Host-sequenced: processes inline (or per-frame via pump())."""
        self._queue.append(kf)
        if self.worker is not None:
            self.worker.notify()
            return
        if self._stopped or self.deferred:
            return
        while self._queue:
            k = self._queue.pop(0)
            self._process(k)

    def pump(self):
        """Process one queued keyframe (deferred mode: called once per
        tracked frame; threaded mode: called by the worker loop)."""
        if self._stopped or not self._queue:
            return
        self._process(self._queue.pop(0))

    def _span(self, name):
        return self.timers.span(name) if self.timers else contextlib.nullcontext()

    def _process(self, kf: int):
        """The mapping thread loop body (reference LocalMapping::Run,
        LocalMapping.cpp:22-107). EVERY stage follows the same discipline
        as local BA: assemble under the map lock, run the device solve
        unlocked, apply under the lock — the reference's mapping thread
        likewise takes mMutexMapUpdate only for write-back
        (Optimizer.cpp:745). The tracker's per-frame map admin is never
        blocked for the duration of a device round trip."""
        self._accept = False  # reference SetAcceptKeyFrames(false)
        try:
            with self.lock:
                # a queued keyframe may have been culled by a previous
                # keyframe's KeyFrameCulling pass before this worker got
                # to it (the reference's isBad() guards cover the same
                # race)
                if kf not in self.map.kf_valid:
                    return
                with self._span("Keyframe insertion"):
                    self.map.update_connections(kf)
                with self._span("Map point culling"):
                    self._cull_map_points(kf)
            with self._span("Map point creation"):
                self._create_new_points(kf)  # manages the lock internally
            # The reference runs SearchInNeighbors only when the queue is
            # empty (LocalMapping.cpp:76-79) — safe there because its CPU
            # stages turn a keyframe around in ~100 ms and the queue rarely
            # backs up. Here a backed-up queue starving fusion is a
            # FEEDBACK LOOP: fresh stereo points (nobs=2) die at the age-2
            # cull unless fusion adds a neighbor observation, close-point
            # support collapses, and the tracker's need_close emergency
            # (Tracking.cpp:852-857) floods the queue further (r5 diag:
            # fusion ran for 49/118 keyframes; tracked_close p50=97 vs the
            # <100 gate). Documented deviation: force fusion after 2
            # consecutive skips, mirroring the BA force-run below.
            self._kfs_since_fuse += 1
            if not self._queue or self._kfs_since_fuse >= 2:
                self._kfs_since_fuse = 0
                with self._span("Map point fusion"):
                    self._fuse_neighbors(kf)  # manages the lock internally
            # gate on _stopped: a LoopCloser.request_stop() landing between
            # pump()'s entry check and here must not be nullified by the
            # _abort_ba reset (reference checks !stopRequested() before the
            # BA, LocalMapping.cpp:68).
            # The reference runs local BA per keyframe because its queue
            # rarely backs up (LocalMapping.cpp:64-73); here a sustained
            # keyframe inflow must not starve BA/culling forever, so they
            # also force-run after 3 unoptimized keyframes (the BA remains
            # interruptible by the tracker's InsertKeyFrame).
            self._kfs_since_ba += 1
            if (
                self.map.n_keyframes() > 2
                and (not self._queue or self._kfs_since_ba >= 3)
                and not self._stopped
            ):
                self._kfs_since_ba = 0
                self._abort_ba = False
                with self._span("Local BA"):
                    self._local_ba(kf)
                with self.lock:
                    with self._span("Keyframe culling"):
                        self._cull_keyframes(kf)
            self.n_processed += 1
            if self.on_processed is not None:
                self.on_processed(kf)
        finally:
            self._accept = True

    # -------------------------------------------------------------------

    def _cull_map_points(self, kf: int):
        """Reference LocalMapping::MapPointCulling (LocalMapping.cpp:165-195)."""
        th_obs = 2 if self.config.monocular else 3
        if not self.recent_points:
            return
        m = self.map
        pids = np.asarray(self.recent_points, np.int64)
        pids = pids[m.valid_mask(pids)]
        found = m.pt_found[pids]
        visible = np.maximum(m.pt_visible[pids], 1)
        age = kf - m.pt_first_kf_id[pids]
        remove = (found / visible < 0.25) | (
            (age >= 2) & (m.pt_nobs[pids] <= th_obs)
        )
        for pid in pids[remove]:
            m.remove_point(int(pid))
        # age>=3 survives culling and leaves the probation list
        self.recent_points = pids[~remove & (age < 3)].tolist()

    # -------------------------------------------------------------------

    def _bucket_k(self, n: int) -> int:
        """Neighbor-axis bucket for the vmapped epipolar launch."""
        return self.shapes.bucket_select(n, 1, self.shapes.neighbor_cap)

    def _fundamental(self, kf1: int, kf2: int) -> np.ndarray:
        """Reference LocalMapping::ComputeF12 (LocalMapping.cpp:512-532)."""
        T1 = self.map.kf_pose[kf1].astype(np.float64)
        T2 = self.map.kf_pose[kf2].astype(np.float64)
        T12 = T1 @ np.linalg.inv(T2)
        R12, t12 = T12[:3, :3], T12[:3, 3]
        tx = np.array(
            [[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]], [-t12[1], t12[0], 0]]
        )
        c = self.config.camera
        K = np.array([[c.fx, 0, c.cx], [0, c.fy, c.cy], [0, 0, 1]])
        Kinv = np.linalg.inv(K)
        return (Kinv.T @ tx @ R12 @ Kinv).astype(np.float32)

    def _create_new_points(self, kf1: int):
        """Reference LocalMapping::CreateNewMapPoints (LocalMapping.cpp:197-431).

        Three phases: snapshot the keyframe + neighbor state under the map
        lock, run the ONE vmapped epipolar launch + fetch unlocked, then
        triangulate and write new points back under the lock (with
        validity re-checks — a loop correction may have landed meanwhile)."""
        c = self.config.camera
        b = self.config.baseline

        with self.lock:
            if kf1 not in self.map.kf_valid:
                return
            f1 = self.map.kf_frame[kf1]
            T1 = self.map.kf_pose[kf1].astype(np.float64).copy()
            O1 = self.map.kf_center(kf1)
            pids1 = self.map.kf_point[kf1]
            free1 = f1.valid & (pids1 < 0)
            stereo1 = f1.u_right >= 0

            neighbors = self.map.covisible_keyframes(
                kf1, 20 if self.config.monocular else 10
            )
            # gather per-neighbor inputs; all neighbors are matched in ONE
            # vmapped device program (vs one round trip each in the
            # sequential reference walk, LocalMapping.cpp:202-231)
            active = []
            for kf2 in neighbors:
                O2 = self.map.kf_center(kf2)
                baseline = np.linalg.norm(O2 - O1)
                if self.config.monocular:
                    # mono rule: baseline / median scene depth (upstream
                    # LocalMapping.cpp): skip near-zero-parallax neighbors
                    med = self._median_scene_depth(kf2)
                    if med <= 0 or baseline / med < 0.01:
                        continue
                elif baseline < b:  # stereo rule (LocalMapping.cpp:232-239)
                    continue
                f2 = self.map.kf_frame[kf2]
                T2 = self.map.kf_pose[kf2].astype(np.float64).copy()
                pids2 = self.map.kf_point[kf2]
                free2 = f2.valid & (pids2 < 0)
                stereo2 = f2.u_right >= 0
                F12 = self._fundamental(kf1, kf2)
                # epipole of kf1 center in kf2
                C2 = T2[:3, :3] @ O1 + T2[:3, 3]
                ep = np.array(
                    [c.fx * C2[0] / C2[2] + c.cx, c.fy * C2[1] / C2[2] + c.cy],
                    np.float32,
                )
                active.append((kf2, T2, O2, f2, free2, stereo2, F12, ep))
        if not active:
            return

        # --- unlocked: ONE device launch matches AND triangulates against
        # every neighbor (frame features are immutable device snapshots;
        # poses were copied above). Neighbor axis padded to a bucket
        # (fixed cap when configured); padding rows reuse the first
        # neighbor's features with free2=False
        K = self._bucket_k(len(active))
        active = active[:K]  # fixed-cap overflow: keep top-covisible
        Twc1 = np.linalg.inv(T1)
        uv2s, o2s, d2s, fr2s, a2s, st2s = ([] for _ in range(6))
        dep2s, ur2s, Fs, eps, T2s, Twc2s, O2s = ([] for _ in range(7))
        for i in range(K):
            kf2, T2, O2, f2, fr, st, F12, ep = (
                active[i] if i < len(active) else active[0]
            )
            uv2s.append(f2.dev.uv)
            o2s.append(f2.dev.octave)
            d2s.append(f2.dev.desc)
            fr2s.append(fr if i < len(active) else np.zeros_like(fr))
            a2s.append(f2.dev.angle)
            st2s.append(st)
            dep2s.append(f2.dev.depth)
            ur2s.append(f2.dev.u_right)
            Fs.append(F12)
            eps.append(ep)
            T2s.append(T2.astype(np.float32))
            Twc2s.append(np.linalg.inv(T2).astype(np.float32))
            O2s.append(O2.astype(np.float32))
        m12_all, x3d_all, valid_all = jax.device_get(
            self._jit_epipolar_batch(
                f1.dev.uv, f1.dev.desc, free1,
                f1.dev.angle, stereo1, f1.dev.depth, f1.dev.u_right,
                f1.dev.octave,
                tuple(uv2s), tuple(o2s), tuple(d2s),
                tuple(fr2s), tuple(a2s), tuple(st2s),
                tuple(dep2s), tuple(ur2s),
                tuple(Fs), tuple(eps),
                T1.astype(np.float32), tuple(T2s),
                Twc1.astype(np.float32), tuple(Twc2s),
                O1.astype(np.float32), tuple(O2s),
            )
        )
        results = []
        for j, (kf2, T2, O2, f2, free2, stereo2, F12, ep) in enumerate(active):
            sel = valid_all[j] & (m12_all[j] >= 0)
            i1 = np.nonzero(sel)[0]
            if i1.size:
                i2 = m12_all[j][i1].astype(np.int64)
                results.append((kf2, i1, i2, x3d_all[j][i1].astype(np.float64)))

        # --- locked: claim + allocate (vectorized writes; a kp claimed by
        # an earlier neighbor is skipped — the sequential reference
        # excluded it from matching, LocalMapping.cpp:274-280)
        created_all = []
        with self.lock:
            if kf1 not in self.map.kf_valid:
                return
            m = self.map
            for kf2, i1, i2, x3d in results:
                if kf2 not in m.kf_valid:
                    continue
                keep = (m.kf_point[kf1][i1] < 0) & (m.kf_point[kf2][i2] < 0)
                if not keep.any():
                    continue
                created_all.extend(
                    self._commit_triangulated(
                        kf1, kf2, i1[keep], i2[keep], x3d[keep]
                    )
                )
            if created_all:
                self.recent_points.extend(created_all)
                m.update_normals_batch(created_all)

    def _commit_triangulated(self, kf1, kf2, a_idx, b_idx, x3d):
        """Allocate + register new points (caller holds the map lock;
        normals/recent-point bookkeeping is batched by the caller)."""
        m = self.map
        f1 = m.kf_frame[kf1]
        f2 = m.kf_frame[kf2]
        n = len(a_idx)
        if n == 0:
            return []
        base = m._alloc_points(n)
        new_ids = np.arange(base, base + n)
        m.pt_pos[new_ids] = x3d
        # distinctive descriptor of a fresh 2-obs point is the first
        # observation's (both medians tie; argmin picks row 0)
        m.pt_desc[new_ids] = f1.desc[a_idx].astype(np.uint32)
        m.pt_ref_kf[new_ids] = kf1
        m.pt_first_kf_id[new_ids] = kf1
        m.pt_nobs[new_ids] = np.where(f1.u_right[a_idx] >= 0, 2, 1) + np.where(
            f2.u_right[b_idx] >= 0, 2, 1
        )
        for j in range(n):
            m.pt_obs[base + j] = {kf1: int(a_idx[j]), kf2: int(b_idx[j])}
        # dense mirror (rows are freshly allocated, already -1)
        m.pt_obs_kf[new_ids, 0] = kf1
        m.pt_obs_idx[new_ids, 0] = a_idx
        m.pt_obs_kf[new_ids, 1] = kf2
        m.pt_obs_idx[new_ids, 1] = b_idx
        m.pt_obs_n[new_ids] = 2
        m.kf_point[kf1][a_idx] = new_ids
        m.kf_point[kf2][b_idx] = new_ids
        return new_ids.tolist()

    def _median_scene_depth(self, kf: int) -> float:
        """KeyFrame::ComputeSceneMedianDepth equivalent."""
        T = self.map.kf_pose[kf].astype(np.float64)
        pids = self.map.kf_point[kf]
        ok = self.map.valid_mask(pids)
        if not ok.any():
            return -1.0
        z = self.map.pt_pos[pids[ok]] @ T[2, :3] + T[2, 3]
        return float(np.median(z))

    def _unproject_kf(self, kf: int, i: int) -> np.ndarray:
        c = self.config.camera
        f = self.map.kf_frame[kf]
        z = f.depth[i]
        u, v = f.uv[i]
        pc = np.array([(u - c.cx) * z / c.fx, (v - c.cy) * z / c.fy, z, 1.0])
        return (np.linalg.inv(self.map.kf_pose[kf].astype(np.float64)) @ pc)[:3]

    # -------------------------------------------------------------------

    def _fuse_neighbors(self, kf: int):
        """Reference LocalMapping::SearchInNeighbors (LocalMapping.cpp:433-510).

        Assemble (host frustum gates) under the map lock, run BOTH fuse
        directions as ONE unlocked device launch, apply the merges under
        the lock — `_apply_fuse_matches` re-validates every pid so
        mid-flight map mutations are safe."""
        sh = self.shapes
        with self.lock:
            if kf not in self.map.kf_valid:
                return
            targets = []
            for nb in self.map.covisible_keyframes(kf, 10):
                targets.append(nb)
                for nb2 in self.map.covisible_keyframes(nb, 5):
                    if nb2 != kf and nb2 not in targets:
                        targets.append(nb2)
            targets = targets[: sh.fuse_targets_cap]
            kp = self.map.kf_point[kf]
            cur_pids = kp[self.map.valid_mask(kp)]
            fwd = self._assemble_fuse_forward_locked(targets, cur_pids)
            bwd = self._assemble_fuse_backward_locked(kf, targets)
        # --- unlocked: frustum/scale projections for both directions
        fwd = self._project_fuse_forward(fwd)
        bwd = self._project_fuse_backward(bwd)
        if fwd is None and bwd is None:
            return
        # degenerate directions still ride the same program with all-False
        # visibility (ONE compiled shape)
        args_f = self._pack_fuse_forward(fwd)
        args_b = self._pack_fuse_backward(bwd)
        best_f, best_b = self._jit_fuse_both(*args_f, *args_b)
        best_f = np.asarray(best_f)
        best_b = np.asarray(best_b)
        with self.lock:
            if kf not in self.map.kf_valid:
                return
            if fwd is not None:
                nf = len(fwd["pids"])
                for i, (t, _, _, _, _) in enumerate(fwd["rows"]):
                    if t in self.map.kf_valid:
                        self._apply_fuse_matches(
                            t, fwd["pids"], best_f[i, :nf]
                        )
            if bwd is not None:
                self._apply_fuse_matches(
                    kf, bwd["pids"], best_b[: len(bwd["pids"])]
                )
            # refresh point stats + connections of the current keyframe
            kp = self.map.kf_point[kf]
            pids = kp[kp >= 0]
            self.map.compute_distinctive_descriptors_batch(pids)
            self.map.update_normals_batch(pids)
            self.map.update_connections(kf)

    def _project_for_fuse(self, kf: int, pos, normal, dmin, dmax,
                          T=None, Ow=None):
        """Host frustum/scale gates for fusing points into one keyframe
        (the cheap numpy half of ORBmatcher::Fuse). Returns
        (uv [P,2] f32, ur [P] f32, level [P] i32, visible [P] bool).
        Pass a snapshotted (T, Ow) to run WITHOUT the map lock."""
        c = self.config.camera
        if T is None:
            T = self.map.kf_pose[kf].astype(np.float64)
        if Ow is None:
            Ow = self.map.kf_center(kf)
        pc = pos.astype(np.float64) @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        u = c.fx * pc[:, 0] / zs + c.cx
        v = c.fy * pc[:, 1] / zs + c.cy
        ur = u - c.bf / zs
        po = pos.astype(np.float64) - Ow
        dist = np.linalg.norm(po, axis=1)
        viewcos = np.einsum("ij,ij->i", po, normal) / np.maximum(dist, 1e-9)
        visible = (
            (z > 0)
            & (u >= 0) & (u < c.width) & (v >= 0) & (v < c.height)
            & (dist >= dmin) & (dist <= dmax)
            & (viewcos > 0.5)
        )
        ratio = dmax / np.maximum(dist, 1e-9)
        level = np.clip(
            np.ceil(np.log(np.maximum(ratio, 1e-9)) / self.map.log_scale),
            0, self.map.n_levels - 1,
        ).astype(np.int32)
        return (
            np.stack([u, v], -1).astype(np.float32),
            ur.astype(np.float32), level, visible,
        )

    def _apply_fuse_matches(self, kf: int, pids, best_idx):
        """Merge protocol per matched (point, feature) pair (reference
        ORBmatcher.cpp:795-818): replace the weaker of the two points or
        add the new observation. Descriptor refreshes are deferred to one
        batched pass (the per-merge refresh dominated fusion host time)."""
        kf_pids = self.map.kf_point[kf]
        survivors = []
        # iterate matched rows only (the dense loop was ~33k python
        # iterations per fusion pass holding the map lock)
        for j in np.nonzero(np.asarray(best_idx) >= 0)[0]:
            fi = int(best_idx[j])
            pid = self.map.resolve_replaced(int(pids[j]))
            if pid not in self.map.pt_valid or kf in self.map.pt_obs[pid]:
                continue
            existing = int(kf_pids[fi])
            if existing >= 0 and existing in self.map.pt_valid:
                # replace the one with fewer observations (ORBmatcher.cpp:795-807)
                if self.map.n_observations(existing) > self.map.n_observations(pid):
                    self.map.replace_point(pid, existing, refresh_desc=False)
                    survivors.append(existing)
                else:
                    self.map.replace_point(existing, pid, refresh_desc=False)
                    survivors.append(pid)
            else:
                self.map.add_observation(pid, kf, fi)
        if survivors:
            self.map.compute_distinctive_descriptors_batch(survivors)

    def _assemble_fuse_forward_locked(self, targets, pids):
        """Forward-fuse snapshot (caller holds the map lock): the source
        point tables and each target's pose/center/points — array copies
        only, so the lock is held briefly."""
        pids = np.asarray(pids, np.int64)
        if pids.size == 0 or not targets:
            return None
        sh = self.shapes
        pids = shapes_mod.select_top(
            pids, self.map.pt_nobs[pids].astype(np.float64),
            sh.bucket_select(len(pids), 256, sh.fuse_src_cap),
        )
        pos, desc, normal, dmin, dmax = self.map.points_array(pids)
        snaps = []
        for t in targets:
            if t not in self.map.kf_valid:
                continue
            tp = self.map.kf_point[t]
            snaps.append((
                t, self.map.kf_pose[t].astype(np.float64).copy(),
                self.map.kf_center(t), tp[tp >= 0].copy(),
            ))
        if not snaps:
            return None
        frames = {s[0]: self.map.kf_frame[s[0]] for s in snaps}
        return dict(
            pids=pids, pos=pos, desc=desc, normal=normal, dmin=dmin,
            dmax=dmax, snaps=snaps, frames=frames,
        )

    def _assemble_fuse_backward_locked(self, kf: int, targets):
        """Backward-fuse snapshot (caller holds the map lock): the union
        of the targets' points not already observed by kf, plus kf's
        pose/center/frame."""
        f = self.map.kf_frame[kf]
        out = dict(frame=f, pids=np.zeros(0, np.int64))
        if not targets:
            return out
        cands = np.unique(
            np.concatenate([
                self.map.kf_point[t]
                for t in targets if t in self.map.kf_valid
            ] or [np.zeros(0, np.int64)])
        )
        pids = cands[self.map.valid_mask(cands)]
        tp = self.map.kf_point[kf]
        pids = pids[~np.isin(pids, tp[tp >= 0])]
        if pids.size == 0:
            return out
        pos, desc, normal, dmin, dmax = self.map.points_array(pids)
        out.update(
            pids=pids, pos=pos, desc=desc, normal=normal, dmin=dmin,
            dmax=dmax, T=self.map.kf_pose[kf].astype(np.float64).copy(),
            Ow=self.map.kf_center(kf),
        )
        return out

    def _project_fuse_forward(self, fwd):
        """Unlocked frustum/scale gates per forward target — at 16
        targets x 2048 points this was ~tens of ms of numpy that must not
        hold the map lock against the tracker (r5 p50 profile)."""
        if fwd is None:
            return None
        rows = []
        for t, T, Ow, tp_pids in fwd["snaps"]:
            uv, ur, level, visible = self._project_for_fuse(
                t, fwd["pos"], fwd["normal"], fwd["dmin"], fwd["dmax"],
                T=T, Ow=Ow,
            )
            # skip points this target already observes (vectorized)
            visible &= ~np.isin(fwd["pids"], tp_pids)
            rows.append((t, uv, ur, level, visible))
        rows = [r for r in rows if r[4].any()]
        if not rows:
            return None
        fwd["rows"] = rows
        return fwd

    def _project_fuse_backward(self, bwd):
        if bwd is None or bwd["pids"].size == 0:
            return None
        sh = self.shapes
        uv, ur, level, visible = self._project_for_fuse(
            None, bwd["pos"], bwd["normal"], bwd["dmin"], bwd["dmax"],
            T=bwd["T"], Ow=bwd["Ow"],
        )
        if not visible.any():
            return None
        # only frustum-visible rows go to the device (bounds the bucket)
        sel = np.nonzero(visible)[0]
        cap = sh.bucket_select(len(sel), 256, sh.fuse_pt_cap)
        if len(sel) > cap:
            sel = sel[:cap]  # overflow returns on a later keyframe
        bwd.update(
            pids=bwd["pids"][sel], uv=uv[sel], ur=ur[sel],
            level=level[sel], desc=bwd["desc"][sel], visible=visible[sel],
        )
        return bwd

    def _pack_fuse_forward(self, fwd):
        """Fixed-bucket device arrays for the forward half of the fused
        launch; a None direction packs all-False visibility (the program
        shape never varies)."""
        sh = self.shapes
        N = self.config.orb.n_features
        P = sh.bucket(256, 256, sh.fuse_src_cap)
        if fwd is None:
            z2 = np.zeros((P, 2), np.float32)
            z1 = np.zeros(P, np.float32)
            zi = np.zeros(P, np.int32)
            zd = np.zeros((P, 8), np.uint32)
            zv = np.zeros(P, bool)
            zf_uv = np.zeros((N, 2), np.float32)
            zf_f = np.zeros(N, np.float32)
            zf_i = np.zeros(N, np.int32)
            zf_d = np.zeros((N, 8), np.uint32)
            zf_b = np.zeros(N, bool)
            K = sh.bucket_select(1, 1, sh.fuse_targets_cap)
            return (
                (zf_uv,) * K, (zf_i,) * K, (zf_f,) * K, (zf_d,) * K,
                (zf_b,) * K, (z2,) * K, (z1,) * K, (zi,) * K, zd,
                (zv,) * K,
            )
        P = sh.bucket(len(fwd["pids"]), 256, sh.fuse_src_cap)

        def padto(a, fill=0):
            return shapes_mod.pad_rows(a, P, fill)

        rows = fwd["rows"]
        K = sh.bucket_select(len(rows), 1, sh.fuse_targets_cap)
        uvs, urs, lvls, viss = [], [], [], []
        kuv, koct, kur, kdesc, kval = [], [], [], [], []
        no_vis = np.zeros(P, bool)
        for i in range(K):
            t, uv, ur, level, visible = rows[i if i < len(rows) else 0]
            f = fwd["frames"][t]
            kuv.append(f.dev.uv)
            koct.append(f.dev.octave)
            kur.append(f.dev.u_right)
            kdesc.append(f.dev.desc)
            kval.append(f.dev.valid)
            uvs.append(padto(uv))
            urs.append(padto(ur))
            lvls.append(padto(level))
            viss.append(padto(visible) if i < len(rows) else no_vis)
        return (
            tuple(kuv), tuple(koct), tuple(kur), tuple(kdesc), tuple(kval),
            tuple(uvs), tuple(urs), tuple(lvls), padto(fwd["desc"]),
            tuple(viss),
        )

    def _pack_fuse_backward(self, bwd):
        sh = self.shapes
        N = self.config.orb.n_features
        if bwd is None:
            P = sh.bucket(256, 256, sh.fuse_pt_cap)
            return (
                np.zeros((N, 2), np.float32), np.zeros(N, np.int32),
                np.zeros(N, np.float32), np.zeros((N, 8), np.uint32),
                np.zeros(N, bool),
                np.zeros((P, 2), np.float32), np.zeros(P, np.float32),
                np.zeros(P, np.int32), np.zeros((P, 8), np.uint32),
                np.zeros(P, bool),
            )
        P = sh.bucket(len(bwd["pids"]), 256, sh.fuse_pt_cap)

        def padto(a, fill=0):
            return shapes_mod.pad_rows(a, P, fill)

        f = bwd["frame"]
        return (
            f.dev.uv, f.dev.octave, f.dev.u_right, f.dev.desc, f.dev.valid,
            padto(bwd["uv"]), padto(bwd["ur"]), padto(bwd["level"]),
            padto(bwd["desc"]), padto(bwd["visible"]),
        )

    # -------------------------------------------------------------------

    def _local_ba(self, kf: int):
        """Assemble and solve the local bundle (reference
        Optimizer::LocalBundleAdjustment, src/Optimizer.cpp:426-787).
        Assembly and write-back hold the map lock; the (interruptible)
        device solve runs without it."""
        with self.lock:
            prob, meta = self._assemble_local_ba(kf)
        if prob is None:
            return
        # interruptible schedule: the tracker's interrupt_ba() (reference
        # mbAbortBA, LocalMapping.cpp:109-114) is honored between LM
        # iterations; on abort the partial estimate is still written back
        res = ba.ba_solve_pm_interruptible(
            prob, self.cam, should_abort=lambda: self._abort_ba,
            sync_every=32,  # no mid-phase syncs: each sync is a full
            # tunnel round trip (~30 ms measured r5) while the whole
            # 5+10 schedule is 30-110 ms of device time depending on the
            # tier — the abort check between the two phases preempts
            # within ~a frame period, which is all InterruptBA needs
        )
        with self.lock:
            apply_pm_result(self.map, res, meta)

    def _assemble_local_ba(self, kf: int):
        local_kfs = [kf] + self.map.covisible_keyframes(kf)
        local_set = set(local_kfs)
        cand = np.unique(
            np.concatenate([self.map.kf_point[k] for k in local_kfs])
        )
        pts = [int(p) for p in cand[self.map.valid_mask(cand)]]
        fixed: List[int] = []
        fixed_set = set()
        for p in pts:
            for k in self.map.pt_obs[p]:
                if k not in local_set and k in self.map.kf_valid and k not in fixed_set:
                    fixed_set.add(k)
                    fixed.append(k)
        all_kfs = local_kfs + fixed
        kf_index = {k: i for i, k in enumerate(all_kfs)}
        pt_index = {p: i for i, p in enumerate(pts)}

        return assemble_pm_problem(
            self.map, self.frontend, all_kfs, pts, kf_index, pt_index,
            local_kfs, shapes=self.shapes,
        )

    # -------------------------------------------------------------------

    def _cull_keyframes(self, kf: int):
        """Reference LocalMapping::KeyFrameCulling (LocalMapping.cpp:609-670):
        a local keyframe is redundant if >=90% of its points are seen by >=3
        other keyframes at the same or finer scale.

        Still-QUEUED keyframes are never culled: in the reference a
        keyframe gains covisibility links only when the mapping thread
        processes it (ProcessNewKeyFrame), so KeyFrameCulling can never
        see an unprocessed keyframe — here the tracker links at creation
        time, and culling a queued keyframe would silently drop its
        triangulation pass (the map starves and tracking dies)."""
        m = self.map
        queued = set(self._queue)
        for k in m.covisible_keyframes(kf):
            if k == 0 or k not in m.kf_valid or k in queued:
                continue
            f = m.kf_frame[k]
            pids = m.kf_point[k]
            counted = m.valid_mask(pids)
            # stereo rule: only near points count (LocalMapping.cpp:628-631)
            if not self.config.monocular:
                counted &= (f.depth <= self.config.depth_threshold) & (
                    f.depth >= 0
                )
            n_pts = int(counted.sum())
            if n_pts == 0:
                continue
            # only points seen >3 times can be redundant. The octave walk
            # runs vectorized over the dense observation mirror (the
            # per-point python dict walk held the map lock ~10s of ms per
            # culling pass against the tracker)
            cand = counted.copy()
            cand[counted] = m.pt_nobs[pids[counted]] > 3
            cand_idx = np.nonzero(cand)[0]
            if cand_idx.size == 0:
                continue
            pids_c = pids[cand_idx]
            rows_kf = m.pt_obs_kf[pids_c]  # [M,D]
            rows_ix = m.pt_obs_idx[pids_c]
            ok_slot = (rows_kf != k) & m.kf_valid.mask_of(rows_kf)
            oct_obs = np.full(rows_kf.shape, 99, np.int32)
            for uk in np.unique(rows_kf[ok_slot]).tolist():
                sel = ok_slot & (rows_kf == uk)
                oct_obs[sel] = m.kf_frame[uk].octave[rows_ix[sel]]
            fine = ok_slot & (oct_obs <= (f.octave[cand_idx] + 1)[:, None])
            n_redundant = int((fine.sum(axis=1) >= 3).sum())
            if n_redundant > 0.9 * n_pts:
                m.remove_keyframe(k)
