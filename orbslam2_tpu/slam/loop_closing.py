"""Loop closing: detection, Sim3 computation, loop correction, global BA.

Re-implements the reference LoopClosing thread (src/LoopClosing.cpp) as a
host-sequenced stage over the TPU kernels:

  * DetectLoop (:90-216): database query gated by the worst covisible BoW
    score + 3-consecutive-keyframe group consistency;
  * ComputeSim3 (:218-385): BoW matching -> batched Horn Sim3 RANSAC ->
    guided Sim3 matching -> Sim3 LM -> loop-point projection check;
  * CorrectLoop (:387-605): Sim3 propagation through the covisible group,
    loop-point fusion, new-link discovery, essential-graph optimization
    (sharded GN over Sim3 edges) and global BA with staged write-back.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import sim3 as sim3_mod
from ..ops import ba, hamming, matchers, sim3solve
from .frontend import Frontend
from .map import SlamMap
from .relocalization import Relocalizer

COVIS_CONSISTENCY_TH = 3  # reference mnCovisibilityConsistencyTh (LoopClosing.cpp:24)
MIN_LOOP_GAP = 10  # don't look for loops right after the last one (:97-103)


def _np_sim3(S):
    """Fetch a Sim3 to host numpy (R f64, t f64, s float). Loop-closing
    keeps Sim3s host-side as numpy so none of the correction math runs as
    eager device dispatches (each is a tunnel round trip AND a one-off
    XLA compile per shape).

    r5 postmortem: `geometry.Sim3` is a NamedTuple, so the old
    `isinstance(S, tuple)` pass-through let DEVICE Sim3s through
    untouched — every downstream `@ / - / /` became an eager TPU op, and
    the r4/r5 loop corrections spent ~25 s compiling ~60 tiny programs
    INSIDE the map lock (the 26-33 s max-latency frames)."""
    if isinstance(S, sim3_mod.Sim3):
        S = jax.device_get(S)  # one batched fetch
        S = (S.R, S.t, S.s)
    R, t, s = S
    return (
        np.asarray(jax.device_get(R), np.float64),
        np.asarray(jax.device_get(t), np.float64),
        float(s),
    )


class LoopCloser:
    def __init__(
        self,
        config: SlamConfig,
        frontend: Frontend,
        slam_map: SlamMap,
        relocalizer: Relocalizer,
        local_mapper=None,
        fix_scale: bool = True,
        mesh=None,
    ):
        self.config = config
        self.shapes = config.shapes
        self.frontend = frontend
        self.map = slam_map
        self.lock = slam_map.lock  # map-update lock (mMutexMapUpdate)
        self.reloc = relocalizer  # owns vocabulary + database
        self.local_mapper = local_mapper
        self.fix_scale = fix_scale
        # optional jax.sharding.Mesh: runs the two whole-map passes (global
        # BA, essential graph) sharded over it — the reference's
        # long-context bottleneck (SURVEY §5), psum over ICI
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        self._dist_pg = None  # lazily-built distributed solvers
        self._dist_gba = None
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        self.last_loop_kf = -MIN_LOOP_GAP
        self.n_loops_closed = 0
        #: wall-clock (t_start, t_end) of each loop correction incl. GBA —
        #: lets tests/tools verify tracking overlapped the correction
        self.correction_windows: List[Tuple[float, float]] = []
        self.timers = None  # StageTimers, wired by System
        #: callback(T_old, T_new) — fired under the map lock after each
        #: write-back that moves the current region's poses, so the tracker
        #: can re-anchor its motion-model state (Tracker.apply_pose_jump)
        self.on_pose_jump = None
        # pre-split RANSAC key pool: jax.random.split is an EAGER device
        # op (a tunnel dispatch + compile per call site); one batched
        # split at init serves the whole run
        self._keys = list(jax.device_get(
            jax.random.split(jax.random.PRNGKey(7), 4096)
        ))
        self._key_i = 0

        self._jit_ransac = jax.jit(
            sim3solve.sim3_ransac, static_argnames=("fix_scale", "n_hyp")
        )
        self._jit_match_bow = jax.jit(matchers.search_by_bow)

        # ALL Sim3 candidates' BoW matching as ONE unlocked device program
        # (the per-candidate matching used to run inside the map lock and
        # was the bulk of the 'Sim3 detection' span on-chip — r4 profile:
        # 790 ms mean x 96 attempts, ~all rejected at the >=20 gate).
        # Candidate tuples stack INSIDE the jit; collision resolution
        # (best-distance-wins per kf2 feature) is vectorized on device.
        # Matching uses the reference's FeatureVector-node bucketing
        # (ORBmatcher.cpp:354-487): the ratio test runs within the
        # vocabulary-node bucket, not against the whole frame — at
        # revisits of repetitive scenes the dense global second-best is
        # near-tied and rejected nearly everything (r4/r5 LOOP_TRACE:
        # true-revisit candidates died at n_bow 11-15 vs the >=20 gate).
        def _bow_batch(desc1, has1, ang1, node1, descs2, has2s, angs2,
                       nodes2):
            d2 = jnp.stack(descs2)
            h2 = jnp.stack(has2s)
            a2 = jnp.stack(angs2)
            n2 = jnp.stack(nodes2)
            N1 = desc1.shape[0]
            rows1 = jnp.arange(N1, dtype=jnp.int32)

            def per_cand(dc, hc, ac, nc):
                idx, best, keep = matchers.search_by_bow_nodes(
                    desc1, has1, ang1, node1, dc, hc, ac, nc, 0.75
                )
                d_eff = jnp.where(keep, best, hamming.MAX_DIST)
                src2, _ = matchers._resolve_collisions(
                    idx, d_eff, dc.shape[0]
                )
                C = matchers._choice_matrix(idx, dc.shape[0])
                win = keep & jnp.any(
                    C & (src2[None, :] == rows1[:, None]), axis=1
                )
                return idx, win

            return jax.vmap(per_cand)(d2, h2, a2, n2)

        self._jit_bow_batch = jax.jit(_bow_batch)
        self._jit_opt_sim3 = jax.jit(
            sim3solve.optimize_sim3, static_argnames=("fix_scale", "n_iters")
        )
        self._jit_fuse_match = jax.jit(matchers.fuse_match, static_argnames=("th",))

        # ALL corrected keyframes' loop-point fuse searches as ONE vmapped
        # device program (SearchAndFuse, LoopClosing.cpp:528-556): the
        # per-member launch paid a ~25 ms tunnel round trip each, and the
        # ~17-member chain was most of the correction's device-queue
        # window the tracker's frames stalled behind (r5: worst fused
        # frame step=814 ms inside the correction)
        sf_ = frontend.scale_factors
        isig_ = frontend.inv_level_sigma2

        def _fuse_proj_batch(kuvs, kocts, kdescs, kvals, uvps, lvls, descs,
                             viss):
            def one(kuv, koct, kdesc, kval, uvp, lvl, dsc, vis):
                N = kuv.shape[0]
                P = uvp.shape[0]
                return matchers.fuse_match(
                    kuv, koct, jnp.full((N,), -1.0, jnp.float32),
                    kdesc, kval,
                    uvp, jnp.full((P,), -1.0, jnp.float32), lvl, dsc, vis,
                    sf_, isig_, th=4.0,
                )[0]

            return jax.vmap(one)(
                jnp.stack(kuvs), jnp.stack(kocts), jnp.stack(kdescs),
                jnp.stack(kvals), jnp.stack(uvps), jnp.stack(lvls),
                jnp.stack(descs), jnp.stack(viss),
            )

        self._jit_fuse_proj_batch = jax.jit(_fuse_proj_batch)

        # state produced by _detect/_compute for _correct
        self._candidates: List[int] = []
        self._matched_kf: Optional[int] = None
        self._Scw: Optional[sim3_mod.Sim3] = None  # corrected Sim3 world->cur
        self._loop_points: List[int] = []
        self._matched_points: Dict[int, int] = {}  # cur feature idx -> loop pid
        #: GBA-on-its-own-thread state (reference LoopClosing.cpp:566-570
        #: spawns RunGlobalBundleAdjustment detached; :397-409 aborts a
        #: still-running GBA when the NEXT loop closes). threaded_gba is
        #: enabled by System for the threaded pipeline; host-sequenced
        #: modes keep GBA inline so tests see a settled map on return.
        self.threaded_gba = False
        self._gba_thread: Optional[threading.Thread] = None
        self._gba_stop = False
        #: one record per Sim3 candidate attempt: which gate rejected and
        #: the counts at each stage (n_bow / ransac / opt / projection vs
        #: the reference's 20/20/40 gates, LoopClosing.cpp:218-385) — the
        #: bench writes these to LOOP_TRACE.json so an on-chip run that
        #: closes no loops is diagnosable from the artifact
        self.rejections: List[Dict] = []

    # ------------------------------------------------------------------

    def _span(self, name):
        return self.timers.span(name) if self.timers else contextlib.nullcontext()

    def insert_keyframe(self, kf: int) -> bool:
        """Process one keyframe; returns True if a loop was closed.
        Runs in the mapping worker thread when the pipeline is threaded;
        each phase manages the map lock (device solves run outside it)."""
        closed = False
        # the keyframe's BoW transform is a device round trip (~25 ms over
        # the tunnel): run it BEFORE taking the map lock — frame features
        # are immutable snapshots, and detect_loop_candidates excludes the
        # query keyframe explicitly, so early registration is safe (the
        # reference adds at the end of DetectLoop, KeyFrameDatabase::add)
        if (
            kf in self.map.kf_frame
            and kf not in self.reloc.database.kf_words
        ):
            self.reloc.add_keyframe(kf, lock=self.lock)
        if (
            self.map.n_keyframes() > MIN_LOOP_GAP
            and kf >= self.last_loop_kf + MIN_LOOP_GAP
        ):
            with self.lock, self._span("Loop detection"):
                detected = self._detect_loop(kf)
            if detected:
                # reference sim3_detection_time spans the whole ComputeSim3
                # (LoopClosing.cpp:55-59); sim3_computation_time spans the
                # solver iterations inside it (:285-288). _compute_sim3
                # takes the map lock around its host assembly sections only
                # — the Sim3 RANSAC/LM device solves run unlocked so the
                # tracker's frame latency is never charged for them
                with self._span("Sim3 detection"):
                    matched = self._compute_sim3(kf)
                if matched:
                    self._correct_loop(kf)
                    closed = True
        # the reference adds the KF to the database at the end of DetectLoop
        with self.lock:
            if kf not in self.reloc.database.kf_words:
                self.reloc.add_keyframe(kf)
        return closed

    # ------------------------------------------------------------------

    def _detect_loop(self, kf: int) -> bool:
        if kf not in self.map.kf_valid:  # culled while queued
            return False
        db = self.reloc.database
        if kf not in db.kf_words:
            self.reloc.add_keyframe(kf)
        bow = db.kf_bow[kf]
        min_score = 1.0
        for nb in self.map.covisible_keyframes(kf):
            if nb in db.kf_bow:
                s = db._l1_score(bow, db.kf_bow[nb])
                min_score = min(min_score, s)
        candidates = db.detect_loop_candidates(kf, min_score, self.map)
        if not candidates:
            self.consistent_groups = []
            return False

        # 3-consecutive-keyframe group consistency (LoopClosing.cpp:139-198)
        enough: List[int] = []
        new_groups: List[Tuple[Set[int], int]] = []
        for cand in candidates:
            group = set(self.map.covisible_keyframes(cand))
            group.add(cand)
            consistent_for_some = False
            for prev_group, prev_count in self.consistent_groups:
                if group & prev_group:
                    consistent_for_some = True
                    count = prev_count + 1
                    new_groups.append((group, count))
                    if count >= COVIS_CONSISTENCY_TH and cand not in enough:
                        enough.append(cand)
                    break
            if not consistent_for_some:
                new_groups.append((group, 0))
        self.consistent_groups = new_groups
        self._candidates = enough
        return bool(enough)

    # ------------------------------------------------------------------

    def _compute_sim3(self, kf: int) -> bool:
        """ComputeSim3 over all consistent candidates (reference
        LoopClosing.cpp:218-385). Phase 1 snapshots every candidate's
        features under the map lock and runs ONE batched BoW-match device
        program unlocked; phase 2 walks candidates through the Sim3
        RANSAC / guided-search / LM / projection gates."""
        db = self.reloc.database
        with self.lock:
            if kf not in self.map.kf_valid:
                return False
            f1 = self.map.kf_frame[kf]
            p1 = self.map.kf_point[kf].copy()
            has1 = (p1 >= 0) & f1.valid
            node1 = db.kf_nodes.get(kf)
            if node1 is None:  # pragma: no cover - detect adds kf first
                node1 = self.reloc.compute_bow_nodes(f1.desc, f1.valid)[1]
            snap = []
            for cand in self._candidates:
                if cand not in self.map.kf_valid:
                    continue
                f2 = self.map.kf_frame[cand]
                p2 = self.map.kf_point[cand].copy()
                node2 = db.kf_nodes.get(cand)
                if node2 is None:  # pragma: no cover
                    node2 = self.reloc.compute_bow_nodes(f2.desc, f2.valid)[1]
                snap.append((
                    cand, f2.dev.desc, (p2 >= 0) & f2.valid,
                    f2.dev.angle, p2, node2.astype(np.int32),
                ))
        if not snap:
            return False
        # pad the candidate axis to a fixed bucket (repeat row 0 with an
        # all-false mask) so the batched program compiles once
        C = self.shapes.bucket_select(len(snap), 2, 8)
        snap = snap[:C]
        pad = C - len(snap)
        descs = tuple(s[1] for s in snap) + (snap[0][1],) * pad
        has2s = tuple(s[2] for s in snap) + (
            (np.zeros_like(snap[0][2]),) * pad
        )
        angs = tuple(s[3] for s in snap) + (snap[0][3],) * pad
        nodes2 = tuple(s[5] for s in snap) + (snap[0][5],) * pad
        idxs, wins = jax.device_get(
            self._jit_bow_batch(
                f1.dev.desc, has1, f1.dev.angle,
                node1.astype(np.int32), descs, has2s, angs, nodes2,
            )
        )
        for c, (cand, _, _, _, p2, _) in enumerate(snap):
            matches = {}
            for i in np.nonzero(wins[c])[0]:
                pid = int(p2[idxs[c][i]])
                if pid in self.map.pt_valid:
                    matches[int(i)] = pid
            if self._try_sim3_candidate(kf, cand, matches):
                return True
        return False

    def _try_sim3_candidate(self, kf: int, cand: int, matches) -> bool:
        """One candidate of the reference's ComputeSim3 loop (LoopClosing.
        cpp:218-385). Host map reads hold the map lock; the Sim3 RANSAC
        and LM refinement device solves run unlocked (the tracker keeps
        framing). Correspondence arrays are padded to the shape policy's
        sim3 bucket so the jitted solvers see ONE shape."""
        cam = self.config.camera
        sigma2 = self.frontend.level_sigma2
        sh = self.shapes

        def reject(stage, **counts):
            self.rejections.append(
                dict(kf=kf, cand=cand, stage=stage, **counts)
            )
            return False

        if len(matches) < 20:
            return reject("bow_matches", n_bow=len(matches))
        with self.lock:
            if cand not in self.map.kf_valid or kf not in self.map.kf_valid:
                return reject("kf_culled")
            f1 = self.map.kf_frame[kf]
            T1 = self.map.kf_pose[kf].astype(np.float64)
            p1 = self.map.kf_point[kf]
            idxs = sorted(matches)
            N = sh.bucket(len(idxs), 256, sh.sim3_cap)
            X1 = np.zeros((N, 3), np.float32)
            X2 = np.zeros((N, 3), np.float32)
            uv1 = np.zeros((N, 2), np.float32)
            uv2 = np.zeros((N, 2), np.float32)
            me1 = np.zeros(N, np.float32)
            me2 = np.zeros(N, np.float32)
            T2 = self.map.kf_pose[cand].astype(np.float64)
            f2 = self.map.kf_frame[cand]
            ok_rows = []
            for r, i in enumerate(idxs):
                pid1 = int(p1[i])
                pid2 = matches[i]
                # matches were built from an unlocked snapshot: re-validate
                # both point ids under the lock
                if pid1 not in self.map.pt_valid or pid2 not in self.map.pt_valid:
                    continue
                w1 = self.map.pt_pos[pid1]
                w2 = self.map.pt_pos[pid2]
                X1[r] = T1[:3, :3] @ w1 + T1[:3, 3]
                X2[r] = T2[:3, :3] @ w2 + T2[:3, 3]
                uv1[r] = f1.uv[i]
                i2 = self.map.pt_obs[pid2].get(cand)
                if i2 is None:
                    continue
                uv2[r] = f2.uv[i2]
                me1[r] = 9.21 * sigma2[f1.octave[i]]
                me2[r] = 9.21 * sigma2[f2.octave[i2]]
                ok_rows.append(r)
            valid = np.zeros(N, bool)
            valid[ok_rows] = True
            if valid.sum() < 20:
                return reject("valid_pairs", n_bow=len(matches),
                              n_valid=int(valid.sum()))

        sub = self._keys[self._key_i % len(self._keys)]
        self._key_i += 1
        with self._span("Sim3 computation"):
            res = self._jit_ransac(
                sub, jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1),
                jnp.asarray(uv2), jnp.asarray(me1), jnp.asarray(me2),
                jnp.asarray(valid), self.frontend.camera,
                fix_scale=self.fix_scale,
            )
            n_inl_ransac = int(res.n_inliers)
        if n_inl_ransac < 20:
            return reject("ransac", n_bow=len(matches),
                          n_ransac=n_inl_ransac)

        # guided Sim3 matching (reference SearchBySim3, ORBmatcher.cpp:
        # 948-1171): project each keyframe's points into the other under
        # the RANSAC Sim3, keep mutually-agreeing new pairs, and extend
        # the correspondence set before the refinement. The projection
        # searches manage the lock internally (device solves unlocked).
        with self._span("Sim3 guided search"):
            extra = self._search_by_sim3(kf, cand, res.S12)
        add_rows = []
        with self.lock:
            if cand not in self.map.kf_valid or kf not in self.map.kf_valid:
                return reject("kf_culled")
            for i1, pid2 in extra.items():
                if i1 in matches or pid2 not in self.map.pt_valid:
                    continue
                pid1 = int(p1[i1])
                if pid1 < 0 or pid1 not in self.map.pt_valid:
                    continue
                i2 = self.map.pt_obs[pid2].get(cand)
                if i2 is None:
                    continue
                w1 = self.map.pt_pos[pid1]
                w2 = self.map.pt_pos[pid2]
                add_rows.append((
                    T1[:3, :3] @ w1 + T1[:3, 3], T2[:3, :3] @ w2 + T2[:3, 3],
                    f1.uv[i1], f2.uv[i2],
                    9.21 * sigma2[f1.octave[i1]], 9.21 * sigma2[f2.octave[i2]],
                ))
        # re-pack base + extension rows into ONE bucket-padded set (the
        # refinement then compiles for a single shape)
        base_rows = np.nonzero(valid)[0]
        n_total = len(base_rows) + len(add_rows)
        B = sh.bucket(n_total, 256, sh.sim3_cap)

        def repack(base_a, add_vals, width):
            out = np.zeros((B, width) if width > 1 else (B,), np.float32)
            nb = len(base_rows)
            out[:nb] = base_a[base_rows]
            if add_vals:
                out[nb : nb + len(add_vals)] = np.asarray(add_vals, np.float32)
            return out

        inl_base = np.asarray(res.inliers)
        X1 = repack(X1, [r[0] for r in add_rows], 3)
        X2 = repack(X2, [r[1] for r in add_rows], 3)
        uv1 = repack(uv1, [r[2] for r in add_rows], 2)
        uv2 = repack(uv2, [r[3] for r in add_rows], 2)
        me1 = repack(me1, [r[4] for r in add_rows], 1)
        me2 = repack(me2, [r[5] for r in add_rows], 1)
        valid = np.zeros(B, bool)
        valid[:n_total] = True
        inl_pad = np.zeros(B, bool)
        inl_pad[: len(base_rows)] = inl_base[base_rows]
        inl_pad[len(base_rows) : n_total] = True

        # both edge directions carry their own information weight
        # (reference OptimizeSim3 sets invSigmaSquare per direction,
        # Optimizer.cpp:1100-1150): w = 9.21/(9.21*sigma2) = 1/sigma2
        refine_span = self._span("Sim3 refine")
        refine_span.__enter__()
        S12, inl, n_inl = self._jit_opt_sim3(
            res.S12, jnp.asarray(X1), jnp.asarray(X2),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(
                (9.21 / np.where(me1 > 0, me1, 9.21)).astype(np.float32)
            ),
            jnp.asarray(
                (9.21 / np.where(me2 > 0, me2, 9.21)).astype(np.float32)
            ),
            jnp.asarray(valid & inl_pad),
            self.frontend.camera,
            fix_scale=self.fix_scale,
        )
        n_inl = int(n_inl)
        refine_span.__exit__(None, None, None)
        if n_inl < 20:
            return reject("sim3_opt", n_bow=len(matches),
                          n_ransac=n_inl_ransac, n_opt=n_inl)

        # Scw = S1,2 ∘ S2,w  (corrected world->current) — composed on the
        # host in numpy (eager 3x3 device ops are tunnel round trips)
        R12n, t12n, s12n = _np_sim3(S12)
        Scw = (
            R12n.astype(np.float64) @ T2[:3, :3],
            s12n * (R12n.astype(np.float64) @ T2[:3, 3]) + t12n,
            float(s12n),
        )

        # gather loop-region points and verify by projection (>=40)
        with self.lock:
            if cand not in self.map.kf_valid or kf not in self.map.kf_valid:
                return reject("kf_culled")
            group = [
                k
                for k in [cand] + self.map.covisible_keyframes(cand)
                if k in self.map.kf_valid
            ]
            ids = np.unique(
                np.concatenate([self.map.kf_point[k] for k in group])
            )
            loop_pts = [int(p) for p in ids[self.map.valid_mask(ids)]]
        with self._span("Sim3 verify"):
            matched = self._search_by_sim3_projection(kf, Scw, loop_pts, th=10.0)
        total = len(matched)
        for i, pid in matches.items():
            if i not in matched:
                total += 1
        if total >= 40:
            self._matched_kf = cand
            self._Scw = Scw
            self._loop_points = loop_pts
            self._matched_points = dict(matched)
            for i, pid in matches.items():
                self._matched_points.setdefault(i, pid)
            return True
        return reject("projection_total", n_bow=len(matches),
                      n_ransac=n_inl_ransac, n_opt=int(n_inl),
                      n_total=total)

    def _search_by_sim3(self, kf1: int, kf2: int, S12) -> Dict[int, int]:
        """Mutual Sim3 projection matching between two keyframes' map
        points (reference ORBmatcher::SearchBySim3): kf2's points project
        into kf1 under S12 and vice versa; keep pairs both directions
        agree on. Returns kf1 feature idx -> kf2 point id."""
        m = self.map
        with self._span("Sim3 guided lock"), self.lock:
            if kf1 not in m.kf_valid or kf2 not in m.kf_valid:
                return {}
            T1 = m.kf_pose[kf1].astype(np.float64)
            T2 = m.kf_pose[kf2].astype(np.float64)
            kp2 = m.kf_point[kf2]
            kp1 = m.kf_point[kf1]
            pids2 = kp2[m.valid_mask(kp2)]
            pids1 = kp1[m.valid_mask(kp1)]
        R12, t12, s12 = _np_sim3(S12)
        # S1w = S12 ∘ S2w ; S2w' = S12^-1 ∘ S1w
        S1w = (R12 @ T2[:3, :3], s12 * (R12 @ T2[:3, 3]) + t12, s12)
        R21 = R12.T
        s21 = 1.0 / s12
        S2w = (R21 @ T1[:3, :3], s21 * (R21 @ (T1[:3, 3] - t12)), s21)

        def project_points(kf_target, Sxw, pids):
            return self._search_by_sim3_projection(kf_target, Sxw, pids, th=7.5)

        if pids1.size == 0 or pids2.size == 0:
            return {}
        with self._span("Sim3 guided proj12"):
            m12 = project_points(kf1, S1w, pids2)  # kf1 feat -> kf2 pid
        with self._span("Sim3 guided proj21"):
            m21 = project_points(kf2, S2w, pids1)  # kf2 feat -> kf1 pid
        # mutual agreement: kf1 feat i (point pid1) matched to pid2 whose
        # kf2 feature matched back to pid1
        out = {}
        with self._span("Sim3 guided mutual"), self.lock:
            if kf1 not in m.kf_valid or kf2 not in m.kf_valid:
                return {}
            kf1_pts = m.kf_point[kf1]
            for i1, pid2 in m12.items():
                pid1 = int(kf1_pts[i1]) if i1 < len(kf1_pts) else -1
                if pid1 < 0:
                    continue
                i2 = m.pt_obs.get(pid2, {}).get(kf2)
                if i2 is None:
                    continue
                if m21.get(int(i2)) == pid1:
                    out[int(i1)] = int(pid2)
        return out

    def _project_sim3_host(self, R, t, s, pos, normal, dmin, dmax):
        """Frustum/scale gates for points projected under a Sim3 (host
        numpy half of SearchByProjection-with-Scw, ORBmatcher.cpp:241-352).
        Returns (uv [P,2] f64, level [P] i32, visible [P] bool)."""
        c = self.config.camera
        R = np.asarray(R, np.float64)
        t = np.asarray(t, np.float64)
        s = float(s)
        pc = (pos.astype(np.float64) @ R.T) * s + t
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        u = c.fx * pc[:, 0] / zs + c.cx
        v = c.fy * pc[:, 1] / zs + c.cy
        Ow = -(R.T @ t) / s
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
        return np.stack([u, v], -1), level, visible

    def _search_by_sim3_projection(
        self, kf: int, Scw, pids: List[int], th: float
    ) -> Dict[int, int]:
        """Reference SearchByProjection(KF, Scw, points, ...) — project loop
        points into the keyframe under the Sim3 and match (ORBmatcher.cpp:
        241-352). Returns feature idx -> pid. Host assembly holds the map
        lock; the device match runs after releasing it (no-op when the
        caller already holds the re-entrant lock, e.g. loop correction)."""
        from . import shapes as shapes_mod

        pids = np.asarray(pids, np.int64)
        if pids.size == 0:
            return {}
        c = self.config.camera
        R, t, s = _np_sim3(Scw)
        # force host numpy: a device-array R/t here turns every slice and
        # product below into an EAGER dispatch (a tunnel round trip each —
        # the r4 eager-dispatch audit caught exactly these lines)
        R = np.asarray(jax.device_get(R), np.float64)
        t = np.asarray(jax.device_get(t), np.float64)
        s = float(s)
        with self.lock:
            if kf not in self.map.kf_valid:
                return {}
            f = self.map.kf_frame[kf]
            pids = pids[self.map.valid_mask(pids)]
            if pids.size == 0:
                return {}
            pos, desc, normal, dmin, dmax = self.map.points_array(pids)
        pc = (pos.astype(np.float64) @ np.asarray(R).T) * s + np.asarray(t)
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        u = c.fx * pc[:, 0] / zs + c.cx
        v = c.fy * pc[:, 1] / zs + c.cy
        Ow = -(np.asarray(R).T @ np.asarray(t)) / s
        po = pos.astype(np.float64) - Ow
        dist = np.linalg.norm(po, axis=1)
        viewcos = np.einsum("ij,ij->i", po, normal) / np.maximum(dist, 1e-9)
        visible = (
            (z > 0)
            & (u >= 0) & (u < c.width) & (v >= 0) & (v < c.height)
            & (dist >= dmin) & (dist <= dmax)
            & (viewcos > 0.5)
        )
        if not visible.any():
            return {}
        ratio = dmax / np.maximum(dist, 1e-9)
        level = np.clip(
            np.ceil(np.log(np.maximum(ratio, 1e-9)) / self.map.log_scale),
            0, self.map.n_levels - 1,
        ).astype(np.int32)

        # only frustum-visible rows go to the device (bounds the bucket)
        sel = np.nonzero(visible)[0]
        cap = self.shapes.bucket_select(len(sel), 256, self.shapes.fuse_pt_cap)
        if len(sel) > cap:
            sel = sel[:cap]
        pids, u, v, level = pids[sel], u[sel], v[sel], level[sel]
        desc, visible = desc[sel], visible[sel]
        P = self.shapes.bucket(len(pids), 256, self.shapes.fuse_pt_cap)

        def padto(a, fill=0):
            return shapes_mod.pad_rows(a, P, fill)

        with self._span("Sim3 projection search"):
            best_idx, best_dist = self._jit_fuse_match(
                f.dev.uv, f.dev.octave,
                np.full(len(f.valid), -1.0, np.float32),  # no stereo gate
                f.dev.desc, f.dev.valid,
                padto(np.stack([u, v], -1).astype(np.float32)),
                np.full(P, -1.0, np.float32),
                padto(level),
                padto(desc),
                padto(visible),
                self.frontend.scale_factors, self.frontend.inv_level_sigma2,
                th=th,
            )
            best_idx = np.asarray(best_idx)
        out: Dict[int, int] = {}
        for j in range(len(pids)):
            fi = int(best_idx[j])
            if fi >= 0 and fi not in out:
                out[fi] = int(pids[j])
        return out

    # ------------------------------------------------------------------

    def _correct_loop(self, kf: int):
        """Reference LoopClosing::CorrectLoop (LoopClosing.cpp:387-605).
        The Sim3 propagation and the write-backs run under the map lock;
        the loop-point fusion matching, the pose-graph solve and the
        global BA run outside it (the reference likewise runs SearchAndFuse
        after its MapUpdate lock scope closes, and spawns GBA on a
        detached thread, LoopClosing.cpp:566-570)."""
        import time

        t0 = time.monotonic()
        m = self.map
        # a GBA from a previous loop may still be running: abort + join
        # (reference LoopClosing.cpp:397-409 mbStopGBA protocol)
        self._abort_gba_and_join()
        if self.local_mapper is not None:
            # reference RequestStop + isStopped spin-wait (LoopClosing.cpp:
            # 394-415): no mapping stage may be mid-flight while the
            # correction rewrites poses/points
            self.local_mapper.request_stop()
            self.local_mapper.wait_stopped()
        try:
            with self._span("Loop propagate"), self.lock:
                pg_args, fuse_args = self._correct_loop_locked(kf)
            # loop-point fusion: device matching unlocked, merges locked
            # per target (mapping is parked; only the tracker interleaves)
            with self._span("Loop fusion"):
                loop_connections = self._search_and_fuse(kf, *fuse_args)
            with self._span("Essential graph"):
                self._optimize_essential_graph(
                    kf, *pg_args, loop_connections
                )
        finally:
            # release unconditionally: a timeout/error escaping mid-
            # correction must not leave the mapper parked forever
            if self.local_mapper is not None:
                self.local_mapper.release()
        self.last_loop_kf = kf
        with self.lock:
            m.big_change_idx += 1  # MapChanged() (reference Map.cpp:42-52)
        self.correction_windows.append((t0, time.monotonic()))
        # incremented LAST: observers polling n_loops_closed (tests, bench)
        # must see the completed correction window when it flips
        self.n_loops_closed += 1
        self._start_gba(kf)

    def _start_gba(self, kf: int):
        """Full-map BA: on its own thread in the threaded pipeline so loop
        detection for subsequent keyframes continues during the solve
        (reference LoopClosing.cpp:566-570); inline otherwise."""
        if self.threaded_gba:
            self._gba_stop = False
            self._gba_thread = threading.Thread(
                target=self._run_gba, args=(kf,), name="gba-thread",
                daemon=True,
            )
            self._gba_thread.start()
        else:
            self._run_gba(kf)

    def _abort_gba_and_join(self, timeout: float = 300.0):
        t = self._gba_thread
        if t is not None and t.is_alive():
            self._gba_stop = True
            t.join(timeout)
        self._gba_thread = None

    def gba_running(self) -> bool:
        t = self._gba_thread
        return t is not None and t.is_alive()

    def wait_gba(self, timeout: float = 600.0):
        """Block until a background GBA (if any) finished and applied."""
        t = self._gba_thread
        if t is not None and t.is_alive():
            t.join(timeout)

    def _run_gba(self, kf: int):
        with self._span("Global BA"):
            self._global_ba(kf)

    def _correct_loop_locked(self, kf: int):
        m = self.map
        T_cur_old = m.kf_pose[kf].astype(np.float64).copy()
        current_group = [kf] + m.covisible_keyframes(kf)
        R, t, s = _np_sim3(self._Scw)

        corrected: Dict[int, Tuple[np.ndarray, np.ndarray, float]] = {}
        non_corrected: Dict[int, np.ndarray] = {}
        Tkw = m.kf_pose[kf].astype(np.float64)
        for ki in current_group:
            Tiw = m.kf_pose[ki].astype(np.float64)
            non_corrected[ki] = Tiw.copy()
            if ki == kf:
                corrected[ki] = (R, t, s)
            else:
                Tic = Tiw @ np.linalg.inv(Tkw)
                Ric, tic = Tic[:3, :3], Tic[:3, 3]
                # Siw_corr = Sic ∘ Scw  (s_ic = 1)
                corrected[ki] = (Ric @ R, Ric @ t + tic, s)

        # correct map points of the group and keyframe poses (vectorized
        # per group member; each point corrected once via its first member)
        done_mask = np.zeros(m._pt_capacity(), bool)
        for ki in current_group:
            Rc, tc, sc = corrected[ki]
            Tiw_old = non_corrected[ki]
            kp = m.kf_point[ki]
            ids = np.unique(kp[m.valid_mask(kp)])
            ids = ids[~done_mask[ids]]
            done_mask[ids] = True
            if ids.size:
                pw = m.pt_pos[ids]
                pc = pw @ Tiw_old[:3, :3].T + Tiw_old[:3, 3]  # old cam coords
                # corrected world: Siw_corr^-1 (pc), row-wise Rc^T apply
                m.pt_pos[ids] = ((pc - tc) / sc) @ Rc
            # pose = [R | t/s]
            T_new = np.eye(4, dtype=np.float32)
            T_new[:3, :3] = Rc
            T_new[:3, 3] = (tc / sc).astype(np.float32)
            m.kf_pose[ki] = T_new
            # NOTE: no update_connections here — the reference refreshes
            # covisibility ONCE per member in the loop-connections phase
            # after fusion (LoopClosing.cpp:537-552), which
            # _search_and_fuse does; doing it during the locked
            # propagation doubled the tracker-blocking freeze (r5 bench:
            # max frame 1.14 s rode exactly this window)

        # attach matched loop points at the current keyframe (descriptor
        # refreshes deferred to one batched pass in _search_and_fuse)
        touched = []
        cur_pids = m.kf_point[kf]
        for fi, loop_pid in self._matched_points.items():
            loop_pid = m.resolve_replaced(loop_pid)
            if loop_pid not in m.pt_valid:
                continue
            cur_pid = int(cur_pids[fi])
            if cur_pid >= 0 and cur_pid in m.pt_valid and cur_pid != loop_pid:
                m.replace_point(cur_pid, loop_pid, refresh_desc=False)
                touched.append(loop_pid)
            elif cur_pid < 0:
                m.add_observation(loop_pid, kf, fi)
                touched.append(loop_pid)

        old_neighbors = {ki: set(m.covisible_keyframes(ki)) for ki in current_group}
        loop_pt_arr = np.asarray(self._loop_points, np.int64)
        loop_pt_list = loop_pt_arr[m.valid_mask(loop_pt_arr)]

        # loop edge bookkeeping
        m.loop_edges[kf].add(self._matched_kf)
        m.loop_edges[self._matched_kf].add(kf)
        m.version += 1  # invalidate device-resident candidate caches
        if self.on_pose_jump is not None:
            self.on_pose_jump(T_cur_old, m.kf_pose[kf])
        return (
            (corrected, non_corrected),
            (current_group, corrected, old_neighbors, loop_pt_list, touched),
        )

    def _search_and_fuse(
        self, kf, current_group, corrected, old_neighbors, loop_pt_list,
        touched,
    ) -> Dict[int, Set[int]]:
        """Fuse loop points into every corrected keyframe (reference
        SearchAndFuse, LoopClosing.cpp:528-556 — which the reference runs
        AFTER its MapUpdate lock scope closes). Device matching runs
        unlocked; each target's merge protocol holds the lock briefly, so
        the tracker's frame latency is never charged a whole fusion pass
        (VERDICT r4 task 3: the 33 s frame sat behind exactly this)."""
        from . import shapes as shapes_mod

        m = self.map
        sh = self.shapes
        # snapshot the shared loop-point tables ONCE (every member fuses
        # the same candidate-side point set)
        with self.lock:
            pids_all = loop_pt_list[m.valid_mask(loop_pt_list)]
            members = [ki for ki in current_group if ki in m.kf_valid]
            if pids_all.size and members:
                pos, desc, normal, dmin, dmax = m.points_array(pids_all)
                frames = {ki: m.kf_frame[ki] for ki in members}
            else:
                members = []
        # per-member Sim3 frustum projection (host numpy, unlocked), then
        # ALL members' fuse searches in vmapped chunks of the target cap
        matched_by_ki: Dict[int, tuple] = {}
        with self._span("Loop fusion search"):
            rows = []
            P = sh.bucket(256, 256, sh.fuse_pt_cap)
            for ki in members:
                Rc, tc, sc = corrected[ki]
                uv, level, visible = self._project_sim3_host(
                    Rc, tc, sc, pos, normal, dmin, dmax
                )
                if not visible.any():
                    continue
                sel = np.nonzero(visible)[0]
                cap = sh.bucket_select(len(sel), 256, sh.fuse_pt_cap)
                sel = sel[:cap]
                rows.append((ki, pids_all[sel], uv[sel], level[sel],
                             desc[sel]))
            Kt = sh.bucket_select(1, 1, sh.fuse_targets_cap)
            for c0 in range(0, len(rows), Kt):
                chunk = rows[c0 : c0 + Kt]
                kuvs, kocts, kdescs, kvals = [], [], [], []
                uvps, lvls, descs, viss = [], [], [], []
                for i in range(Kt):
                    ki, spids, uv, level, dsc = chunk[min(i, len(chunk) - 1)]
                    f = frames[ki]
                    kuvs.append(f.dev.uv)
                    kocts.append(f.dev.octave)
                    kdescs.append(f.dev.desc)
                    kvals.append(f.dev.valid)
                    uvps.append(shapes_mod.pad_rows(
                        uv.astype(np.float32), P))
                    lvls.append(shapes_mod.pad_rows(level, P))
                    descs.append(shapes_mod.pad_rows(dsc, P))
                    vis = np.zeros(P, bool)
                    if i < len(chunk):
                        vis[: len(spids)] = True
                    viss.append(vis)
                best = np.asarray(self._jit_fuse_proj_batch(
                    tuple(kuvs), tuple(kocts), tuple(kdescs), tuple(kvals),
                    tuple(uvps), tuple(lvls), tuple(descs), tuple(viss),
                ))
                for i, (ki, spids, _, _, _) in enumerate(chunk):
                    matched_by_ki[ki] = (spids, best[i, : len(spids)])
        for ki in members:
            spids, best = matched_by_ki.get(ki, (None, None))
            with self.lock, self._span("Loop fusion merge"):
                if ki not in m.kf_valid:
                    continue
                if spids is not None:
                    kf_pids = m.kf_point[ki]
                    for j in np.nonzero(best >= 0)[0]:
                        fi = int(best[j])
                        pid = m.resolve_replaced(int(spids[j]))
                        if pid not in m.pt_valid or ki in m.pt_obs[pid]:
                            continue
                        existing = int(kf_pids[fi])
                        if existing >= 0 and existing in m.pt_valid and existing != pid:
                            m.replace_point(existing, pid, refresh_desc=False)
                            touched.append(pid)
                        else:
                            m.add_observation(pid, ki, fi)
                            touched.append(pid)
                # covisibility refresh for EVERY member (the new-link
                # detection below diffs old vs refreshed neighbor sets —
                # reference LoopClosing.cpp:537-552)
                with self._span("Loop fusion connections"):
                    m.update_connections(ki)

        # new links created by the fusion
        loop_connections: Dict[int, Set[int]] = {}
        with self.lock:
            for ki in current_group:
                if ki not in m.kf_valid:
                    continue
                now = set(m.covisible_keyframes(ki))
                fresh = now - old_neighbors[ki] - set(current_group)
                if fresh:
                    loop_connections[ki] = fresh

        # batched distinctive-descriptor refresh for every point the
        # fusion touched (the per-merge refresh made corrections minutes
        # long on-chip — r3 postmortem), CHUNKED so the lock is released
        # between chunks and tracker frames interleave
        with self._span("Loop fusion refresh"):
            tl = sorted(set(touched))
            for i in range(0, len(tl), 256):
                with self.lock:
                    m.compute_distinctive_descriptors_batch(tl[i : i + 256])
        with self.lock:
            m.version += 1
        return loop_connections

    # ------------------------------------------------------------------

    def _optimize_essential_graph(
        self, cur_kf, corrected, non_corrected, loop_connections
    ):
        """Assemble the essential graph (reference Optimizer.cpp:790-1052)
        and solve with the batched Sim3 GN. Assembly and write-back hold
        the map lock; the device solve runs without it."""
        from ..ops import posegraph

        m = self.map

        def assemble():
            kfs = sorted(m.kf_valid)
            index = {k: i for i, k in enumerate(kfs)}
            K = len(kfs)

            Rv = np.zeros((K, 3, 3), np.float32)
            tv = np.zeros((K, 3), np.float32)
            sv = np.ones(K, np.float32)
            # pre-correction poses per vertex (measurement source)
            T_old = np.zeros((K, 4, 4), np.float64)
            for k, i in index.items():
                if k in corrected:
                    Rc, tc, sc = corrected[k]
                    Rv[i], tv[i], sv[i] = Rc, tc, sc
                else:
                    T = m.kf_pose[k]
                    Rv[i], tv[i] = T[:3, :3], T[:3, 3]
                T_old[i] = (
                    non_corrected[k]
                    if k in non_corrected
                    else m.kf_pose[k].astype(np.float64)
                )

            # collect edge index pairs first; the Sji measurements are
            # computed in ONE batched einsum pass below (the per-edge
            # python 3x3 math was ~100-200 ms of the locked assembly at
            # ~2.5k edges)
            pairs_old: List[Tuple[int, int]] = []
            pairs_new: List[Tuple[int, int]] = []
            added = set()

            def add_edge(ka, kb, new=False):
                if ka not in index or kb not in index:
                    return
                pair = (min(ka, kb), max(ka, kb))
                if pair in added:
                    return
                added.add(pair)
                (pairs_new if new else pairs_old).append(
                    (index[ka], index[kb])
                )

            # loop connections (use corrected/current poses — these are the
            # new constraints discovered by fusion; reference uses current
            # estimates)
            for ka, fresh in loop_connections.items():
                for kb in fresh:
                    add_edge(ka, kb, new=True)
            for k in kfs:
                par = m.parent.get(k)
                if par is not None and par in index:
                    add_edge(k, par)
                for le in m.loop_edges.get(k, ()):
                    if le < k:
                        add_edge(k, le)
                for nb, w in m.covis.get(k, {}).items():
                    if w >= 100 and nb < k and nb not in m.children.get(k, set()):
                        add_edge(k, nb)
            # the fresh loop edge between current and matched KF
            add_edge(cur_kf, self._matched_kf)

            def batch_meas(pairs, R_src, t_src):
                if not pairs:
                    return [], np.zeros((0, 3, 3)), np.zeros((0, 3))
                ia = np.asarray([p[0] for p in pairs])
                ib = np.asarray([p[1] for p in pairs])
                Ri, ti = R_src[ia], t_src[ia]
                Rj, tj = R_src[ib], t_src[ib]
                # Sji = Sj ∘ Si^-1 (scale 1): Rji = Rj Ri^T,
                # tji = tj - Rji ti
                Rji = np.einsum("ebc,edc->ebd", Rj, Ri)
                tji = tj - np.einsum("ebc,ec->eb", Rji, ti)
                return list(zip(ia, ib)), Rji, tji

            po, Rji_o, tji_o = batch_meas(
                pairs_old, T_old[:, :3, :3], T_old[:, :3, 3]
            )
            pn, Rji_n, tji_n = batch_meas(
                pairs_new, Rv.astype(np.float64), tv.astype(np.float64)
            )
            edges = [
                (int(a), int(b), Rji_o[e], tji_o[e], 1.0)
                for e, (a, b) in enumerate(po)
            ] + [
                (int(a), int(b), Rji_n[e], tji_n[e], 1.0)
                for e, (a, b) in enumerate(pn)
            ]

            # snapshot of pre-optimization poses for the point correction
            old_poses = {k: T_old[i] for k, i in index.items()}
            return kfs, index, Rv, tv, sv, edges, old_poses

        with self.lock:
            kfs, index, Rv, tv, sv, edges, old_poses = assemble()
        K = len(kfs)
        if not edges:
            return
        E = len(edges)
        # pad vertices/edges to the shape-policy buckets (padding vertices
        # are fixed identities; padding edges carry edge_valid=False) so
        # the jitted solver sees few distinct shapes across loop events
        sh = self.shapes
        Kp = sh.bucket(K, 16, sh.pg_k_cap)
        Ep = sh.bucket(E, 64, sh.pg_e_cap)
        Rvp = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
        tvp = np.zeros((Kp, 3), np.float32)
        svp = np.ones(Kp, np.float32)
        Rvp[:K], tvp[:K], svp[:K] = Rv, tv, sv
        ei = np.zeros(Ep, np.int32)
        ej = np.zeros(Ep, np.int32)
        mR = np.tile(np.eye(3, dtype=np.float32), (Ep, 1, 1))
        mt = np.zeros((Ep, 3), np.float32)
        ms = np.ones(Ep, np.float32)
        ei[:E] = [e[0] for e in edges]
        ej[:E] = [e[1] for e in edges]
        mR[:E] = np.stack([e[2] for e in edges]).astype(np.float32)
        mt[:E] = np.stack([e[3] for e in edges]).astype(np.float32)
        ms[:E] = [e[4] for e in edges]
        fixed = np.ones(Kp, bool)
        fixed[:K] = np.array([k == self._matched_kf for k in kfs])
        evalid = np.zeros(Ep, bool)
        evalid[:E] = True

        prob = posegraph.PoseGraphProblem(
            vertices=sim3_mod.Sim3(
                R=jnp.asarray(Rvp), t=jnp.asarray(tvp), s=jnp.asarray(svp)
            ),
            edge_i=jnp.asarray(ei),
            edge_j=jnp.asarray(ej),
            meas=sim3_mod.Sim3(R=jnp.asarray(mR), t=jnp.asarray(mt), s=jnp.asarray(ms)),
            edge_valid=jnp.asarray(evalid),
            fixed=jnp.asarray(fixed),
        )
        if self.mesh is not None:
            from ..parallel import dist_posegraph

            if self._dist_pg is None:
                self._dist_pg = dist_posegraph.make_distributed_posegraph(
                    self.mesh, fix_scale=self.fix_scale
                )
            V_opt, _ = self._dist_pg(
                dist_posegraph.pad_graph_edges_to_multiple(
                    prob, self.mesh.devices.size
                )
            )
        else:
            V_opt, _ = posegraph.optimize_essential_graph_jit(
                prob, fix_scale=self.fix_scale
            )
        V_opt = jax.device_get(V_opt)  # one batched fetch
        R_opt, t_opt, s_opt = V_opt.R, V_opt.t, V_opt.s

        # write-back under the map lock: correct points via their reference
        # keyframe, p' = S_corr^-1(S_old p) — one batched pass over all
        # valid points, grouped by ref keyframe
        with self.lock:
            old_T = np.stack([old_poses[k] for k in kfs])  # [K,4,4]
            kf_lut = np.full(max(kfs) + 2, -1, np.int64)  # kf id -> vertex
            kf_lut[np.asarray(kfs)] = np.arange(K)
            pids = m.pt_ids()
            refs = m.pt_ref_kf[pids]
            ok = (refs >= 0) & (refs < len(kf_lut))
            ok[ok] = kf_lut[refs[ok]] >= 0
            pids = pids[ok]
            vi = kf_lut[m.pt_ref_kf[pids]]
            pw = m.pt_pos[pids]
            T_old = old_T[vi]
            pc = np.einsum("nij,nj->ni", T_old[:, :3, :3], pw) + T_old[:, :3, 3]
            Rn = R_opt[vi].astype(np.float64)
            tn = t_opt[vi].astype(np.float64)
            sn = s_opt[vi].astype(np.float64)
            v = (pc - tn) / sn[:, None]
            m.pt_pos[pids] = np.einsum("nji,nj->ni", Rn, v)  # R^T @ v per row
            anchor = max((k for k in kfs if k in m.kf_valid), default=None)
            T_anchor_old = (
                m.kf_pose[anchor].astype(np.float64).copy()
                if anchor is not None else None
            )
            for k, i in index.items():
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = R_opt[i]
                T[:3, 3] = t_opt[i] / s_opt[i]
                m.kf_pose[k] = T
            m.update_normals_batch(m.pt_ids())
            if self.on_pose_jump is not None and anchor is not None:
                self.on_pose_jump(T_anchor_old, m.kf_pose[anchor])

    # ------------------------------------------------------------------

    def _global_ba(self, kf: int):
        """Full-map BA (reference RunGlobalBundleAdjustment,
        LoopClosing.cpp:607-758; Optimizer::GlobalBundleAdjustemnt).

        Staged two-phase commit (the mTcwGBA pattern, Optimizer.cpp:
        170-199): the problem is assembled from a snapshot under the map
        lock, the solve runs OUTSIDE the lock (chunked, so the tracker's
        device programs interleave with it and frames keep flowing), and
        the results are applied at the end under the lock — with
        spanning-tree propagation to keyframes/points the tracker created
        while the solve was running (LoopClosing.cpp:673-733)."""
        m = self.map
        from .ba_assembly import assemble_pm_problem

        with self.lock:
            kfs = sorted(m.kf_valid)
            pts = [int(p) for p in m.pt_ids()]
            if len(kfs) < 2 or len(pts) < 10:
                return
            kf_index = {k: i for i, k in enumerate(kfs)}
            pt_index = {p: i for i, p in enumerate(pts)}
            prob, meta = assemble_pm_problem(
                m, self.frontend, kfs, pts, kf_index, pt_index, kfs,
                shapes=self.shapes,
            )
        if prob is None:
            return
        # let the tracker create keyframes again while GBA runs (the
        # reference releases LocalMapping before spawning the GBA thread)
        if self.local_mapper is not None:
            self.local_mapper.release()
        if self.mesh is not None:
            from ..parallel import dist_ba as dist_ba_mod

            if self._dist_gba is None:
                self._dist_gba = dist_ba_mod.make_distributed_ba_pm(
                    self.mesh, self.frontend.camera,
                    n_iters_first=5, n_iters_second=10,
                )
            P = prob.points.shape[0]
            res = self._dist_gba(
                dist_ba_mod.pad_points_to_multiple(prob, self.mesh.devices.size)
            )
            # un-pad so write-back shapes match the assembled problem
            res = res._replace(
                points=res.points[:P], edge_inlier=res.edge_inlier[:P]
            )
        else:
            # 10+15 LM iterations (reference GlobalBundleAdjustemnt runs
            # 10 exact-solve iterations, Optimizer.cpp:40; the matrix-free
            # PCG inner solve is approximate, so extra outer iterations
            # buy back the exactness — affordable now that GBA rides its
            # own thread off the correction's critical path)
            res = ba.ba_solve_pm_interruptible(
                prob, self.frontend.camera, n_iters_first=10,
                n_iters_second=15, sync_every=5, n_cg=40,
                should_abort=lambda: self._gba_stop,
            )
        if self._gba_stop:
            # aborted by a newer loop correction: discard (the reference
            # likewise returns without updating, LoopClosing.cpp:641-654)
            return
        with self.lock, self._span("Graph update"):
            self._apply_gba_staged(res, meta, kfs, pts)

    def _apply_gba_staged(self, res, meta, solved_kfs, solved_pts):
        """Apply GBA results + propagate to state created during the solve
        (reference LoopClosing.cpp:673-733): child keyframes get
        Tcw_new = (Tcw_child · Tcw_parent^-1) · Tcw_parent_corrected via the
        spanning tree; points created meanwhile move with their reference
        keyframe."""
        from .ba_assembly import apply_pm_result

        m = self.map
        solved_set = set(solved_kfs)
        # poses before correction, for relative-pose propagation
        pre = {k: m.kf_pose[k].astype(np.float64).copy() for k in m.kf_pose}
        apply_pm_result(m, res, meta)
        # keyframes created during the solve, ascending id => parents first
        new_kfs = sorted(k for k in m.kf_valid if k not in solved_set)
        for k in new_kfs:
            par = m.parent.get(k)
            if par is None or par not in pre:
                continue
            T_rel = pre[k] @ np.linalg.inv(pre[par])
            m.kf_pose[k] = (T_rel @ m.kf_pose[par].astype(np.float64)).astype(
                np.float32
            )
        # points created during the solve: move with their ref keyframe
        solved_pt_mask = np.zeros(m._pt_capacity(), bool)
        solved_pt_mask[np.asarray(solved_pts, np.int64)] = True
        all_ids = m.pt_ids()
        new_pts = all_ids[~solved_pt_mask[all_ids]]
        if new_pts.size:
            refs = m.pt_ref_kf[new_pts]
            ref_ids = np.array(
                sorted({int(r) for r in refs if int(r) in m.kf_valid}), np.int64
            )
            if ref_ids.size:
                lut = np.full(int(ref_ids.max()) + 2, -1, np.int64)
                lut[ref_ids] = np.arange(len(ref_ids))
                sel = (refs >= 0) & (refs <= ref_ids.max())
                sel[sel] = lut[refs[sel]] >= 0
                ids = new_pts[sel]
                vi = lut[m.pt_ref_kf[ids]]
                pre_T = np.stack([pre[int(k)] for k in ref_ids])
                new_T = np.stack(
                    [m.kf_pose[int(k)].astype(np.float64) for k in ref_ids]
                )
                new_Twc = np.linalg.inv(new_T)
                pw = m.pt_pos[ids]
                pc = (
                    np.einsum("nij,nj->ni", pre_T[vi][:, :3, :3], pw)
                    + pre_T[vi][:, :3, 3]
                )
                m.pt_pos[ids] = (
                    np.einsum("nij,nj->ni", new_Twc[vi][:, :3, :3], pc)
                    + new_Twc[vi][:, :3, 3]
                )
        m.update_normals_batch(new_pts)
        anchor = max((k for k in m.kf_valid if k in pre), default=None)
        if self.on_pose_jump is not None and anchor is not None:
            self.on_pose_jump(pre[anchor], m.kf_pose[anchor])
