"""Relocalization: BoW candidate retrieval + hypothesis-parallel EPnP.

Re-implements the reference Tracking::Relocalization (src/Tracking.cpp:
1177-1346): query the keyframe database, match candidates by descriptor,
solve EPnP RANSAC per candidate (here: all hypotheses batched on device),
refine with motion-only BA, widen with projection search if needed,
accept at >=50 inliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import hamming, matchers, pnp, pose_opt
from ..vocab import bow as bow_mod
from ..vocab.database import KeyFrameDatabase
from .frontend import FrameHost, Frontend
from .map import SlamMap


class Relocalizer:
    def __init__(
        self,
        config: SlamConfig,
        frontend: Frontend,
        slam_map: SlamMap,
        vocab: bow_mod.Vocabulary,
        solver: str = "epnp",  # "epnp" | "mlpnp" (BASELINE config 4 variant)
    ):
        self.config = config
        self.frontend = frontend
        self.map = slam_map
        self.vocab = vocab
        self.solver = solver
        self.database = KeyFrameDatabase(vocab.n_words)
        # pre-split key pool (jax.random.split is an eager device
        # dispatch — a tunnel round trip per relocalization otherwise)
        self._keys = list(jax.device_get(
            jax.random.split(jax.random.PRNGKey(42), 4096)
        ))
        self._key_i = 0

        # device: tree descent -> (word ids, FeatureVector node ids);
        # host: sparse tf-idf vector (the dense [n_words] vector does not
        # scale to ORBvoc's 1M words)
        self._jit_transform = jax.jit(
            lambda d, v: bow_mod.transform_words_nodes(vocab, d, v)
        )
        self._word_weight_np = np.asarray(vocab.word_weight)
        #: per-attempt gate trace (the RELOC_TRACE.json artifact): which of
        #: the reference's gates (DB candidates -> BoW matches -> EPnP
        #: inliers -> pose-opt -> widening, src/Tracking.cpp:1177-1346)
        #: killed each attempt. Bounded: callers truncate on write-out.
        self.trace: list = []
        self._jit_ransac = jax.jit(pnp.pnp_ransac, static_argnames=("n_hyp",))
        from ..ops import mlpnp as mlpnp_mod

        self._mlpnp = mlpnp_mod
        self._jit_mlpnp = jax.jit(
            mlpnp_mod.mlpnp_ransac, static_argnames=("n_hyp",)
        )
        self._jit_pose_opt = jax.jit(
            lambda T0, pw, obs, isig, ster, valid: pose_opt.pose_optimize(
                T0, pw, obs, isig, ster, valid, frontend.camera
            )
        )
        self._jit_match_bow = jax.jit(matchers.search_by_bow)
        self._jit_search_proj = jax.jit(
            matchers.search_by_projection_frame, static_argnames=("check_rotation",)
        )

        # ---- batched relocalization core: ALL candidates' BoW matching +
        # hypothesis-parallel EPnP RANSAC as ONE device program (the
        # reference interleaves per-candidate RANSACs on the host,
        # Tracking.cpp:1239-1334 / SURVEY P4; round-2 postmortem measured
        # the per-candidate dispatch chain at 1.0 s mean per reloc event)
        def _reloc_body(fdesc, fvalid, fangle, kf_desc, kf_has, kf_ang,
                        pw, obs_n, max_err2, keys):
            N = fvalid.shape[0]

            def per_cand(desc_c, has_c, ang_c, pw_c, key):
                idx, best, keep = matchers.search_by_bow(
                    desc_c, has_c, ang_c, fdesc, fvalid, fangle, 0.75
                )
                # resolve frame-keypoint collisions on device (best
                # distance wins — the host argsort loop of the sequential
                # path, vectorized)
                src, _ = matchers._resolve_collisions(
                    idx, jnp.where(keep, best, hamming.MAX_DIST), N
                )
                hit = src >= 0
                choice = matchers._choice_matrix(
                    jnp.clip(src, 0, N - 1).astype(jnp.int32), N
                )
                pw_kp = jnp.einsum(
                    "sn,nd->sd", choice.astype(jnp.float32),
                    pw_c.astype(jnp.float32), precision="highest",
                )
                res = pnp.pnp_ransac(key, pw_kp, obs_n, hit, max_err2)
                return (
                    src, hit, jnp.sum(hit), res.R, res.t,
                    res.inliers, res.n_inliers,
                )

            return jax.vmap(per_cand)(kf_desc, kf_has, kf_ang, pw, keys)

        self._jit_reloc_batch = jax.jit(_reloc_body)

    # ------------------------------------------------------------------

    def compute_bow(self, desc: np.ndarray, valid: np.ndarray):
        """Returns (per-descriptor word ids [N], sparse (wid, weight))."""
        words, _ = self.compute_bow_nodes(desc, valid)
        return words, bow_mod.bow_sparse(words, self._word_weight_np)

    def compute_bow_nodes(self, desc: np.ndarray, valid: np.ndarray):
        """Returns (word ids [N], FeatureVector node ids [N])."""
        words, nodes = jax.device_get(
            self._jit_transform(jnp.asarray(desc), jnp.asarray(valid))
        )
        return np.asarray(words), np.asarray(nodes)

    def add_keyframe(self, kf: int, lock=None):
        """Register a keyframe in the BoW database. The transform runs on
        the frame's immutable feature snapshot (safe without the map
        lock); with `lock` given, the database insertion re-validates the
        keyframe under it — a mapping worker may cull a queued keyframe
        between the caller's check and here, and inserting a culled
        keyframe would leak a dead entry past the erase callback."""
        f = self.map.kf_frame.get(kf)
        if f is None:
            return
        words, nodes = self.compute_bow_nodes(f.desc, f.valid)
        vec = bow_mod.bow_sparse(words, self._word_weight_np)
        if lock is None:
            self.database.add(kf, words, vec, nodes=nodes)
            return
        with lock:
            if kf in self.map.kf_valid:
                self.database.add(kf, words, vec, nodes=nodes)

    def remove_keyframe(self, kf: int):
        self.database.erase(kf)

    # ------------------------------------------------------------------

    def relocalize(self, frame: FrameHost) -> bool:
        words, vec = self.compute_bow(frame.desc, frame.valid)
        candidates = self.database.detect_relocalization_candidates(
            words, vec, self.map
        )
        rec = {"frame": int(frame.frame_id), "n_db_cands": len(candidates),
               "cands": [], "ok": False}
        self.trace.append(rec)
        if not candidates:
            rec["stage"] = "db_candidates"
            return False
        if self.solver != "mlpnp":
            ok = self._relocalize_batched(frame, candidates, rec)
        else:
            ok = self._relocalize_sequential(frame, candidates)
        rec["ok"] = bool(ok)
        return ok

    def _relocalize_batched(self, frame: FrameHost, candidates, rec=None) -> bool:
        """All candidates solved in ONE device program (BoW match +
        hypothesis-parallel EPnP each), then the winner is refined with
        pose optimization + the reference's two widening passes
        (Tracking.cpp:1239-1334)."""
        C = self.config.shapes.reloc_cands
        cands = [kf for kf in candidates[:C] if kf in self.map.kf_valid]
        if not cands:
            return False
        cam = self.config.camera
        sigma2 = self.frontend.level_sigma2
        N = len(frame.valid)
        kf_desc = np.zeros((C, N, 8), np.uint32)
        kf_has = np.zeros((C, N), bool)
        kf_ang = np.zeros((C, N), np.float32)
        pw = np.zeros((C, N, 3), np.float32)
        kf_pids_all = np.full((C, N), -1, np.int64)
        for c, kf in enumerate(cands):
            kff = self.map.kf_frame[kf]
            kf_pids = self.map.kf_point[kf]
            has_pt = (kf_pids >= 0) & self.map.valid_mask(kf_pids)
            kf_desc[c][has_pt] = self.map.pt_desc[kf_pids[has_pt]]
            kf_has[c] = has_pt
            kf_ang[c] = kff.angle
            pw[c][has_pt] = self.map.pt_pos[kf_pids[has_pt]]
            kf_pids_all[c][has_pt] = kf_pids[has_pt]
        obs_n = np.stack(
            [
                (frame.uv[:, 0] - cam.cx) / cam.fx,
                (frame.uv[:, 1] - cam.cy) / cam.fy,
            ],
            axis=1,
        ).astype(np.float32)
        max_err2 = (
            5.991 * sigma2[frame.octave] / (cam.fx * cam.fx)
        ).astype(np.float32)
        keys = np.stack(
            [self._keys[(self._key_i + j) % len(self._keys)] for j in range(C)]
        )
        self._key_i += C
        src, hit, n_bow, Rs, ts, inls, n_inls = jax.device_get(
            self._jit_reloc_batch(
                frame.dev.desc, frame.dev.valid, frame.dev.angle,
                kf_desc, kf_has, kf_ang, pw, obs_n, max_err2, keys,
            )
        )
        # best candidate first (reference tries candidates round-robin
        # until one reaches 50 inliers; argsort by RANSAC support is the
        # batched equivalent)
        for c in np.argsort(-n_inls):
            c = int(c)
            if c >= len(cands):  # zero-padded candidate rows
                continue
            crec = {"kf": int(cands[c]), "n_bow": int(n_bow[c]),
                    "n_pnp": int(n_inls[c])}
            if rec is not None:
                rec["cands"].append(crec)
            if n_bow[c] < 15 or n_inls[c] < 10:
                crec["stage"] = "bow" if n_bow[c] < 15 else "pnp"
                continue
            Tcw = np.eye(4, dtype=np.float32)
            Tcw[:3, :3] = Rs[c]
            Tcw[:3, 3] = ts[c]
            frame.Tcw = Tcw
            sel = hit[c] & inls[c]
            frame.point_ids[:] = np.where(
                sel, kf_pids_all[c][np.clip(src[c], 0, N - 1)], -1
            )
            n_good = self._optimize(frame)
            crec["n_opt"] = int(n_good)
            if n_good < 10:
                crec["stage"] = "pose_opt"
                continue
            if n_good < 50:
                n_good = self._widen(frame, cands[c], th=10.0, orb_dist=100)
                if 30 <= n_good < 50:
                    n_good = self._widen(frame, cands[c], th=3.0, orb_dist=64)
            crec["n_widen"] = int(n_good)
            if n_good >= 50:
                crec["stage"] = "accepted"
                return True
            crec["stage"] = "widen"
        return False

    def _relocalize_sequential(self, frame: FrameHost, candidates) -> bool:
        """Per-candidate path (MLPnP solver variant, BASELINE config 4)."""
        cam = self.config.camera
        sigma2 = self.frontend.level_sigma2
        for kf in candidates[:5]:
            if kf not in self.map.kf_valid:
                continue
            pids = self._bow_match_keyframe(frame, kf)
            n_matches = int((pids >= 0).sum())
            if n_matches < 15:
                continue

            # EPnP RANSAC over the 2D-3D matches (normalized coordinates)
            N = len(pids)
            pw = np.zeros((N, 3), np.float32)
            valid = (pids >= 0) & self.map.valid_mask(pids)
            pw[valid] = self.map.pt_pos[pids[valid]]
            sub = self._keys[self._key_i % len(self._keys)]
            self._key_i += 1
            if self.solver == "mlpnp":
                bearings = self._mlpnp.bearings_from_pixels(
                    jnp.asarray(frame.uv), cam.fx, cam.fy, cam.cx, cam.cy
                )
                # angular gate equivalent to the pixel chi2 gate
                ang = np.sqrt(5.991 * sigma2[frame.octave]) / cam.fx
                cos_th = jnp.asarray(np.cos(ang).astype(np.float32))
                mres = jax.device_get(
                    self._jit_mlpnp(
                        sub, jnp.asarray(pw), bearings, jnp.asarray(valid), cos_th
                    )
                )
                if int(mres.n_inliers) < 10:
                    continue
                frame.Tcw = mres.Tcw.astype(np.float32)
                inl = mres.inliers
            else:
                obs_n = np.stack(
                    [
                        (frame.uv[:, 0] - cam.cx) / cam.fx,
                        (frame.uv[:, 1] - cam.cy) / cam.fy,
                    ],
                    axis=1,
                ).astype(np.float32)
                max_err2 = (
                    5.991 * sigma2[frame.octave] / (cam.fx * cam.fx)
                ).astype(np.float32)
                res = jax.device_get(
                    self._jit_ransac(
                        sub, jnp.asarray(pw), jnp.asarray(obs_n), jnp.asarray(valid),
                        jnp.asarray(max_err2),
                    )
                )
                if int(res.n_inliers) < 10:
                    continue
                Tcw = np.eye(4, dtype=np.float32)
                Tcw[:3, :3] = res.R
                Tcw[:3, 3] = res.t
                frame.Tcw = Tcw
                inl = res.inliers
            frame.point_ids[:] = np.where(inl & valid, pids, -1)

            n_good = self._optimize(frame)
            if n_good < 10:
                continue
            if n_good < 50:
                n_good = self._widen(frame, kf, th=10.0, orb_dist=100)
                if 30 <= n_good < 50:
                    n_good = self._widen(frame, kf, th=3.0, orb_dist=64)
            if n_good >= 50:
                return True
        return False

    # ------------------------------------------------------------------

    def _bow_match_keyframe(self, frame: FrameHost, kf: int) -> np.ndarray:
        """SearchByBoW(KF, Frame) equivalent (ratio 0.75, rotation check)."""
        kff = self.map.kf_frame[kf]
        kf_pids = self.map.kf_point[kf]
        has_pt = (kf_pids >= 0) & self.map.valid_mask(kf_pids)
        desc = np.zeros((len(kf_pids), 8), np.uint32)
        desc[has_pt] = self.map.pt_desc[kf_pids[has_pt]]
        idx, best, keep = jax.device_get(
            self._jit_match_bow(
                jnp.asarray(desc), jnp.asarray(has_pt), kff.dev.angle,
                frame.dev.desc, frame.dev.valid, frame.dev.angle, 0.75,
            )
        )
        out = np.full(len(frame.valid), -1, np.int64)
        order = np.argsort(best)
        used = np.zeros(len(frame.valid), bool)
        for i in order:
            if keep[i] and not used[idx[i]]:
                out[idx[i]] = kf_pids[i]
                used[idx[i]] = True
        return out

    def _optimize(self, frame: FrameHost) -> int:
        N = len(frame.valid)
        pw = np.zeros((N, 3), np.float32)
        pids = frame.point_ids
        valid = (pids >= 0) & self.map.valid_mask(pids)
        pw[valid] = self.map.pt_pos[pids[valid]]
        if valid.sum() < 3:
            return 0
        obs = np.concatenate([frame.uv, frame.u_right[:, None]], axis=1).astype(
            np.float32
        )
        inv_sig = 1.0 / self.frontend.level_sigma2[frame.octave]
        res = jax.device_get(  # one batched fetch
            self._jit_pose_opt(
                jnp.asarray(frame.Tcw), jnp.asarray(pw), jnp.asarray(obs),
                jnp.asarray(inv_sig, jnp.float32), jnp.asarray(frame.u_right >= 0),
                jnp.asarray(valid),
            )
        )
        frame.Tcw = res.Tcw
        frame.point_ids[valid & ~res.inlier] = -1
        return int(res.n_inliers)

    def _widen(self, frame: FrameHost, kf: int, th: float, orb_dist: int) -> int:
        """SearchByProjection against the candidate keyframe's points
        (reference ORBmatcher.cpp:1317-1444) then re-optimize."""
        cam = self.config.camera
        kf_pids = self.map.kf_point[kf]
        already = np.unique(frame.point_ids[frame.point_ids >= 0])
        kff = self.map.kf_frame[kf]
        sel = (kf_pids >= 0) & self.map.valid_mask(kf_pids)
        sel &= ~np.isin(kf_pids, already)
        cand = kf_pids[sel]
        oct_rows = kff.octave[sel]
        if cand.size == 0:
            return self._optimize(frame)
        desc_rows = self.map.pt_desc[cand]
        pos = self.map.pt_pos[cand].astype(np.float64)
        Rcw = frame.Tcw[:3, :3].astype(np.float64)
        tcw = frame.Tcw[:3, 3].astype(np.float64)
        pc = pos @ Rcw.T + tcw
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        u = cam.fx * pc[:, 0] / zs + cam.cx
        v = cam.fy * pc[:, 1] / zs + cam.cy
        proj_ok = (z > 0) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)

        sh = self.config.shapes
        P = sh.bucket(len(cand), 256, sh.fuse_src_cap)
        def padto(a, fill=0):
            out = np.full((P,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        kp_free = frame.valid & (frame.point_ids < 0)
        pfk, d = jax.device_get(
            self._jit_search_proj(
                frame.dev.uv, frame.dev.octave,
                frame.dev.desc, jnp.asarray(kp_free), frame.dev.angle,
                jnp.asarray(padto(np.stack([u, v], -1).astype(np.float32))),
                jnp.asarray(padto(np.array(oct_rows, np.int32))),
                jnp.asarray(padto(np.stack(desc_rows).astype(np.uint32))),
                jnp.asarray(padto(proj_ok)),
                jnp.asarray(padto(kff.angle[: len(cand)] * 0.0)),  # rotation check off
                self.frontend.scale_factors, th,
                jnp.asarray(False), jnp.asarray(False),
                check_rotation=False,
            )
        )
        for i in np.nonzero(pfk >= 0)[0]:
            if frame.point_ids[i] < 0 and pfk[i] < len(cand) and d[i] <= orb_dist:
                frame.point_ids[i] = cand[int(pfk[i])]
        return self._optimize(frame)
