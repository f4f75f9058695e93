"""Shared host-side assembly of point-major BA problems from the map.

Both local BA (local_mapping) and global BA (loop_closing) build the same
structure: the map's observation lists grouped per point into [P, D]
rows, padded to power-of-two buckets so jit recompiles stay bounded.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..ops import ba
from .map import SlamMap

MAX_OBS_PER_POINT = 16  # D cap; overflow observations skip BA (kept in map)


def _pow2(n: int, lo: int) -> int:
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


class PMMeta:
    __slots__ = ("kf_index", "pt_index", "fixed_mask", "edge_kf", "pts", "local_kfs")

    def __init__(self, kf_index, pt_index, fixed_mask, edge_kf, pts, local_kfs):
        self.kf_index = kf_index
        self.pt_index = pt_index
        self.fixed_mask = fixed_mask
        self.edge_kf = edge_kf  # [P, D] original kf id per slot (-1 pad)
        self.pts = pts
        self.local_kfs = local_kfs


def assemble_pm_problem(
    m: SlamMap,
    frontend,
    all_kfs: List[int],
    pts: List[int],
    kf_index: Dict[int, int],
    pt_index: Dict[int, int],
    free_kfs: List[int],
):
    """Returns (BAProblemPM, PMMeta) or (None, None) if underconstrained."""
    K = _pow2(len(all_kfs), 8)
    P = _pow2(len(pts), 256)
    D = MAX_OBS_PER_POINT

    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k, i in kf_index.items():
        poses[i] = m.kf_pose[k]
    points = np.zeros((P, 3), np.float32)
    points[: len(pts)] = m.pt_pos[np.asarray(pts, np.int64)]
    fixed_mask = np.ones(K, bool)
    for k in free_kfs:
        fixed_mask[kf_index[k]] = k == 0  # KF0 anchors the gauge
    if all(fixed_mask[kf_index[k]] for k in free_kfs):
        return None, None

    obs_kf = np.zeros((P, D), np.int32)
    obs = np.zeros((P, D, 3), np.float32)
    isig = np.ones((P, D), np.float32)
    ster = np.zeros((P, D), bool)
    valid = np.zeros((P, D), bool)
    edge_kf = np.full((P, D), -1, np.int64)
    sigma2 = frontend.level_sigma2
    n_edges = 0
    max_d = 1
    for p in pts:
        row = pt_index[p]
        c = 0
        for k, idx in m.pt_obs[p].items():
            if k not in kf_index or c >= D:
                continue
            f = m.kf_frame[k]
            obs_kf[row, c] = kf_index[k]
            obs[row, c] = (f.uv[idx][0], f.uv[idx][1], f.u_right[idx])
            isig[row, c] = 1.0 / sigma2[f.octave[idx]]
            ster[row, c] = f.u_right[idx] >= 0
            valid[row, c] = True
            edge_kf[row, c] = k
            c += 1
        n_edges += c
        max_d = max(max_d, c)
    if n_edges < 10 or len(pts) < 3:
        return None, None
    D_eff = _pow2(max_d, 2)

    prob = ba.BAProblemPM(
        poses=jnp.asarray(poses),
        points=jnp.asarray(points),
        obs_kf=jnp.asarray(obs_kf[:, :D_eff]),
        obs=jnp.asarray(obs[:, :D_eff]),
        inv_sigma2=jnp.asarray(isig[:, :D_eff]),
        is_stereo=jnp.asarray(ster[:, :D_eff]),
        edge_valid=jnp.asarray(valid[:, :D_eff]),
        pose_fixed=jnp.asarray(fixed_mask),
    )
    meta = PMMeta(kf_index, pt_index, fixed_mask, edge_kf[:, :D_eff], pts, free_kfs)
    return prob, meta


def apply_pm_result(m: SlamMap, res, meta: PMMeta):
    """Write back poses/points; erase outlier observations (reference
    Optimizer.cpp:718-760); refresh normals."""
    import jax

    res = jax.device_get(res)  # one batched fetch (vs one RTT per field)
    new_poses = res.poses
    new_points = res.points
    inlier = res.edge_inlier
    for k, i in meta.kf_index.items():
        if not meta.fixed_mask[i]:
            m.kf_pose[k] = new_poses[i]
    pt_ids = np.asarray(meta.pts, np.int64)
    alive = m.valid_mask(pt_ids)
    m.pt_pos[pt_ids[alive]] = new_points[: len(pt_ids)][alive].astype(np.float64)
    bad_rows, bad_slots = np.nonzero((meta.edge_kf >= 0) & ~inlier)
    for r, c in zip(bad_rows, bad_slots):
        p = meta.pts[r] if r < len(meta.pts) else None
        if p is not None and p in m.pt_valid:
            m.erase_observation(p, int(meta.edge_kf[r, c]))
    m.update_normals_batch(meta.pts)
