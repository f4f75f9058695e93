"""Shared host-side assembly of point-major BA problems from the map.

Both local BA (local_mapping) and global BA (loop_closing) build the same
structure: the map's observation lists grouped per point into [P, D]
rows, padded per the shape policy (slam/shapes.py) so jit recompiles stay
bounded (fixed caps on TPU: one compiled program per solver).

The observation gather is fully vectorized over the map's dense pt_obs
mirror — no per-point python walk (the reference's g2o assembly loops per
edge, src/Optimizer.cpp:482-563; here assembly must be cheap because it
runs under the map lock while the tracker frames).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..ops import ba
from . import shapes as shapes_mod
from .map import SlamMap

MAX_OBS_PER_POINT = 16  # D cap; overflow observations skip BA (kept in map)


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
    shapes: "shapes_mod.ShapePolicy" = None,
):
    """Returns (BAProblemPM, PMMeta) or (None, None) if underconstrained."""
    sh = shapes if shapes is not None else shapes_mod.ShapePolicy()
    K, P, D = sh.ba_shape(len(all_kfs), len(pts), MAX_OBS_PER_POINT)

    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k, i in kf_index.items():
        poses[i] = m.kf_pose[k]
    pts_arr = np.asarray(pts, np.int64)
    points = np.zeros((P, 3), np.float32)
    points[: len(pts)] = m.pt_pos[pts_arr]
    fixed_mask = np.ones(K, bool)
    for k in free_kfs:
        fixed_mask[kf_index[k]] = k == 0  # KF0 anchors the gauge
    if all(fixed_mask[kf_index[k]] for k in free_kfs):
        return None, None
    if len(pts) < 3:
        return None, None

    # --- vectorized observation gather over the dense pt_obs mirror ---
    rows_kf = m.pt_obs_kf[pts_arr]  # [P0, D0] kf id per slot (-1 empty)
    rows_idx = m.pt_obs_idx[pts_arr]  # [P0, D0] feature index
    P0, D0 = rows_kf.shape
    # kf id -> solver row lookup (only kfs in this problem participate)
    kf_ids = np.asarray(all_kfs, np.int64)
    lut = np.full(int(kf_ids.max()) + 2 if len(kf_ids) else 1, -1, np.int64)
    lut[kf_ids] = [kf_index[int(k)] for k in kf_ids]
    in_prob = (rows_kf >= 0) & (rows_kf < len(lut))
    ki = np.where(in_prob, lut[np.clip(rows_kf, 0, len(lut) - 1)], -1)
    sel = in_prob & (ki >= 0)
    # compact selected slots to the left of each row (stable)
    order = np.argsort(~sel, axis=1, kind="stable")
    sel_c = np.take_along_axis(sel, order, axis=1)[:, :D]
    ki_c = np.take_along_axis(ki, order, axis=1)[:, :D]
    kf_c = np.take_along_axis(rows_kf, order, axis=1)[:, :D]
    idx_c = np.take_along_axis(rows_idx, order, axis=1)[:, :D]
    n_edges = int(sel_c.sum())
    if n_edges < 10:
        return None, None
    max_d = int(sel_c.sum(axis=1).max())
    D_eff = D if sh.fixed else min(D, shapes_mod.pow2(max_d, 2))
    sel_c = sel_c[:, :D_eff]
    ki_c = ki_c[:, :D_eff]
    kf_c = kf_c[:, :D_eff]
    idx_c = idx_c[:, :D_eff]

    # stacked per-keyframe feature tables for one fancy-indexed gather
    f0 = m.kf_frame[int(kf_ids[0])]
    N = len(f0.valid)
    uv_all = np.zeros((len(kf_ids), N, 2), np.float32)
    ur_all = np.full((len(kf_ids), N), -1.0, np.float32)
    oct_all = np.zeros((len(kf_ids), N), np.int32)
    kf_row = {}
    for r, k in enumerate(kf_ids):
        f = m.kf_frame[int(k)]
        uv_all[r] = f.uv
        ur_all[r] = f.u_right
        oct_all[r] = f.octave
        kf_row[int(k)] = r
    row_lut = np.full(len(lut), 0, np.int64)
    row_lut[kf_ids] = [kf_row[int(k)] for k in kf_ids]
    fr = row_lut[np.clip(kf_c, 0, len(lut) - 1)]
    fi = np.clip(idx_c, 0, N - 1)

    sigma2 = frontend.level_sigma2
    obs_kf = np.zeros((P, D_eff), np.int32)
    obs = np.zeros((P, D_eff, 3), np.float32)
    isig = np.ones((P, D_eff), np.float32)
    ster = np.zeros((P, D_eff), bool)
    valid = np.zeros((P, D_eff), bool)
    edge_kf = np.full((P, D_eff), -1, np.int64)
    obs_kf[:P0] = np.where(sel_c, ki_c, 0)
    uv_g = uv_all[fr, fi]  # [P0, D_eff, 2]
    ur_g = ur_all[fr, fi]
    obs[:P0, :, 0] = np.where(sel_c, uv_g[..., 0], 0.0)
    obs[:P0, :, 1] = np.where(sel_c, uv_g[..., 1], 0.0)
    obs[:P0, :, 2] = np.where(sel_c, ur_g, 0.0)
    isig[:P0] = np.where(
        sel_c, 1.0 / sigma2[oct_all[fr, fi]], 1.0
    ).astype(np.float32)
    ster[:P0] = sel_c & (ur_g >= 0)
    valid[:P0] = sel_c
    edge_kf[:P0] = np.where(sel_c, kf_c, -1)

    # numpy leaves on purpose: assembly runs under the map lock, and the
    # ~10 MB host->device upload (tier-2 obs tables, ~140 ms over the
    # tunnel) must happen at the solver's first dispatch OUTSIDE the lock,
    # not here while the tracker waits
    prob = ba.BAProblemPM(
        poses=poses,
        points=points,
        obs_kf=obs_kf,
        obs=obs,
        inv_sigma2=isig,
        is_stereo=ster,
        edge_valid=valid,
        pose_fixed=fixed_mask,
    )
    meta = PMMeta(kf_index, pt_index, fixed_mask, edge_kf, pts, free_kfs)
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
        if not meta.fixed_mask[i] and k in m.kf_valid:
            m.kf_pose[k] = new_poses[i]
    pt_ids = np.asarray(meta.pts, np.int64)
    alive = m.valid_mask(pt_ids)
    m.pt_pos[pt_ids[alive]] = new_points[: len(pt_ids)][alive].astype(np.float64)
    bad_rows, bad_slots = np.nonzero(
        (meta.edge_kf >= 0) & ~inlier[: meta.edge_kf.shape[0]]
    )
    for r, c in zip(bad_rows, bad_slots):
        p = meta.pts[r] if r < len(meta.pts) else None
        if p is not None and p in m.pt_valid:
            m.erase_observation(p, int(meta.edge_kf[r, c]))
    m.update_normals_batch(meta.pts)
