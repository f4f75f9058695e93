"""Distributed bundle adjustment over a device mesh.

The north-star distributed design (BASELINE.json): partition the
observation (edge) set across devices, keep poses/points replicated, and
let every normal-equation reduction ride `psum` over ICI. The single-chip
solver (ops/ba.py) already funnels every cross-edge reduction through
`_reduce(axis_name)`, so the distributed adjuster is literally the same
program wrapped in `shard_map` with edges sharded.

Scaling character: per-device work is E/n_devices edge evaluations per
CG step; communication is O(K*36 + P*9) floats per psum — independent of
E — so efficiency rises with map size (the BASELINE.md ≥70% target is a
bandwidth/FLOP tradeoff met once E/n >> K+P).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry.camera import Camera
from ..ops import ba
from .mesh import EDGE_AXIS


def pad_edges_to_multiple(prob: ba.BAProblem, n: int) -> ba.BAProblem:
    """Pad the edge arrays so E divides the mesh size (padded edges invalid)."""
    E = prob.obs.shape[0]
    pad = (-E) % n
    if pad == 0:
        return prob
    zpad = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )
    return prob._replace(
        obs_kf=zpad(prob.obs_kf),
        obs_pt=zpad(prob.obs_pt),
        obs=zpad(prob.obs),
        inv_sigma2=zpad(prob.inv_sigma2),
        is_stereo=zpad(prob.is_stereo),
        edge_valid=jnp.concatenate(
            [prob.edge_valid, jnp.zeros(pad, bool)], axis=0
        ),
    )


def make_distributed_ba(
    mesh: Mesh,
    cam: Camera,
    n_iters_first: int = 5,
    n_iters_second: int = 10,
    n_cg: int = 30,
):
    """Build a jitted distributed BA step for the given mesh.

    Returns fn(prob: BAProblem) -> BAResult with edge arrays sharded over
    the mesh's EDGE_AXIS and poses/points replicated. The camera is baked
    in as a program constant.
    """
    edge_spec = P(EDGE_AXIS)
    rep = P()

    in_specs = (
        ba.BAProblem(
            poses=rep, points=rep,
            obs_kf=edge_spec, obs_pt=edge_spec, obs=edge_spec,
            inv_sigma2=edge_spec, is_stereo=edge_spec, edge_valid=edge_spec,
            pose_fixed=rep,
        ),
    )
    out_specs = ba.BAResult(
        poses=rep, points=rep, edge_inlier=edge_spec, final_chi2=rep
    )

    def _solve(prob):
        return ba.ba_solve(
            prob, cam,
            n_iters_first=n_iters_first,
            n_iters_second=n_iters_second,
            n_cg=n_cg,
            axis_name=EDGE_AXIS,
        )

    sharded = shard_map(
        _solve, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# point-major distributed BA: map blocks (point rows) partitioned per device
# ---------------------------------------------------------------------------


def pad_points_to_multiple(prob: ba.BAProblemPM, n: int) -> ba.BAProblemPM:
    """Pad point rows so P divides the mesh size (padded rows invalid)."""
    P = prob.points.shape[0]
    pad = (-P) % n
    if pad == 0:
        return prob
    zpad = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )
    return prob._replace(
        points=zpad(prob.points),
        obs_kf=zpad(prob.obs_kf),
        obs=zpad(prob.obs),
        inv_sigma2=zpad(prob.inv_sigma2),
        is_stereo=zpad(prob.is_stereo),
        edge_valid=jnp.concatenate(
            [prob.edge_valid, jnp.zeros((pad,) + prob.edge_valid.shape[1:], bool)]
        ),
    )


def make_distributed_ba_pm(
    mesh: Mesh,
    cam: Camera,
    n_iters_first: int = 5,
    n_iters_second: int = 10,
    n_cg: int = 20,
):
    """Point-major distributed BA: each device owns a block of point rows
    (its share of the map) and their observations; poses are replicated
    and the camera-side normal equations psum over ICI — the BASELINE
    north star's 'keyframe/map-block partitioned global BA'."""
    pt = P(EDGE_AXIS)
    rep = P()
    in_specs = (
        ba.BAProblemPM(
            poses=rep, points=pt,
            obs_kf=pt, obs=pt, inv_sigma2=pt, is_stereo=pt, edge_valid=pt,
            pose_fixed=rep,
        ),
    )
    out_specs = ba.BAResultPM(
        poses=rep, points=pt, edge_inlier=pt, final_chi2=rep
    )

    def _solve(prob):
        return ba.ba_solve_pm(
            prob, cam,
            n_iters_first=n_iters_first,
            n_iters_second=n_iters_second,
            n_cg=n_cg,
            axis_name=EDGE_AXIS,
        )

    return jax.jit(
        shard_map(_solve, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )
