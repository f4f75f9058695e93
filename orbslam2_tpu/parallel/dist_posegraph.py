"""Distributed essential-graph (Sim3 pose graph) optimization.

The loop-correction pose graph (reference Optimizer::OptimizeEssentialGraph,
src/Optimizer.cpp:790-1052) scales with the whole map — the reference's
long-context bottleneck. The north-star decomposition (BASELINE.json):
shard the Sim3 edge set (spanning tree + covisibility>=100 + loop edges)
across the mesh, replicate the vertices, and let every Gauss-Newton
reduction (gradient, block-diagonal preconditioner, Hessian-vector
products inside PCG, total error) ride `psum` over ICI.

ops/posegraph.py already funnels all cross-edge reductions through
`reduce_(axis_name)`, so — exactly like dist_ba — the distributed solver
is the same program wrapped in `shard_map` with edges sharded.

Communication per CG step is O(K*7) floats (one psum of the Hv product),
independent of E, so scaling efficiency rises with edge count; a
loop-closure event on a mature map has E >> K (covisibility edges
dominate), which is exactly the regime where the reference stalls its
mapping thread for the global optimization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import sim3
from ..ops import posegraph
from .mesh import EDGE_AXIS


def pad_graph_edges_to_multiple(
    prob: posegraph.PoseGraphProblem, n: int
) -> posegraph.PoseGraphProblem:
    """Pad edge arrays so E divides the mesh size (padded edges invalid,
    measurement = identity so autodiff stays finite)."""
    E = prob.edge_i.shape[0]
    pad = (-E) % n
    if pad == 0:
        return prob
    eye = sim3.Sim3(
        R=jnp.tile(jnp.eye(3, dtype=prob.meas.R.dtype), (pad, 1, 1)),
        t=jnp.zeros((pad, 3), prob.meas.t.dtype),
        s=jnp.ones((pad,), prob.meas.s.dtype),
    )
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    return prob._replace(
        edge_i=cat(prob.edge_i, jnp.zeros(pad, prob.edge_i.dtype)),
        edge_j=cat(prob.edge_j, jnp.zeros(pad, prob.edge_j.dtype)),
        meas=sim3.Sim3(
            R=cat(prob.meas.R, eye.R), t=cat(prob.meas.t, eye.t),
            s=cat(prob.meas.s, eye.s),
        ),
        edge_valid=cat(prob.edge_valid, jnp.zeros(pad, bool)),
    )


def make_distributed_posegraph(
    mesh: Mesh,
    n_iters: int = 20,
    n_cg: int = 50,
    fix_scale: bool = True,
):
    """Build a jitted distributed essential-graph step for the given mesh.

    Returns fn(prob: PoseGraphProblem) -> (Sim3 vertices, final error),
    with edge arrays sharded over EDGE_AXIS and vertices replicated.
    Edge count must divide the mesh size (pad_graph_edges_to_multiple).
    """
    edge = P(EDGE_AXIS)
    rep = P()
    in_specs = (
        posegraph.PoseGraphProblem(
            vertices=sim3.Sim3(R=rep, t=rep, s=rep),
            edge_i=edge, edge_j=edge,
            meas=sim3.Sim3(R=edge, t=edge, s=edge),
            edge_valid=edge,
            fixed=rep,
        ),
    )
    out_specs = (sim3.Sim3(R=rep, t=rep, s=rep), rep)

    def _solve(prob):
        return posegraph.optimize_essential_graph(
            prob,
            n_iters=n_iters,
            n_cg=n_cg,
            fix_scale=fix_scale,
            axis_name=EDGE_AXIS,
        )

    return jax.jit(
        shard_map(_solve, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )
