"""Essential-graph optimization: Gauss-Newton over Sim3 vertices.

Replaces Optimizer::OptimizeEssentialGraph (reference src/Optimizer.cpp:
790-1052 — g2o LM over VertexSim3Expmap with EdgeSim3, lambda-init 1e-16,
20 iterations, identity information), as a batched, matrix-free solver:

  * vertices: all keyframes as Sim3 arrays (R [K,3,3], t [K,3], s [K]);
  * edges: loop connections + spanning tree + covisibility(>=100) + past
    loop edges, measurement Sji;
  * residual per edge r = log(Sji * Si * Sj^-1)  [7], Jacobians by
    forward-mode autodiff of the left-retraction, batched with vmap;
  * normal equations solved matrix-free with block-Jacobi PCG — the same
    gather/scatter/psum shape as ops/ba.py, so the pose graph shards over
    devices by splitting edges (the north star's "sharded Gauss-Newton
    over Sim3 edges").

For stereo maps scale is locked (reference _fix_scale, Optimizer.cpp:848).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3

_einsum = functools.partial(jnp.einsum, precision="highest")


class PoseGraphProblem(NamedTuple):
    vertices: sim3.Sim3  # batched [K]
    edge_i: jax.Array  # [E] int32
    edge_j: jax.Array  # [E] int32
    meas: sim3.Sim3  # batched [E] — Sji measurements
    edge_valid: jax.Array  # [E] bool
    fixed: jax.Array  # [K] bool


def _edge_residual(Si: sim3.Sim3, Sj: sim3.Sim3, Sji: sim3.Sim3) -> jax.Array:
    return sim3.log(sim3.compose(Sji, sim3.compose(Si, sim3.inverse(Sj))))


def _edge_res_jac(Si, Sj, Sji):
    """Residual [7] + Jacobians wrt left-retractions of Si and Sj [7,7]."""

    def f(xi_i, xi_j):
        return _edge_residual(
            sim3.retract(Si, xi_i), sim3.retract(Sj, xi_j), Sji
        )

    z = jnp.zeros(7)
    r = f(z, z)
    Ji = jax.jacfwd(f, argnums=0)(z, z)
    Jj = jax.jacfwd(f, argnums=1)(z, z)
    return r, Ji, Jj


def _gather(S: sim3.Sim3, idx) -> sim3.Sim3:
    return sim3.Sim3(R=S.R[idx], t=S.t[idx], s=S.s[idx])


def optimize_essential_graph(
    prob: PoseGraphProblem,
    n_iters: int = 20,
    n_cg: int = 50,
    fix_scale: bool = True,
    axis_name=None,
):
    """Returns optimized vertices (same pytree shape)."""
    K = prob.vertices.s.shape[0]
    free = (~prob.fixed).astype(jnp.float32)[:, None]

    def reduce_(x):
        return x if axis_name is None else jax.lax.psum(x, axis_name)

    def assemble(V: sim3.Sim3):
        Si = _gather(V, prob.edge_i)
        Sj = _gather(V, prob.edge_j)
        r, Ji, Jj = jax.vmap(_edge_res_jac)(Si, Sj, prob.meas)
        w = prob.edge_valid.astype(jnp.float32)
        rw = r * w[:, None]
        g = (
            jnp.zeros((K, 7)).at[prob.edge_i].add(_einsum("eci,ec->ei", Ji, rw))
            .at[prob.edge_j].add(_einsum("eci,ec->ei", Jj, rw))
        )
        Hd = (
            jnp.zeros((K, 7, 7))
            .at[prob.edge_i].add(_einsum("eci,e,ecj->eij", Ji, w, Ji))
            .at[prob.edge_j].add(_einsum("eci,e,ecj->eij", Jj, w, Jj))
        )
        F = jnp.sum(rw * r)
        return reduce_(g), reduce_(Hd), reduce_(F), (Ji, Jj, w)

    def hv(v, Ji, Jj, w, lam):
        a = _einsum("eci,ei->ec", Ji, v[prob.edge_i]) + _einsum(
            "eci,ei->ec", Jj, v[prob.edge_j]
        )
        aw = a * w[:, None]
        out = (
            jnp.zeros((K, 7)).at[prob.edge_i].add(_einsum("eci,ec->ei", Ji, aw))
            .at[prob.edge_j].add(_einsum("eci,ec->ei", Jj, aw))
        )
        return reduce_(out) + lam * v

    def mask_update(dx):
        dx = dx * free
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)
        return dx

    def lm_step(carry, _):
        V, lam, ni, F = carry
        g, Hd, _, (Ji, Jj, w) = assemble(V)
        g = mask_update(g)
        M = jnp.linalg.inv(Hd + (lam + 1e-8)[None, None, None] * jnp.eye(7))

        def precond(r_):
            return mask_update(_einsum("kij,kj->ki", M, r_))

        def hv_masked(v):
            return mask_update(hv(mask_update(v), Ji, Jj, w, lam))

        # PCG
        x = jnp.zeros((K, 7))
        r_ = g
        z = precond(r_)
        p = z
        rz = jnp.sum(r_ * z)

        def cg_body(c, _):
            x, r_, p, rz = c
            Ap = hv_masked(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x = x + alpha * p
            r_ = r_ - alpha * Ap
            z = precond(r_)
            rz_new = jnp.sum(r_ * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            return (x, r_, z + beta * p, rz_new), None

        (x, *_), _ = jax.lax.scan(cg_body, (x, r_, p, rz), None, length=n_cg)
        dx = mask_update(-x)
        V_new = sim3.retract(V, dx)
        _, _, F_new, _ = assemble(V_new)
        denom = jnp.sum(dx * (lam * dx - g)) + 1e-12
        rho = (F - F_new) / denom
        ok = (rho > 0) & jnp.isfinite(F_new)
        V = jax.tree.map(lambda a, b: jnp.where(ok, a, b), V_new, V)
        F = jnp.where(ok, F_new, F)
        lam = jnp.where(ok, lam * jnp.maximum(1 / 3, 1 - (2 * rho - 1) ** 3), lam * ni)
        ni = jnp.where(ok, 2.0, ni * 2.0)
        return (V, lam, ni, F), None

    _, _, F0, _ = assemble(prob.vertices)
    # g2o lambda init 1e-16 (Optimizer.cpp:812): effectively pure GN
    init = (prob.vertices, jnp.float32(1e-16), jnp.float32(2.0), F0)
    (V, _, _, F), _ = jax.lax.scan(lm_step, init, None, length=n_iters)
    return V, F


optimize_essential_graph_jit = jax.jit(
    optimize_essential_graph, static_argnames=("n_iters", "n_cg", "fix_scale")
)
