"""Sim3 solving for loop closure: batched Horn RANSAC + Sim3 refinement.

Replaces the reference Sim3Solver (src/Sim3Solver.cpp — sequential
3-point RANSAC with Horn's quaternion closed form) and Optimizer::
OptimizeSim3 (src/Optimizer.cpp:1054-1249 — g2o LM on one Sim3 vertex
with paired forward/inverse projection edges):

  * `horn_sim3`: weighted Horn 1987 absolute orientation via the 4x4
    quaternion eigen-decomposition, batchable; scale closed-form or fixed
    to 1 (stereo, Sim3Solver.cpp:250).
  * `sim3_ransac`: all 3-point hypotheses solved and scored at once;
    inliers by symmetric reprojection (9.21*sigma2 gates).
  * `optimize_sim3`: LM on the 7-dof (or 6-dof with fixed scale) relative
    transform with Huber(th2=10) on both projection directions and the
    reference's prune-then-reoptimize schedule.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, sim3
from ..geometry.camera import Camera

_einsum = functools.partial(jnp.einsum, precision="highest")


def horn_sim3(P1: jax.Array, P2: jax.Array, w: jax.Array, fix_scale: bool):
    """Weighted Horn alignment: find (s, R, t) with  P1 ~ s*R @ P2 + t.

    P1, P2: [n,3] point sets (camera-frame 3D points), w: [n] weights.
    Mirrors Sim3Solver::ComputeSim3 (quaternion eigendecomposition of N).
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    O1 = jnp.sum(P1 * w[:, None], axis=0) / wsum
    O2 = jnp.sum(P2 * w[:, None], axis=0) / wsum
    Pr1 = (P1 - O1) * w[:, None]
    Pr2 = P2 - O2
    M = _einsum("ni,nj->ij", Pr2, Pr1)  # = Pr2^T' style as reference (3x3)

    N11 = M[0, 0] + M[1, 1] + M[2, 2]
    N12 = M[1, 2] - M[2, 1]
    N13 = M[2, 0] - M[0, 2]
    N14 = M[0, 1] - M[1, 0]
    N22 = M[0, 0] - M[1, 1] - M[2, 2]
    N23 = M[0, 1] + M[1, 0]
    N24 = M[2, 0] + M[0, 2]
    N33 = -M[0, 0] + M[1, 1] - M[2, 2]
    N34 = M[1, 2] + M[2, 1]
    N44 = -M[0, 0] - M[1, 1] + M[2, 2]
    N = jnp.array(
        [
            [N11, N12, N13, N14],
            [N12, N22, N23, N24],
            [N13, N23, N33, N34],
            [N14, N24, N34, N44],
        ]
    )
    _, V = jnp.linalg.eigh(N)
    q = V[:, 3]  # (w, x, y, z) — max eigenvalue eigenvector
    R = se3.from_quaternion(jnp.stack([q[1], q[2], q[3], q[0]]))

    if fix_scale:
        s = jnp.float32(1.0)
    else:
        # Horn symmetric scale: s = sqrt(sum|Pr1|^2 / sum|R Pr2|^2) — the
        # reference uses the asymmetric D/Sxx form; both agree at optimum.
        Pr1w = (P1 - O1)
        num = jnp.sum((Pr1w**2) * w[:, None])
        den = jnp.sum((Pr2**2) * w[:, None])
        s = jnp.sqrt(num / jnp.maximum(den, 1e-12))
    t = O1 - s * R @ O2
    return sim3.Sim3(R=R, t=t, s=s)


def _project(cam: Camera, p: jax.Array):
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    return jnp.stack(
        [cam.fx * p[..., 0] / z + cam.cx, cam.fy * p[..., 1] / z + cam.cy], -1
    ), z


class Sim3RansacResult(NamedTuple):
    S12: sim3.Sim3
    inliers: jax.Array
    n_inliers: jax.Array


def sim3_ransac(
    key: jax.Array,
    X1: jax.Array,  # [N,3] matched points in KF1 camera frame
    X2: jax.Array,  # [N,3] matched points in KF2 camera frame
    uv1: jax.Array,  # [N,2] observed pixels in image 1
    uv2: jax.Array,  # [N,2]
    max_err1: jax.Array,  # [N] 9.21*sigma2(oct1)
    max_err2: jax.Array,  # [N]
    valid: jax.Array,  # [N]
    cam: Camera,
    fix_scale: bool = True,
    n_hyp: int = 128,
) -> Sim3RansacResult:
    """All 3-point hypotheses at once (reference Sim3Solver::iterate)."""
    N = X1.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, N)) + logits[None, :]
    _, idx = jax.lax.top_k(g, 3)

    def solve_one(ix):
        w = jnp.any(jnp.arange(N)[None, :] == ix[:, None], axis=0).astype(jnp.float32) * valid  # one-hot union; scatters serialize on TPU
        return horn_sim3(X1, X2, w, fix_scale)

    S = jax.vmap(solve_one)(idx)  # batched Sim3 pytree

    def score(Sb):
        S21 = sim3.inverse(Sb)
        p2in1, z1 = _project(cam, sim3.apply(Sb, X2))
        p1in2, z2 = _project(cam, sim3.apply(S21, X1))
        e1 = jnp.sum((uv1 - p2in1) ** 2, axis=-1)
        e2 = jnp.sum((uv2 - p1in2) ** 2, axis=-1)
        inl = (e1 < max_err1) & (e2 < max_err2) & valid & (z1 > 0) & (z2 > 0)
        return inl

    inls = jax.vmap(score)(S)  # [B,N]
    counts = jnp.sum(inls, axis=-1)
    best = jnp.argmax(counts)
    S_best = jax.tree.map(lambda a: a[best], S)

    # refine on inliers
    w_ref = inls[best].astype(jnp.float32)
    S_ref = horn_sim3(X1, X2, w_ref, fix_scale)
    inl_ref = score(S_ref)
    better = jnp.sum(inl_ref) >= counts[best]
    S_out = jax.tree.map(
        lambda a, b: jnp.where(better, a, b), S_ref, S_best
    )
    inliers = jnp.where(better, inl_ref, inls[best])
    return Sim3RansacResult(S12=S_out, inliers=inliers, n_inliers=jnp.sum(inliers))


def optimize_sim3(
    S12: sim3.Sim3,
    X1: jax.Array,  # [N,3] points in KF1 camera frame (edges 2->1 project X2)
    X2: jax.Array,  # [N,3]
    uv1: jax.Array,
    uv2: jax.Array,
    inv_sigma2_1: jax.Array,
    inv_sigma2_2: jax.Array,
    valid: jax.Array,
    cam: Camera,
    th2: float = 10.0,
    fix_scale: bool = True,
    n_iters: int = 10,
):
    """LM on the relative Sim3 (reference Optimizer::OptimizeSim3): paired
    edges e12 = uv1 - proj(S12 X2), e21 = uv2 - proj(S12^-1 X1) with
    Huber(sqrt(th2)); prune chi2>th2 pairs, reoptimize, return inliers."""
    delta = jnp.sqrt(th2)

    def residuals(xi, active):
        S = sim3.retract(S12, xi)
        S21 = sim3.inverse(S)
        p2in1, z1 = _project(cam, sim3.apply(S, X2))
        p1in2, z2 = _project(cam, sim3.apply(S21, X1))
        r12 = (uv1 - p2in1) * jnp.sqrt(inv_sigma2_1)[:, None]
        r21 = (uv2 - p1in2) * jnp.sqrt(inv_sigma2_2)[:, None]
        r = jnp.concatenate([r12, r21], axis=0)  # [2N,2]
        act = jnp.concatenate([active, active])
        return r, act

    def chi2_pair(xi):
        r, _ = residuals(xi, valid)
        e = jnp.sum(r * r, axis=-1)
        n = X1.shape[0]
        return e[:n], e[n:]

    def lm(active, xi0, iters):
        def total(xi):
            r, act = residuals(xi, active)
            e2 = jnp.sum(r * r, axis=-1)
            rho = jnp.where(
                e2 > th2, 2.0 * delta * jnp.sqrt(jnp.maximum(e2, 1e-12)) - th2, e2
            )
            return jnp.sum(jnp.where(act, rho, 0.0))

        def system(xi):
            J = jax.jacfwd(lambda x: residuals(x, active)[0])(xi)  # [2N,2,7]
            r, act = residuals(xi, active)
            e2 = jnp.sum(r * r, axis=-1)
            w_h = jnp.where(
                e2 > th2, delta / jnp.sqrt(jnp.maximum(e2, 1e-12)), 1.0
            )
            w = jnp.where(act, w_h, 0.0)
            H = _einsum("nci,n,ncj->ij", J, w, J)
            g = _einsum("nci,n,nc->i", J, w, r)
            return H, g

        H0, _ = system(xi0)
        lam0 = 1e-5 * jnp.max(jnp.diag(H0)) + 1e-12

        def step(carry, _):
            xi, lam, ni, F = carry
            H, g = system(xi)
            if fix_scale:
                # lock the log-scale coordinate
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            dx = -jnp.linalg.solve(H + lam * jnp.eye(7), g)
            xi_new = xi + dx
            F_new = total(xi_new)
            rho = (F - F_new) / (jnp.dot(dx, lam * dx - g) + 1e-12)
            ok = (rho > 0) & jnp.isfinite(F_new)
            xi = jnp.where(ok, xi_new, xi)
            F = jnp.where(ok, F_new, F)
            lam = jnp.where(
                ok, lam * jnp.maximum(1 / 3, 1 - (2 * rho - 1) ** 3), lam * ni
            )
            ni = jnp.where(ok, 2.0, ni * 2.0)
            return (xi, lam, ni, F), None

        (xi, *_), _ = jax.lax.scan(
            step, (xi0, lam0, jnp.float32(2.0), total(xi0)), None, length=iters
        )
        return xi

    xi = jnp.zeros(7)
    xi = lm(valid, xi, 5)
    e12, e21 = chi2_pair(xi)
    keep = valid & (e12 <= th2) & (e21 <= th2)
    xi = lm(keep, xi, n_iters)
    e12, e21 = chi2_pair(xi)
    inlier = keep & (e12 <= th2) & (e21 <= th2)
    return sim3.retract(S12, xi), inlier, jnp.sum(inlier)
