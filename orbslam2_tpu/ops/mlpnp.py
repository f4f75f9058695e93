"""MLPnP: maximum-likelihood PnP over bearing vectors, batched.

Covers the reference's MLPnPsolver (src/MLPnPsolver.cpp, imported from
ORB-SLAM3 but commented out of the build and the relocalization path —
SURVEY.md dormant components; BASELINE config 4 asks for this path).

Method (Urban et al. 2016): each observation is a unit bearing vector v
with a 2D nullspace basis (r, s); the ML residual of a pose is the
projection of the transformed point direction onto that nullspace. The
linear stage solves the 12-dof [R|t] system A x = 0 built from nullspace
rows; R is projected to SO(3) via SVD; Gauss-Newton then refines the
6-dof pose on the nullspace residuals (reference gauss_newton,
MLPnPsolver.cpp:659-723). All stages vmappable for hypothesis-parallel
RANSAC.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3

_einsum = functools.partial(jnp.einsum, precision="highest")


def bearings_from_pixels(uv: jax.Array, fx, fy, cx, cy) -> jax.Array:
    """Pixels [N,2] -> unit bearing vectors [N,3]."""
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    v = jnp.stack([x, y, jnp.ones_like(x)], -1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def nullspace_basis(v: jax.Array):
    """Orthonormal (r, s) spanning the nullspace of each bearing [N,3].
    (reference MLPnPsolver computes the same via householder steps)."""
    # pick the axis least aligned with v to build a stable basis
    a = jnp.where(
        (jnp.abs(v[:, 0:1]) < 0.9), jnp.array([[1.0, 0.0, 0.0]]), jnp.array([[0.0, 1.0, 0.0]])
    )
    r = jnp.cross(v, a)
    r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    s = jnp.cross(v, r)
    s = s / jnp.linalg.norm(s, axis=-1, keepdims=True)
    return r, s


def _linear_stage(pw, r, s, w):
    """Solve A x = 0 for x = [r11..r33 | t] (12), weighted rows."""
    # row for basis b: b^T (R pw + t) = 0  ->  kron terms
    def rows(b):
        return jnp.concatenate(
            [
                b[:, 0:1] * pw, b[:, 1:2] * pw, b[:, 2:3] * pw,  # R rows
                b,  # t
            ],
            axis=-1,
        )  # [N,12]

    A = jnp.concatenate([rows(r) * w[:, None], rows(s) * w[:, None]], axis=0)
    AtA = _einsum("ni,nj->ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    x = V[:, 0]

    def project(sign):
        R_raw = sign * x[:9].reshape(3, 3)
        t_raw = sign * x[9:]
        U, S, Vt = jnp.linalg.svd(R_raw)
        det = jnp.linalg.det(U @ Vt)
        D = jnp.diag(jnp.stack([1.0, 1.0, det]))
        R = U @ D @ Vt
        scale = 3.0 / jnp.maximum(jnp.sum(S), 1e-12)  # undo DLT scaling
        return R, t_raw * scale

    # the nullspace sign is arbitrary and -R_raw projects to a DIFFERENT
    # rotation (det constraint), so both signs are genuine candidates
    Rp, tp = project(1.0)
    Rm, tm = project(-1.0)
    return jnp.stack([Rp, Rm]), jnp.stack([tp, tm])


def _residuals(T, pw, r, s, w):
    pc = se3.transform(T, pw)
    u = pc / jnp.maximum(jnp.linalg.norm(pc, axis=-1, keepdims=True), 1e-12)
    e = jnp.stack([jnp.sum(r * u, -1), jnp.sum(s * u, -1)], -1)  # [N,2]
    return e * w[:, None]


def _gauss_newton(T0, pw, r, s, w, n_iter: int = 6):
    def step(T, _):
        def res(xi):
            return _residuals(se3.retract(T, xi), pw, r, s, w).ravel()

        z = jnp.zeros(6)
        e = res(z)
        J = jax.jacfwd(res)(z)
        H = _einsum("ni,nj->ij", J, J) + 1e-9 * jnp.eye(6)
        g = _einsum("ni,n->i", J, e)
        dx = -jnp.linalg.solve(H, g)
        return se3.retract(T, dx), None

    T, _ = jax.lax.scan(step, T0, None, length=n_iter)
    return T


def mlpnp_solve(pw, bearings, w, n_gn: int = 6):
    """Weighted MLPnP. Returns Tcw [4,4]."""
    r, s = nullspace_basis(bearings)
    Rs, ts = _linear_stage(pw, r, s, w)
    # 4 candidates: {x, -x} projections x {t, -t} cheirality
    cand = jnp.stack(
        [
            se3.from_Rt(Rs[0], ts[0]),
            se3.from_Rt(Rs[0], -ts[0]),
            se3.from_Rt(Rs[1], ts[1]),
            se3.from_Rt(Rs[1], -ts[1]),
        ]
    )

    def goodness(T):
        pc = se3.transform(T, pw)
        u = pc / jnp.maximum(jnp.linalg.norm(pc, axis=-1, keepdims=True), 1e-12)
        align = jnp.sum(jnp.sum(u * bearings, -1) * w)  # bearing agreement
        front = jnp.sum(jnp.where(w > 0, (pc[:, 2] > 0).astype(jnp.float32), 0.0))
        return front * 10.0 + align

    scores = jax.vmap(goodness)(cand)
    T0 = cand[jnp.argmax(scores)]
    T = _gauss_newton(T0, pw, r, s, w, n_gn)
    return T


class MLPnPResult(NamedTuple):
    Tcw: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array


def mlpnp_ransac(
    key: jax.Array,
    pw: jax.Array,  # [N,3]
    bearings: jax.Array,  # [N,3]
    valid: jax.Array,  # [N]
    cos_thresh: jax.Array,  # [N] min cos(angle) between bearing and prediction
    n_hyp: int = 128,
) -> MLPnPResult:
    """Hypothesis-parallel RANSAC with 6-point minimal sets (reference
    MLPnPsolver RANSAC wrapper, MLPnPsolver.cpp:56-183)."""
    N = pw.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, N)) + logits[None]
    _, idx = jax.lax.top_k(g, 6)

    def solve_one(ix):
        w = jnp.any(jnp.arange(N)[None, :] == ix[:, None], axis=0).astype(jnp.float32) * valid  # one-hot union; scatters serialize on TPU
        return mlpnp_solve(pw, bearings, w, n_gn=4)

    Ts = jax.vmap(solve_one)(idx)

    def score(T):
        pc = se3.transform(T, pw)
        u = pc / jnp.maximum(jnp.linalg.norm(pc, axis=-1, keepdims=True), 1e-12)
        cos = jnp.sum(u * bearings, -1)
        return (cos > cos_thresh) & valid & (pc[:, 2] > 0)

    inls = jax.vmap(score)(Ts)
    counts = jnp.sum(inls, -1)
    best = jnp.argmax(counts)

    w_ref = inls[best].astype(jnp.float32)
    T = mlpnp_solve(pw, bearings, w_ref)
    inl = score(T)
    better = jnp.sum(inl) >= counts[best]
    T = jnp.where(better, T, Ts[best])
    inl = jnp.where(better, inl, inls[best])
    return MLPnPResult(Tcw=T, inliers=inl, n_inliers=jnp.sum(inl))
