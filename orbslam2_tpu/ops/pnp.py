"""Hypothesis-parallel EPnP + RANSAC for relocalization.

Replaces the reference's sequential EPnP RANSAC (src/PnPsolver.cpp —
Eigen rewrite of Lepetit's EPnP, iterated 4-point hypotheses inside an
adaptive RANSAC loop at Tracking.cpp:1239-1334) with the batched design of
SURVEY.md §2.3 P4: ALL hypotheses are sampled, solved and scored at once —
control-point PCA, the 12x12 nullspace, the three beta-approximation
cases (L_6x10 subsystems), beta Gauss-Newton refinement and Horn pose
recovery are each a vmapped closed-form pipeline, and inlier scoring is
one [B, N] masked reduction.

Works in normalized image coordinates ((u-cx)/fx), which sets fu=fv=1,
uc=vc=0 in the M matrix.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision="highest")

# control-point difference pairs and the L-matrix column order
_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
# columns of L map to quadratic monomials:
# [b11, b12, b22, b13, b23, b33, b14, b24, b34, b44]
_MONO = (
    (0, 0), (0, 1), (1, 1), (0, 2), (1, 2), (2, 2), (0, 3), (1, 3), (2, 3), (3, 3)
)


def _choose_control_points(pw, w):
    """Weighted centroid + PCA axes (reference PnPsolver.cpp:296-321)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(pw * w[:, None], axis=0) / wsum
    M = (pw - c0) * jnp.sqrt(w)[:, None]
    cov = _einsum("ni,nj->ij", M, M) / wsum
    lam, V = jnp.linalg.eigh(cov)  # ascending
    lam = jnp.maximum(lam, 1e-12)
    # use descending order like the reference (largest axis first)
    axes = V[:, ::-1] * jnp.sqrt(lam[::-1])[None, :]
    cws = jnp.concatenate([c0[None], c0[None] + axes.T], axis=0)  # [4,3]
    return cws


def _barycentric(pw, cws):
    """alphas [n,4] with sum 1 (reference compute_barycentric_coordinates)."""
    CC = (cws[1:] - cws[0]).T  # [3,3]
    CCinv = jnp.linalg.inv(CC + 1e-12 * jnp.eye(3))
    a123 = _einsum("ij,nj->ni", CCinv, pw - cws[0])
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)


def _nullspace(alphas, obs, w):
    """4 smallest eigenvectors of M^T M, reshaped to [4, 4, 3] control
    points per basis vector."""
    n = alphas.shape[0]
    u = obs[:, 0]
    v = obs[:, 1]
    # rows [2n, 12]: for each point, u-row and v-row
    zero = jnp.zeros_like(alphas)
    row_u = jnp.stack([alphas, zero, -alphas * u[:, None]], axis=-1).reshape(n, 12)
    row_v = jnp.stack([zero, alphas, -alphas * v[:, None]], axis=-1).reshape(n, 12)
    M = jnp.concatenate([row_u * jnp.sqrt(w)[:, None], row_v * jnp.sqrt(w)[:, None]])
    MtM = _einsum("ni,nj->ij", M, M)
    _, V = jnp.linalg.eigh(MtM)  # ascending eigenvalues
    vs = V[:, :4].T.reshape(4, 4, 3)  # 4 basis vectors x 4 control points
    return vs


def _l6x10_rho(vs, cws):
    dv = jnp.stack(
        [jnp.stack([vs[a, i] - vs[a, j] for (i, j) in _PAIRS]) for a in range(4)]
    )  # [4, 6, 3]
    L = []
    for (a, b) in _MONO:
        term = jnp.sum(dv[a] * dv[b], axis=-1)
        L.append(jnp.where(a == b, term, 2.0 * term))
    L = jnp.stack(L, axis=-1)  # [6,10]
    rho = jnp.stack(
        [jnp.sum((cws[i] - cws[j]) ** 2) for (i, j) in _PAIRS]
    )  # [6]
    return L, rho


def _lstsq(A, b):
    AtA = _einsum("ni,nj->ij", A, A) + 1e-9 * jnp.eye(A.shape[1])
    Atb = _einsum("ni,n->i", A, b)
    return jnp.linalg.solve(AtA, Atb)


def _betas_approx(L, rho):
    """The reference's three initializations (PnPsolver.cpp:520-647),
    stacked: returns [3,4] beta candidates."""
    # case 1: columns [b11, b12, b13, b14]
    x1 = _lstsq(L[:, jnp.array([0, 1, 3, 6])], rho)
    b1 = jnp.sqrt(jnp.abs(x1[0]))
    s1 = jnp.where(x1[0] < 0, -1.0, 1.0)
    beta1 = jnp.stack([b1, s1 * x1[1] / jnp.maximum(b1, 1e-9),
                       s1 * x1[2] / jnp.maximum(b1, 1e-9),
                       s1 * x1[3] / jnp.maximum(b1, 1e-9)])
    # case 2: columns [b11, b12, b22]
    x2 = _lstsq(L[:, jnp.array([0, 1, 2])], rho)
    b21 = jnp.sqrt(jnp.abs(x2[0]))
    b22 = jnp.sqrt(jnp.abs(x2[2]))
    b22 = jnp.where(x2[1] < 0, -b22, b22)
    beta2 = jnp.stack([b21, b22, jnp.zeros(()), jnp.zeros(())])
    # case 3: columns [b11, b12, b22, b13, b23]
    x3 = _lstsq(L[:, jnp.array([0, 1, 2, 3, 4])], rho)
    b31 = jnp.sqrt(jnp.abs(x3[0]))
    b32 = jnp.sqrt(jnp.abs(x3[2]))
    b32 = jnp.where(x3[1] < 0, -b32, b32)
    b33 = x3[3] / jnp.maximum(b31, 1e-9)
    beta3 = jnp.stack([b31, b32, b33, jnp.zeros(())])
    return jnp.stack([beta1, beta2, beta3])


def _gauss_newton_betas(L, rho, betas, n_iter: int = 5):
    """Refine betas on the L*b2 = rho system (PnPsolver.cpp:649-691)."""

    def residual_jac(b):
        mono = jnp.stack([b[a] * b[c] for (a, c) in _MONO])
        r = _einsum("ij,j->i", L, mono) - rho
        # d mono_k / d b_m
        J = []
        for (a, c) in _MONO:
            grad = jnp.zeros(4).at[a].add(b[c]).at[c].add(b[a])
            J.append(grad)
        Jm = jnp.stack(J)  # [10,4]
        return r, _einsum("ij,jk->ik", L, Jm)  # [6], [6,4]

    def step(b, _):
        r, J = residual_jac(b)
        dx = _lstsq(J, -r)
        return b + dx, None

    betas, _ = jax.lax.scan(step, betas, None, length=n_iter)
    return betas


def _pose_from_betas(betas, vs, alphas, pw, w):
    """Control points in camera frame -> Horn alignment -> (R, t)
    (reference compute_ccs/compute_pcs/estimate_R_and_t)."""
    ccs = _einsum("a,aij->ij", betas, vs)  # [4,3]
    pcs = _einsum("nj,jk->nk", alphas, ccs)  # [n,3]
    # cheirality: camera-frame depths should be positive
    sign = jnp.where(jnp.sum(jnp.where(w > 0, pcs[:, 2], 0.0)) < 0, -1.0, 1.0)
    pcs = pcs * sign

    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    pc0 = jnp.sum(pcs * w[:, None], axis=0) / wsum
    pw0 = jnp.sum(pw * w[:, None], axis=0) / wsum
    H = _einsum("ni,nj->ij", (pw - pw0) * w[:, None], pcs - pc0)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(_einsum("ij,jk->ik", Vt.T, U.T)))
    D = jnp.diag(jnp.stack([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    t = pc0 - R @ pw0
    return R, t


def _reproj_err2(R, t, pw, obs, w):
    pc = _einsum("ij,nj->ni", R, pw) + t
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    uv = pc[:, :2] / z[:, None]
    e2 = jnp.sum((uv - obs) ** 2, axis=-1)
    return jnp.sum(jnp.where(w > 0, e2, 0.0)) / jnp.maximum(jnp.sum(w), 1e-9)


def epnp_solve(pw, obs, w):
    """Weighted EPnP: pw [n,3] world pts, obs [n,2] normalized image coords,
    w [n] weights (0 = ignore). Returns (R [3,3], t [3])."""
    cws = _choose_control_points(pw, w)
    alphas = _barycentric(pw, cws)
    vs = _nullspace(alphas, obs, w)
    L, rho = _l6x10_rho(vs, cws)
    betas0 = _betas_approx(L, rho)
    betas = jax.vmap(lambda b: _gauss_newton_betas(L, rho, b))(betas0)  # [3,4]
    Rs, ts = jax.vmap(lambda b: _pose_from_betas(b, vs, alphas, pw, w))(betas)
    errs = jax.vmap(lambda R, t: _reproj_err2(R, t, pw, obs, w))(Rs, ts)
    best = jnp.argmin(errs)
    return Rs[best], ts[best], errs[best]


class PnPResult(NamedTuple):
    R: jax.Array  # [3,3]
    t: jax.Array  # [3]
    inliers: jax.Array  # [N] bool
    n_inliers: jax.Array


def pnp_ransac(
    key: jax.Array,
    pw: jax.Array,  # [N,3]
    obs: jax.Array,  # [N,2] normalized coords
    valid: jax.Array,  # [N]
    max_err2: jax.Array,  # [N] per-point chi2 gate in normalized units
    n_hyp: int = 256,
) -> PnPResult:
    """Hypothesis-parallel RANSAC: sample B 4-point sets, solve EPnP for
    each, score all points against all hypotheses, refine on the winner's
    inliers (reference iterate + Refine, PnPsolver.cpp:102-268)."""
    N = pw.shape[0]
    # sample indices proportional to validity: draw from valid set via
    # gumbel-top-k per hypothesis (no host round trip)
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, N)) + logits[None, :]
    _, idx = jax.lax.top_k(g, 4)  # [B,4]

    def solve_one(ix):
        w = jnp.any(jnp.arange(N)[None, :] == ix[:, None], axis=0).astype(jnp.float32) * valid  # one-hot union; scatters serialize on TPU
        return epnp_solve(pw, obs, w)

    Rs, ts, _ = jax.vmap(solve_one)(idx)

    # score all hypotheses x points
    pc = _einsum("bij,nj->bni", Rs, pw) + ts[:, None, :]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    uv = pc[..., :2] / z[..., None]
    e2 = jnp.sum((uv - obs[None]) ** 2, axis=-1)  # [B,N]
    inl = (e2 < max_err2[None, :]) & valid[None, :] & (z > 0)
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # refine on the best hypothesis's inliers
    w_ref = inl[best].astype(jnp.float32)
    R, t, _ = epnp_solve(pw, obs, w_ref)
    pc = _einsum("ij,nj->ni", R, pw) + t
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    uv = pc[:, :2] / z[:, None]
    e2 = jnp.sum((uv - obs) ** 2, axis=-1)
    inliers = (e2 < max_err2) & valid & (z > 0)
    # fall back to the raw best hypothesis if refinement degenerates
    better = jnp.sum(inliers) >= counts[best]
    R = jnp.where(better, R, Rs[best])
    t = jnp.where(better, t, ts[best])
    inliers = jnp.where(better, inliers, inl[best])
    return PnPResult(R=R, t=t, inliers=inliers, n_inliers=jnp.sum(inliers))
