"""Monocular map initialization: parallel homography/fundamental RANSAC.

Re-implements the reference Initializer (src/Initializer.cc, kept in the
tree but excluded from the stereo build — SURVEY.md marks the monocular
path as a capability to cover): two models are scored in parallel over
batched 8-point hypotheses —

  * H21 by normalized DLT, scored with symmetric transfer error
    (chi2 5.991 both directions),
  * F21 by the normalized 8-point algorithm, scored with epipolar
    distances (chi2 3.84, score cap 5.991),

then the reference's model-selection ratio RH = SH/(SH+SF) > 0.40 picks
homography vs fundamental, motion is recovered (Faugeras decomposition
for H; the four-way E decomposition for F) by cheirality + parallax
voting, and the initial map is triangulated.

Everything is hypothesis-parallel: one vmapped solve + one [B,N] scoring
pass per model (reference runs 200 sequential RANSAC iterations in two
threads, Initializer.cc:60-100).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, triangulation
from ..geometry.camera import Camera

_einsum = functools.partial(jnp.einsum, precision="highest")

CHI2_H = 5.991
CHI2_F = 3.84
SCORE_CAP = 5.991


def _normalize_points(uv, w):
    """Hartley normalization with weights: returns (normalized uv, T [3,3])."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(uv * w[:, None], axis=0) / wsum
    d = uv - mean
    mean_dev = jnp.sum(jnp.abs(d) * w[:, None], axis=0) / wsum
    s = 1.0 / jnp.maximum(mean_dev, 1e-9)
    uv_n = d * s[None, :]
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return uv_n, T


def _solve_h(uv1, uv2, w):
    """Weighted DLT homography x2 ~ H x1 (reference ComputeH21)."""
    n1, T1 = _normalize_points(uv1, w)
    n2, T2 = _normalize_points(uv2, w)
    u1, v1 = n1[:, 0], n1[:, 1]
    u2, v2 = n2[:, 0], n2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], -1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    AtA = _einsum("ni,nj->ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    Hn = V[:, 0].reshape(3, 3)
    H = jnp.linalg.solve(T2, Hn @ T1)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def _solve_f(uv1, uv2, w):
    """Weighted normalized 8-point fundamental (reference ComputeF21)."""
    n1, T1 = _normalize_points(uv1, w)
    n2, T2 = _normalize_points(uv2, w)
    u1, v1 = n1[:, 0], n1[:, 1]
    u2, v2 = n2[:, 0], n2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], -1
    ) * w[:, None]
    AtA = _einsum("ni,nj->ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    Fn = V[:, 0].reshape(3, 3)
    # enforce rank 2
    U, S, Vt = jnp.linalg.svd(Fn)
    Fn = (U * jnp.stack([S[0], S[1], jnp.zeros(())])[None, :]) @ Vt
    return T2.T @ Fn @ T1


def _score_h(H, uv1, uv2, valid, sigma2: float = 1.0):
    """Symmetric transfer error scoring (reference CheckHomography)."""
    Hinv = jnp.linalg.inv(H)

    def transfer(M, a):
        ah = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], -1)
        b = ah @ M.T
        return b[:, :2] / jnp.where(jnp.abs(b[:, 2:3]) < 1e-12, 1e-12, b[:, 2:3])

    e12 = jnp.sum((uv1 - transfer(Hinv, uv2)) ** 2, -1) / sigma2
    e21 = jnp.sum((uv2 - transfer(H, uv1)) ** 2, -1) / sigma2
    ok = (e12 < CHI2_H) & (e21 < CHI2_H) & valid
    score = jnp.where(
        valid & (e12 < CHI2_H), CHI2_H - e12, 0.0
    ) + jnp.where(valid & (e21 < CHI2_H), CHI2_H - e21, 0.0)
    return jnp.sum(score), ok


def _score_f(F, uv1, uv2, valid, sigma2: float = 1.0):
    """Epipolar distance scoring (reference CheckFundamental)."""
    oh = lambda a: jnp.concatenate([a, jnp.ones((a.shape[0], 1))], -1)
    l2 = oh(uv1) @ F.T  # epipolar lines in image 2
    l1 = oh(uv2) @ F  # lines in image 1
    d2 = (jnp.sum(oh(uv2) * l2, -1) ** 2) / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12
    ) / sigma2
    d1 = (jnp.sum(oh(uv1) * l1, -1) ** 2) / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12
    ) / sigma2
    ok = (d1 < CHI2_F) & (d2 < CHI2_F) & valid
    score = jnp.where(valid & (d2 < CHI2_F), SCORE_CAP - d2, 0.0) + jnp.where(
        valid & (d1 < CHI2_F), SCORE_CAP - d1, 0.0
    )
    return jnp.sum(score), ok


class InitResult(NamedTuple):
    success: jax.Array  # bool
    used_homography: jax.Array  # bool
    T21: jax.Array  # [4,4] pose of frame 2 wrt frame 1 (Tcw with frame1=world)
    points: jax.Array  # [N,3] triangulated (in frame-1 coords)
    point_ok: jax.Array  # [N] triangulation validity
    inliers: jax.Array  # [N] model inliers


def _candidate_poses_from_f(F, cam: Camera):
    """E = K^T F K -> 4 (R, t) candidates (reference DecomposeE)."""
    K = cam.K()
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = U @ W.T @ Vt
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _candidate_poses_from_h(H, cam: Camera):
    """Faugeras SVD decomposition of a calibrated homography -> 8 candidates
    (reference ReconstructH, Faugeras et al. 1988)."""
    K = cam.K()
    A = jnp.linalg.solve(K, H @ K)
    U, S, Vt = jnp.linalg.svd(A)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)

    d2s = jnp.maximum(d2, 1e-9)
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2), 0.0) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3), 0.0) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = +d2
    sin_t = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        # stheta carries the sign of x1*x3 (Faugeras case d' = +d2)
        stheta = x1s[i] * x3s[i] / jnp.maximum(jnp.abs(x1s[i] * x3s[i]), 1e-30) * sin_t
        Rp = jnp.stack(
            [
                jnp.stack([cos_t, jnp.zeros(()), -stheta]),
                jnp.stack([jnp.zeros(()), jnp.ones(()), jnp.zeros(())]),
                jnp.stack([stheta, jnp.zeros(()), cos_t]),
            ]
        )
        tp = jnp.stack([x1s[i], jnp.zeros(()), -x3s[i]]) * (d1 - d3)
        R = s * U @ Rp @ Vt
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # case d' = -d2
    sin_p = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        sphi = x1s[i] * x3s[i] / jnp.maximum(jnp.abs(x1s[i] * x3s[i]), 1e-30) * sin_p
        Rp = jnp.stack(
            [
                jnp.stack([cos_p, jnp.zeros(()), sphi]),
                jnp.stack([jnp.zeros(()), -jnp.ones(()), jnp.zeros(())]),
                jnp.stack([sphi, jnp.zeros(()), -cos_p]),
            ]
        )
        tp = jnp.stack([x1s[i], jnp.zeros(()), x3s[i]]) * (d1 + d3)
        R = s * U @ Rp @ Vt
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


def _check_rt(R, t, uv1, uv2, inliers, cam: Camera, sigma2: float = 1.0):
    """Triangulate under (R, t) and count points with positive depth in both
    views, sufficient parallax and low reprojection error
    (reference CheckRT)."""
    N = uv1.shape[0]
    xn1 = jnp.stack([(uv1[:, 0] - cam.cx) / cam.fx, (uv1[:, 1] - cam.cy) / cam.fy], -1)
    xn2 = jnp.stack([(uv2[:, 0] - cam.cx) / cam.fx, (uv2[:, 1] - cam.cy) / cam.fy], -1)
    P1 = jnp.broadcast_to(jnp.eye(4)[:3], (N, 3, 4))
    T2 = se3.from_Rt(R, t)
    P2 = jnp.broadcast_to(T2[:3], (N, 3, 4))
    X, ok = triangulation.triangulate_dlt(P1, P2, xn1, xn2)
    z1 = X[:, 2]
    Xc2 = se3.transform(T2, X)
    z2 = Xc2[:, 2]
    O2 = -R.T @ t
    par = triangulation.rays_parallax_cos(jnp.zeros(3), O2, X)
    # reprojection errors
    u1 = cam.fx * X[:, 0] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1) + cam.cx
    v1 = cam.fy * X[:, 1] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1) + cam.cy
    e1 = (u1 - uv1[:, 0]) ** 2 + (v1 - uv1[:, 1]) ** 2
    u2 = cam.fx * Xc2[:, 0] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2) + cam.cx
    v2 = cam.fy * Xc2[:, 1] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2) + cam.cy
    e2 = (u2 - uv2[:, 0]) ** 2 + (v2 - uv2[:, 1]) ** 2
    good = (
        inliers
        & ok
        & (z1 > 0)
        & (z2 > 0)
        & (par < 0.99998)
        & (e1 < 4.0 * sigma2)
        & (e2 < 4.0 * sigma2)
    )
    # parallax of the good set: 50th-best cos (reference takes a median-ish)
    par_masked = jnp.where(good, par, 1.0)
    par_sorted = jnp.sort(par_masked)
    idx = jnp.minimum(50, jnp.maximum(jnp.sum(good) - 1, 0))
    parallax_cos = par_sorted[idx]
    return jnp.sum(good), good, X, parallax_cos


def initialize_two_view(
    key: jax.Array,
    uv1: jax.Array,  # [N,2] matched keypoints in frame 1
    uv2: jax.Array,  # [N,2] corresponding keypoints in frame 2
    valid: jax.Array,  # [N]
    cam: Camera,
    n_hyp: int = 200,
    min_parallax_cos: float = 0.99996,  # ~0.5 deg (reference minParallax=1.0)
    min_triangulated: int = 50,
) -> InitResult:
    """Full two-view initialization. Call under jit."""
    N = uv1.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, N)) + logits[None]
    _, idx = jax.lax.top_k(g, 8)

    def one_h(ix):
        w = jnp.any(jnp.arange(N)[None, :] == ix[:, None], axis=0).astype(jnp.float32) * valid  # one-hot union; scatters serialize on TPU
        H = _solve_h(uv1, uv2, w)
        s, ok = _score_h(H, uv1, uv2, valid)
        return H, s, ok

    def one_f(ix):
        w = jnp.any(jnp.arange(N)[None, :] == ix[:, None], axis=0).astype(jnp.float32) * valid  # one-hot union; scatters serialize on TPU
        F = _solve_f(uv1, uv2, w)
        s, ok = _score_f(F, uv1, uv2, valid)
        return F, s, ok

    Hs, sh, okh = jax.vmap(one_h)(idx)
    Fs, sf_, okf = jax.vmap(one_f)(idx)
    bh = jnp.argmax(sh)
    bf = jnp.argmax(sf_)
    SH, SF = sh[bh], sf_[bf]
    H, inl_h = Hs[bh], okh[bh]
    F, inl_f = Fs[bf], okf[bf]

    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = rh > 0.40  # reference Initializer.cc model selection

    Rs_h, ts_h = _candidate_poses_from_h(H, cam)
    Rs_f, ts_f = _candidate_poses_from_f(F, cam)
    # pad F's 4 candidates to 8 so both branches share one vmapped check
    Rs_f8 = jnp.concatenate([Rs_f, Rs_f], axis=0)
    ts_f8 = jnp.concatenate([ts_f, ts_f], axis=0)
    Rs = jnp.where(use_h, Rs_h, Rs_f8)
    ts = jnp.where(use_h, ts_h, ts_f8)
    inliers = jnp.where(use_h, inl_h, inl_f)

    counts, goods, Xs, pars = jax.vmap(
        lambda R, t: _check_rt(R, t, uv1, uv2, inliers, cam)
    )(Rs, ts)
    # the F branch only has 4 real candidates (slots 4-7 are padding copies);
    # mask them so the distinctness test is not defeated by duplicates
    slot_ok = jnp.arange(8) < jnp.where(use_h, 8, 4)
    counts = jnp.where(slot_ok, counts, -1)
    best = jnp.argmax(counts)
    n_best = counts[best]
    # reference acceptance: clear winner + enough points + enough parallax
    second = jnp.sort(counts)[-2]
    distinct = second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32)
    has_parallax = pars[best] < min_parallax_cos

    success = distinct & (n_best >= min_triangulated) & has_parallax
    T21 = se3.from_Rt(Rs[best], ts[best])
    return InitResult(
        success=success,
        used_homography=use_h,
        T21=T21,
        points=Xs[best],
        point_ok=goods[best],
        inliers=inliers,
    )
