"""Motion-only pose optimization: batched Levenberg-Marquardt on SE(3).

Replaces Optimizer::PoseOptimization (reference src/Optimizer.cpp:205-424),
which runs g2o LM over unary mono/stereo projection edges with a 4-round
chi-square inlier reclassification schedule. Here the whole procedure is
one `lax.scan` program:

  * all N edges evaluated in batch (residual + analytic Jacobian),
  * the 6x6 normal system assembled with two einsums,
  * LM accept/reject with g2o's lambda heuristics
    (tau=1e-5 init, rho-based update),
  * 4 rounds x 10 iterations; every round RESTARTS from the initial pose
    (faithful to the reference, which calls setEstimate(mTcw) per round)
    keeping only the inlier reclassification; Huber kernel active in
    rounds 0-2 and dropped for the final round
    (reference src/Optimizer.cpp:348-425).

Mono edges are expressed as stereo edges whose third residual component
is masked out, so one kernel covers both edge types.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
DELTA_MONO = 2.447864292  # sqrt(5.991)
DELTA_STEREO = 2.795531836  # sqrt(7.815)

_einsum = functools.partial(jnp.einsum, precision="highest")


class PoseOptResult(NamedTuple):
    Tcw: jax.Array  # [4,4] optimized pose
    inlier: jax.Array  # [N] bool (valid and not chi2-outlier)
    n_inliers: jax.Array  # scalar int32


def _residual_jacobian(Tcw, pw, obs, is_stereo, cam: Camera):
    """Batched residual r = obs - h(Tcw @ pw) and J = dr/dxi ([N,3], [N,3,6]).

    Stereo measurement h = (u, v, u - bf/z); mono edges use component mask
    (1,1,0). Jacobian via the standard chain: dpc/dxi = [-[pc]x | I] with
    xi = (omega, upsilon), matching g2o's VertexSE3Expmap oplus.
    """
    pc = se3.transform(Tcw, pw)  # [N,3]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    pred = jnp.stack([u, v, ur], axis=-1)
    r = obs - pred

    # dh/dpc rows: [3, 3] per edge
    zero = jnp.zeros_like(x)
    dh = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], -1),
            jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], -1),
            jnp.stack(
                [cam.fx * inv_z, zero, (-cam.fx * x + cam.bf) * inv_z2], -1
            ),
        ],
        axis=-2,
    )  # [N,3,3]

    # dpc/dxi = [-hat(pc) | I]  -> [N,3,6]
    hat_pc = se3.hat(pc)
    dpc = jnp.concatenate(
        [-hat_pc, jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), hat_pc.shape)],
        axis=-1,
    )
    J = -_einsum("nij,njk->nik", dh, dpc)  # dr/dxi = -dh/dxi

    comp_mask = jnp.stack(
        [jnp.ones_like(x), jnp.ones_like(x), is_stereo.astype(pc.dtype)], -1
    )
    depth_ok = z > 0.0
    return r, J, comp_mask, depth_ok


def _chi2(r, comp_mask, inv_sigma2):
    """Unrobustified per-edge chi2 = r^T Omega r with Omega = invSigma2*I."""
    return jnp.sum(r * r * comp_mask, axis=-1) * inv_sigma2


def _solve6(A, b):
    """Unrolled 6x6 Cholesky solve (A SPD). jnp.linalg.solve lowers to a
    general LU custom call whose fixed cost dwarfs the 6x6 math on TPU —
    the fused frame step runs 80 of these per frame (r5 profile: the
    fused step's device time was ~10x the frontend's). A static scalar
    DAG fuses into the surrounding LM iteration instead."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        s = A[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-20))
        for j in range(i + 1, 6):
            s = A[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s / L[i][i]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _lm_optimize(T0, pw, obs, inv_sigma2, is_stereo, active, cam, use_huber, n_iters):
    """n_iters LM iterations from T0 over `active` edges. Returns T.

    One residual+Jacobian evaluation per iteration: the normal system at
    the accepted pose is carried forward instead of recomputed (H and g
    depend only on T, so re-evaluating them at an unchanged T — what the
    two-pass version did — is identical math at twice the device time)."""
    delta = jnp.where(is_stereo, DELTA_STEREO, DELTA_MONO)
    delta2 = delta * delta

    def eval_all(T):
        """(F, H, g) at T in ONE batched pass."""
        r, J, cm, depth_ok = _residual_jacobian(T, pw, obs, is_stereo, cam)
        e2 = _chi2(r, cm, inv_sigma2)
        rho = jnp.where(
            use_huber & (e2 > delta2),
            2.0 * delta * jnp.sqrt(jnp.maximum(e2, 1e-12)) - delta2,
            e2,
        )
        w_act = active & depth_ok
        F = jnp.sum(jnp.where(w_act, rho, 0.0))
        w_huber = jnp.where(
            use_huber & (e2 > delta2),
            delta / jnp.sqrt(jnp.maximum(e2, 1e-12)),
            1.0,
        )
        w_edge = jnp.where(w_act, w_huber * inv_sigma2, 0.0)
        W = w_edge[:, None] * cm  # [N,3] per-component weights
        H = _einsum("nci,nc,ncj->ij", J, W, J)
        g = _einsum("nci,nc->i", J, W * r)  # gradient direction J^T W r
        return F, H, g

    F0, H0, g0 = eval_all(T0)
    lam0 = 1e-5 * jnp.max(jnp.diagonal(H0))

    def step(carry, _):
        T, lam, ni, F, H, g = carry
        A = H + lam * jnp.eye(6, dtype=H.dtype)
        dx = -_solve6(A, g)
        T_new = se3.retract(T, dx)
        F_new, H_new, g_new = eval_all(T_new)
        # g2o rho denominator: dx^T (lam*dx + b), b = -g
        denom = jnp.dot(dx, lam * dx - g) + 1e-12
        rho = (F - F_new) / denom
        ok = (rho > 0.0) & jnp.isfinite(F_new)
        lam_up = lam * ni
        lam_down = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        T = jnp.where(ok, T_new, T)
        F = jnp.where(ok, F_new, F)
        H = jnp.where(ok, H_new, H)
        g = jnp.where(ok, g_new, g)
        lam = jnp.where(ok, lam_down, lam_up)
        ni = jnp.where(ok, 2.0, ni * 2.0)
        return (T, lam, ni, F, H, g), None

    (T, _, _, _, _, _), _ = jax.lax.scan(
        step, (T0, lam0, jnp.float32(2.0), F0, H0, g0), None,
        length=n_iters, unroll=n_iters,
    )
    return T


def pose_optimize(
    T0: jax.Array,
    pw: jax.Array,  # [N,3] world points
    obs: jax.Array,  # [N,3] (u, v, uR); uR ignored for mono edges
    inv_sigma2: jax.Array,  # [N]
    is_stereo: jax.Array,  # [N] bool
    valid: jax.Array,  # [N] bool — edge exists
    cam: Camera,
    n_rounds: int = 4,
    n_iters: int = 10,
) -> PoseOptResult:
    """Full 4-round schedule. Call under jit."""
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    def round_body(carry, round_idx):
        _, outlier = carry
        active = valid & ~outlier
        use_huber = round_idx < (n_rounds - 1)
        T_opt = _lm_optimize(
            T0, pw, obs, inv_sigma2, is_stereo, active, cam, use_huber, n_iters
        )
        r, _, cm, depth_ok = _residual_jacobian(T_opt, pw, obs, is_stereo, cam)
        e2 = _chi2(r, cm, inv_sigma2)
        outlier = valid & ((e2 > chi2_th) | ~depth_ok)
        return (T_opt, outlier), None

    init = (T0, jnp.zeros(valid.shape, bool))
    (T_final, outlier), _ = jax.lax.scan(
        round_body, init, jnp.arange(n_rounds), unroll=n_rounds
    )
    inlier = valid & ~outlier
    return PoseOptResult(
        Tcw=T_final, inlier=inlier, n_inliers=jnp.sum(inlier).astype(jnp.int32)
    )
