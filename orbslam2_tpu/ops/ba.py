"""Bundle adjustment: batched Levenberg-Marquardt with matrix-free PCG.

Replaces g2o's BlockSolver + LinearSolverEigen pipeline (reference
Thirdparty/g2o/g2o/core/block_solver.hpp — sparse Schur complement +
sparse Cholesky) with a TPU-native design:

  * all edges (camera<->point observations) evaluated in batch:
    residuals + analytic Jacobians wrt pose (6) and point (3);
  * the damped normal system (H + lambda*I) dx = -g is solved matrix-free
    by block-Jacobi preconditioned conjugate gradients — every H*v product
    is two gathers, a batched small matmul and two segment-sums, which is
    exactly the shape that shards across devices by splitting the edge
    list and psum-ing the reductions (parallel/dist_ba.py);
  * LM accept/reject with g2o's rho heuristics.

Used for LocalBundleAdjustment (reference src/Optimizer.cpp:426-787) and
GlobalBundleAdjustment (src/Optimizer.cpp:7-203): same kernel, different
edge sets. The reference's two-stage schedule (5 iters, outlier cut at
chi2 5.991/7.815, 10 more iters) is reproduced in `ba_solve`.
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
DELTA_MONO = 2.447864292
DELTA_STEREO = 2.795531836

_einsum = functools.partial(jnp.einsum, precision="highest")


class BAProblem(NamedTuple):
    poses: jax.Array  # [K,4,4] Tcw
    points: jax.Array  # [P,3]
    obs_kf: jax.Array  # [E] int32 camera index per edge
    obs_pt: jax.Array  # [E] int32 point index per edge
    obs: jax.Array  # [E,3] (u, v, uR)
    inv_sigma2: jax.Array  # [E]
    is_stereo: jax.Array  # [E] bool
    edge_valid: jax.Array  # [E] bool
    pose_fixed: jax.Array  # [K] bool


class BAResult(NamedTuple):
    poses: jax.Array
    points: jax.Array
    edge_inlier: jax.Array  # [E] bool (valid & passed final chi2)
    final_chi2: jax.Array  # scalar


def _edge_terms(poses, points, prob: BAProblem, cam: Camera):
    """Residual r [E,3], Jc [E,3,6], Jp [E,3,3], component mask [E,3],
    depth_ok [E]."""
    T = poses[prob.obs_kf]  # [E,4,4]
    pw = points[prob.obs_pt]  # [E,3]
    R = T[..., :3, :3]
    pc = _einsum("eij,ej->ei", R, pw) + T[..., :3, 3]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    pred = jnp.stack([u, v, ur], axis=-1)
    r = prob.obs - pred

    zero = jnp.zeros_like(x)
    dh = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], -1),
            jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], -1),
            jnp.stack([cam.fx * inv_z, zero, (-cam.fx * x + cam.bf) * inv_z2], -1),
        ],
        axis=-2,
    )  # [E,3,3] d pred / d pc

    hat_pc = se3.hat(pc)
    dpc_dxi = jnp.concatenate(
        [-hat_pc, jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), hat_pc.shape)],
        axis=-1,
    )  # [E,3,6]
    Jc = -_einsum("eij,ejk->eik", dh, dpc_dxi)
    Jp = -_einsum("eij,ejk->eik", dh, R)  # d pc/d pw = Rcw

    comp = jnp.stack(
        [jnp.ones_like(x), jnp.ones_like(x), prob.is_stereo.astype(x.dtype)], -1
    )
    return r, Jc, Jp, comp, z > 0.0


def _edge_weights(r, comp, prob: BAProblem, depth_ok, use_huber):
    """(w_lsq [E], chi2 [E], robust_rho [E]) with Huber; w folds invSigma2."""
    e2 = jnp.sum(r * r * comp, axis=-1) * prob.inv_sigma2
    delta = jnp.where(prob.is_stereo, DELTA_STEREO, DELTA_MONO)
    delta2 = delta * delta
    w_huber = jnp.where(
        use_huber & (e2 > delta2), delta / jnp.sqrt(jnp.maximum(e2, 1e-12)), 1.0
    )
    active = prob.edge_valid & depth_ok
    w = jnp.where(active, w_huber * prob.inv_sigma2, 0.0)
    rho = jnp.where(
        use_huber & (e2 > delta2),
        2.0 * delta * jnp.sqrt(jnp.maximum(e2, 1e-12)) - delta2,
        e2,
    )
    rho = jnp.where(active, rho, 0.0)
    return w, e2, rho


def _reduce(x, axis_name):
    """Cross-device reduction hook: under shard_map with edges sharded on
    `axis_name`, partial segment-sums become full sums via psum; single
    device (axis_name=None) is the identity. This one line is the whole
    distributed-BA communication pattern (north star: psum of reduced
    systems over ICI)."""
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _assemble(poses, points, prob, cam, use_huber, axis_name=None):
    """Gradient + diagonal blocks + total robust chi2."""
    K = prob.poses.shape[0]
    P = prob.points.shape[0]
    r, Jc, Jp, comp, depth_ok = _edge_terms(poses, points, prob, cam)
    w, _, rho = _edge_weights(r, comp, prob, depth_ok, use_huber)
    Wr = (w[:, None] * comp) * r  # [E,3]
    gc = jnp.zeros((K, 6)).at[prob.obs_kf].add(_einsum("eci,ec->ei", Jc, Wr))
    gp = jnp.zeros((P, 3)).at[prob.obs_pt].add(_einsum("eci,ec->ei", Jp, Wr))
    Wc = w[:, None] * comp
    Hcc = jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(
        _einsum("eci,ec,ecj->eij", Jc, Wc, Jc)
    )
    Hpp = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(
        _einsum("eci,ec,ecj->eij", Jp, Wc, Jp)
    )
    gc, gp, Hcc, Hpp = (_reduce(t, axis_name) for t in (gc, gp, Hcc, Hpp))
    return gc, gp, Hcc, Hpp, _reduce(jnp.sum(rho), axis_name)


def _hv_product(vc, vp, poses, points, prob, cam, w_comp, Jc, Jp, lam, axis_name=None):
    """(H + lam*I) @ v, matrix-free over edges."""
    a = _einsum("eci,ei->ec", Jc, vc[prob.obs_kf]) + _einsum(
        "eci,ei->ec", Jp, vp[prob.obs_pt]
    )
    Wa = w_comp * a
    K, P = vc.shape[0], vp.shape[0]
    Hc = jnp.zeros((K, 6)).at[prob.obs_kf].add(_einsum("eci,ec->ei", Jc, Wa))
    Hp = jnp.zeros((P, 3)).at[prob.obs_pt].add(_einsum("eci,ec->ei", Jp, Wa))
    return _reduce(Hc, axis_name) + lam * vc, _reduce(Hp, axis_name) + lam * vp


def _pcg_solve(prob, cam, poses, points, use_huber, lam, n_cg, axis_name=None):
    """Solve (H+lam I) dx = -g with block-Jacobi PCG. Returns (dxc, dxp, g)."""
    K = prob.poses.shape[0]
    r_, Jc, Jp, comp, depth_ok = _edge_terms(poses, points, prob, cam)
    w, _, _ = _edge_weights(r_, comp, prob, depth_ok, use_huber)
    w_comp = w[:, None] * comp
    gc, gp, Hcc, Hpp, _ = _assemble(poses, points, prob, cam, use_huber, axis_name)

    # freeze fixed poses: zero gradient rows
    free = ~prob.pose_fixed
    gc = gc * free[:, None]

    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    Mc = jnp.linalg.inv(Hcc + (lam + 1e-6) * eye6)  # [K,6,6]
    Mp = inv3x3(Hpp + (lam + 1e-6) * eye3)  # [P,3,3]

    def precond(rc, rp):
        pc_ = _einsum("kij,kj->ki", Mc, rc) * free[:, None]
        pp_ = _einsum("pij,pj->pi", Mp, rp)
        return pc_, pp_

    def hv(vc, vp):
        vc = vc * free[:, None]
        Hc, Hp = _hv_product(
            vc, vp, poses, points, prob, cam, w_comp, Jc, Jp, lam, axis_name
        )
        return Hc * free[:, None], Hp

    bc, bp = gc, gp  # we solve (H+lam) dx = g then negate (dx -> -dx)
    xc = jnp.zeros_like(bc)
    xp = jnp.zeros_like(bp)
    rc, rp = bc, bp
    zc, zp = precond(rc, rp)
    pc_, pp_ = zc, zp
    rz = jnp.sum(rc * zc) + jnp.sum(rp * zp)

    def body(carry, _):
        xc, xp, rc, rp, pc_, pp_, rz = carry
        Apc, App = hv(pc_, pp_)
        pAp = jnp.sum(pc_ * Apc) + jnp.sum(pp_ * App)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        xc = xc + alpha * pc_
        xp = xp + alpha * pp_
        rc = rc - alpha * Apc
        rp = rp - alpha * App
        zc, zp = precond(rc, rp)
        rz_new = jnp.sum(rc * zc) + jnp.sum(rp * zp)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        pc2 = zc + beta * pc_
        pp2 = zp + beta * pp_
        return (xc, xp, rc, rp, pc2, pp2, rz_new), None

    (xc, xp, *_), _ = jax.lax.scan(
        body, (xc, xp, rc, rp, pc_, pp_, rz), None, length=n_cg
    )
    return -xc, -xp, (gc, gp)


def _lm_run(prob, cam, poses, points, use_huber, n_iters, n_cg, axis_name=None):
    gc, gp, Hcc, Hpp, F0 = _assemble(poses, points, prob, cam, use_huber, axis_name)
    diag_max = jnp.maximum(
        jnp.max(jax.vmap(jnp.diag)(Hcc)), jnp.max(jax.vmap(jnp.diag)(Hpp))
    )
    lam0 = 1e-5 * diag_max

    def total(poses_, points_):
        *_, F = _assemble(poses_, points_, prob, cam, use_huber, axis_name)
        return F

    def step(carry, _):
        poses, points, lam, ni, F = carry
        dxc, dxp, (gc, gp) = _pcg_solve(
            prob, cam, poses, points, use_huber, lam, n_cg, axis_name
        )
        dxc = dxc * (~prob.pose_fixed)[:, None]
        poses_new = se3.retract(poses, dxc)
        points_new = points + dxp
        F_new = total(poses_new, points_new)
        gdot = jnp.sum(dxc * (lam * dxc - gc)) + jnp.sum(dxp * (lam * dxp - gp))
        rho = (F - F_new) / (gdot + 1e-12)
        ok = (rho > 0) & jnp.isfinite(F_new)
        poses = jnp.where(ok, poses_new, poses)
        points = jnp.where(ok, points_new, points)
        F = jnp.where(ok, F_new, F)
        lam = jnp.where(
            ok, lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3), lam * ni
        )
        ni = jnp.where(ok, 2.0, ni * 2.0)
        return (poses, points, lam, ni, F), None

    (poses, points, _, _, F), _ = jax.lax.scan(
        step, (poses, points, lam0, jnp.float32(2.0), F0), None, length=n_iters
    )
    return poses, points, F


def edge_chi2(poses, points, prob: BAProblem, cam: Camera):
    r, _, _, comp, depth_ok = _edge_terms(poses, points, prob, cam)
    e2 = jnp.sum(r * r * comp, axis=-1) * prob.inv_sigma2
    return e2, depth_ok


def ba_solve(
    prob: BAProblem,
    cam: Camera,
    n_iters_first: int = 5,
    n_iters_second: int = 10,
    n_cg: int = 30,
    axis_name=None,
) -> BAResult:
    """Two-stage schedule of the reference LocalBundleAdjustment:
    5 LM iters -> chi2 outlier rejection -> 10 LM iters -> final inliers.

    With `axis_name` set (inside shard_map over an edge-sharded mesh axis),
    this same program is the DISTRIBUTED bundle adjuster: each device owns
    an edge shard, reductions ride psum over ICI."""
    poses, points = prob.poses, prob.points
    poses, points, _ = _lm_run(
        prob, cam, poses, points, jnp.asarray(True), n_iters_first, n_cg, axis_name
    )
    e2, depth_ok = edge_chi2(poses, points, prob, cam)
    th = jnp.where(prob.is_stereo, CHI2_STEREO, CHI2_MONO)
    keep = prob.edge_valid & (e2 <= th) & depth_ok
    prob2 = prob._replace(edge_valid=keep)
    poses, points, F = _lm_run(
        prob2, cam, poses, points, jnp.asarray(True), n_iters_second, n_cg, axis_name
    )
    e2, depth_ok = edge_chi2(poses, points, prob2, cam)
    inlier = keep & (e2 <= th) & depth_ok
    return BAResult(poses=poses, points=points, edge_inlier=inlier, final_chi2=F)


@functools.partial(jax.jit, static_argnames=("n_iters_first", "n_iters_second", "n_cg"))
def ba_solve_jit(prob, cam, n_iters_first=5, n_iters_second=10, n_cg=30):
    return ba_solve(prob, cam, n_iters_first, n_iters_second, n_cg)


# ===========================================================================
# Point-major bundle adjustment (the fast path)
#
# The COO solver above is layout-agnostic but pays for every reduction with
# an XLA scatter, which the TPU serializes per update. The point-major
# layout [P, D] (each point row carries up to D observations, padded)
# makes every reduction hardware-shaped:
#   * point-side gradients/Hessian blocks: a sum over the D axis (VPU);
#   * camera-side reductions: one-hot matmuls against A[E, K] (MXU);
#   * the camera gather in the H*v product: A @ vc (MXU);
#   * the point gather: a broadcast within the row (free).
# It also gives the distributed decomposition of the north star directly:
# shard the POINT ROWS (map blocks) across devices — point-side state
# stays local, camera-side reductions ride one psum per CG step.
# ===========================================================================


def inv3x3(M: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate/det) — pure VPU math;
    jnp.linalg.inv's LU path serializes on TPU for large batches."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


class BAProblemPM(NamedTuple):
    poses: jax.Array  # [K,4,4]
    points: jax.Array  # [P,3]
    obs_kf: jax.Array  # [P,D] int32
    obs: jax.Array  # [P,D,3]
    inv_sigma2: jax.Array  # [P,D]
    is_stereo: jax.Array  # [P,D]
    edge_valid: jax.Array  # [P,D]
    pose_fixed: jax.Array  # [K]


def coo_to_pm(prob: BAProblem, max_obs: int = 16) -> BAProblemPM:
    """Host-side conversion (numpy): group edges by point, pad rows to the
    next power of two of the max observation count (capped; overflow edges
    beyond the cap are dropped — rare and harmless for the optimum)."""
    import numpy as onp

    obs_pt = onp.asarray(prob.obs_pt)
    valid = onp.asarray(prob.edge_valid)
    P = prob.points.shape[0]
    counts = onp.zeros(P, onp.int64)
    order = onp.argsort(obs_pt, kind="stable")
    D = 1
    kf = onp.zeros((P, max_obs), onp.int32)
    ob = onp.zeros((P, max_obs, 3), onp.float32)
    isig = onp.ones((P, max_obs), onp.float32)
    ster = onp.zeros((P, max_obs), bool)
    val = onp.zeros((P, max_obs), bool)
    obs_np = onp.asarray(prob.obs)
    kf_np = onp.asarray(prob.obs_kf)
    isig_np = onp.asarray(prob.inv_sigma2)
    ster_np = onp.asarray(prob.is_stereo)
    for e in order:
        p = obs_pt[e]
        c = counts[p]
        if c >= max_obs or not valid[e]:
            continue
        kf[p, c] = kf_np[e]
        ob[p, c] = obs_np[e]
        isig[p, c] = isig_np[e]
        ster[p, c] = ster_np[e]
        val[p, c] = True
        counts[p] = c + 1
        D = max(D, c + 1)
    D = 1 << (int(D) - 1).bit_length()
    return BAProblemPM(
        poses=prob.poses, points=prob.points,
        obs_kf=jnp.asarray(kf[:, :D]), obs=jnp.asarray(ob[:, :D]),
        inv_sigma2=jnp.asarray(isig[:, :D]), is_stereo=jnp.asarray(ster[:, :D]),
        edge_valid=jnp.asarray(val[:, :D]), pose_fixed=prob.pose_fixed,
    )


def _pm_edge_terms(poses, points, prob: BAProblemPM, cam: Camera):
    """Like _edge_terms on the [P,D] layout: r [P,D,3], Jc [P,D,3,6],
    Jp [P,D,3,3], comp [P,D,3], depth_ok [P,D]."""
    # Per-edge pose fetch as a one-hot matmul on the MXU: XLA lowers the
    # row gather poses[obs_kf] to serialized dynamic slices on TPU
    # (~2x slower at merged-map scale). precision='highest' keeps the
    # selected pose entries exact (geometry invariant).
    P, D = prob.obs_kf.shape
    K = poses.shape[0]
    oh = jax.nn.one_hot(prob.obs_kf.reshape(-1), K, dtype=poses.dtype)
    T = jax.lax.dot_general(
        oh, poses.reshape(K, 16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(P, D, 4, 4)
    R = T[..., :3, :3]
    pc = _einsum("pdij,pj->pdi", R, points) + T[..., :3, 3]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    pred = jnp.stack([u, v, ur], axis=-1)
    r = prob.obs - pred
    zero = jnp.zeros_like(x)
    dh = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], -1),
            jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], -1),
            jnp.stack([cam.fx * inv_z, zero, (-cam.fx * x + cam.bf) * inv_z2], -1),
        ],
        axis=-2,
    )
    hat_pc = se3.hat(pc)
    dpc = jnp.concatenate(
        [-hat_pc, jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), hat_pc.shape)],
        axis=-1,
    )
    Jc = -_einsum("pdij,pdjk->pdik", dh, dpc)
    Jp = -_einsum("pdij,pdjk->pdik", dh, R)
    comp = jnp.stack(
        [jnp.ones_like(x), jnp.ones_like(x), prob.is_stereo.astype(x.dtype)], -1
    )
    return r, Jc, Jp, comp, z > 0.0


def _pm_weights(r, comp, prob, depth_ok, use_huber):
    e2 = jnp.sum(r * r * comp, axis=-1) * prob.inv_sigma2
    delta = jnp.where(prob.is_stereo, DELTA_STEREO, DELTA_MONO)
    delta2 = delta * delta
    w_h = jnp.where(
        use_huber & (e2 > delta2), delta / jnp.sqrt(jnp.maximum(e2, 1e-12)), 1.0
    )
    active = prob.edge_valid & depth_ok
    w = jnp.where(active, w_h * prob.inv_sigma2, 0.0)
    rho = jnp.where(
        use_huber & (e2 > delta2),
        2.0 * delta * jnp.sqrt(jnp.maximum(e2, 1e-12)) - delta2,
        e2,
    )
    return w, e2, jnp.where(active, rho, 0.0)


def _pm_onehot(prob: BAProblemPM, K: int):
    """A [P*D, K] bf16 one-hot of the camera index per edge (exact values,
    f32 accumulation in the matmuls)."""
    return jax.nn.one_hot(
        prob.obs_kf.reshape(-1), K, dtype=jnp.bfloat16
    )


def _pm_mm(A, x):
    """A^T @ x with f32 accumulation: [E,K]^T [E,c] -> [K,c]."""
    return jax.lax.dot_general(
        A, x.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pm_camera_gather(A, vc):
    """[K,6] -> [P*D,6] via the one-hot matmul (MXU)."""
    return jax.lax.dot_general(
        A, vc.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pm_assemble(poses, points, prob, cam, use_huber, A, axis_name):
    """Gradients, diagonal blocks, robust chi2 (+ edge terms for reuse)."""
    K = prob.poses.shape[0]
    P, D = prob.obs_kf.shape

    def reduce_(x):
        return x if axis_name is None else jax.lax.psum(x, axis_name)

    r, Jc, Jp, comp, dok = _pm_edge_terms(poses, points, prob, cam)
    w, _, rho = _pm_weights(r, comp, prob, dok, use_huber)
    W = w[..., None] * comp  # [P,D,3]
    Wr = W * r
    gc = reduce_(_pm_mm(A, _einsum("pdci,pdc->pdi", Jc, Wr).reshape(P * D, -1)))
    gp = jnp.sum(_einsum("pdci,pdc->pdi", Jp, Wr), axis=1)  # [P,3]
    Hcc = reduce_(
        _pm_mm(
            A, _einsum("pdci,pdc,pdcj->pdij", Jc, W, Jc).reshape(P * D, 36)
        )
    ).reshape(K, 6, 6)
    Hpp = jnp.sum(_einsum("pdci,pdc,pdcj->pdij", Jp, W, Jp), axis=1)
    F = reduce_(jnp.sum(rho))
    return (r, Jc, Jp, W), gc, gp, Hcc, Hpp, F


class PMLMState(NamedTuple):
    """Carried LM state between point-major LM iterations. Exposed so the
    host can run the solve in interruptible per-iteration chunks (the
    reference's mbAbortBA protocol, LocalMapping.cpp:109-114,
    Optimizer.cpp:426-787 abort checks)."""

    poses: jax.Array
    points: jax.Array
    lam: jax.Array
    ni: jax.Array
    F: jax.Array


def ba_pm_init(prob: BAProblemPM, cam: Camera, use_huber=True, axis_name=None):
    """Initial LM state: lambda from the Hessian diagonal (g2o heuristic)."""
    K = prob.poses.shape[0]
    A = _pm_onehot(prob, K)
    use_huber = jnp.asarray(use_huber)
    _, _, _, Hcc0, Hpp0, F0 = _pm_assemble(
        prob.poses, prob.points, prob, cam, use_huber, A, axis_name
    )
    hpp_max = jnp.max(jax.vmap(jnp.diag)(Hpp0))
    if axis_name is not None:
        hpp_max = jax.lax.pmax(hpp_max, axis_name)
    diag_max = jnp.maximum(jnp.max(jax.vmap(jnp.diag)(Hcc0)), hpp_max)
    return PMLMState(
        poses=prob.poses, points=prob.points,
        lam=1e-5 * diag_max, ni=jnp.float32(2.0), F=F0,
    )


def ba_pm_step(
    prob: BAProblemPM,
    cam: Camera,
    state: PMLMState,
    n_cg: int = 20,
    use_huber=True,
    axis_name=None,
) -> PMLMState:
    """ONE point-major LM iteration (PCG inner solve + accept/reject)."""
    K = prob.poses.shape[0]
    P, D = prob.obs_kf.shape
    A = _pm_onehot(prob, K)
    use_huber = jnp.asarray(use_huber)
    free = ~prob.pose_fixed

    def reduce_(x):
        return x if axis_name is None else jax.lax.psum(x, axis_name)

    poses, points, lam, ni, F = state
    (r, Jc, Jp, W), gc, gp, Hcc, Hpp, _ = _pm_assemble(
        poses, points, prob, cam, use_huber, A, axis_name
    )
    gc = gc * free[:, None]
    Mc = jnp.linalg.inv(Hcc + (lam + 1e-6) * jnp.eye(6))
    Mp = inv3x3(Hpp + (lam + 1e-6) * jnp.eye(3))

    def hv(vc, vp):
        vc = vc * free[:, None]
        a = _einsum(
            "pdci,pdi->pdc", Jc, _pm_camera_gather(A, vc).reshape(P, D, 6)
        ) + _einsum("pdci,pi->pdc", Jp, vp)
        Wa = W * a
        Hc = reduce_(_pm_mm(A, _einsum("pdci,pdc->pdi", Jc, Wa).reshape(P * D, -1)))
        Hp = jnp.sum(_einsum("pdci,pdc->pdi", Jp, Wa), axis=1)
        return (Hc + lam * vc) * free[:, None], Hp + lam * vp

    def precond(rc, rp):
        return (
            _einsum("kij,kj->ki", Mc, rc) * free[:, None],
            _einsum("pij,pj->pi", Mp, rp),
        )

    def dot(ac, bc, ap, bp):
        return jnp.sum(ac * bc) + reduce_(jnp.sum(ap * bp))

    xc = jnp.zeros_like(gc)
    xp = jnp.zeros_like(gp)
    rc, rp = gc, gp
    zc, zp = precond(rc, rp)
    pc_, pp_ = zc, zp
    rz = dot(rc, zc, rp, zp)

    def cg(c, _):
        xc, xp, rc, rp, pc_, pp_, rz = c
        Apc, App = hv(pc_, pp_)
        pAp = dot(pc_, Apc, pp_, App)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        xc = xc + alpha * pc_
        xp = xp + alpha * pp_
        rc = rc - alpha * Apc
        rp = rp - alpha * App
        zc, zp = precond(rc, rp)
        rz2 = dot(rc, zc, rp, zp)
        beta = rz2 / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        return (xc, xp, rc, rp, zc + beta * pc_, zp + beta * pp_, rz2), None

    # NOTE: unlike the pose optimizer's tiny LM body (where unrolling was
    # a 7x win), unrolling this CG scan measured SLOWER on-chip (r5:
    # 10.5 -> 15.6 ms small tier, 37.7 -> 72.3 ms big tier) — the body is
    # large enough that the sequential scan is the better schedule.
    (xc, xp, *_), _ = jax.lax.scan(
        cg, (xc, xp, rc, rp, pc_, pp_, rz), None, length=n_cg
    )
    dxc = -xc * free[:, None]
    dxp = -xp
    poses_new = se3.retract(poses, dxc)
    points_new = points + dxp
    *_, F_new = _pm_assemble(
        poses_new, points_new, prob, cam, use_huber, A, axis_name
    )
    gdot = jnp.sum(dxc * (lam * dxc - gc)) + reduce_(
        jnp.sum(dxp * (lam * dxp - gp))
    )
    rho = (F - F_new) / (gdot + 1e-12)
    ok = (rho > 0) & jnp.isfinite(F_new)
    poses = jnp.where(ok, poses_new, poses)
    points = jnp.where(ok, points_new, points)
    F = jnp.where(ok, F_new, F)
    lam = jnp.where(ok, lam * jnp.maximum(1 / 3, 1 - (2 * rho - 1) ** 3), lam * ni)
    ni = jnp.where(ok, 2.0, ni * 2.0)
    return PMLMState(poses=poses, points=points, lam=lam, ni=ni, F=F)


def pm_edge_chi2(poses, points, prob: BAProblemPM, cam: Camera):
    r, _, _, comp, dok = _pm_edge_terms(poses, points, prob, cam)
    e2 = jnp.sum(r * r * comp, axis=-1) * prob.inv_sigma2
    return e2, dok


def pm_inlier_mask(poses, points, prob: BAProblemPM, cam: Camera):
    """Edges passing the chi2 gate (5.991 mono / 7.815 stereo) at the
    current estimate — the mid-schedule outlier cut and final inliers."""
    e2, dok = pm_edge_chi2(poses, points, prob, cam)
    th = jnp.where(prob.is_stereo, CHI2_STEREO, CHI2_MONO)
    return prob.edge_valid & (e2 <= th) & dok


def ba_solve_pm(
    prob: BAProblemPM,
    cam: Camera,
    n_iters_first: int = 5,
    n_iters_second: int = 10,
    n_cg: int = 20,
    axis_name=None,
) -> "BAResultPM":
    """Point-major LM/PCG bundle adjustment (fused two-stage schedule of
    the reference LocalBundleAdjustment). With axis_name set inside a
    shard_map, point rows are sharded (map blocks per device): point-side
    state stays local, camera-side reductions psum over ICI."""

    def lm_phase(prob_, state, n_iters):
        def step(carry, _):
            return ba_pm_step(prob_, cam, carry, n_cg, True, axis_name), None

        state, _ = jax.lax.scan(step, state, None, length=n_iters)
        return state

    state = lm_phase(prob, ba_pm_init(prob, cam, True, axis_name), n_iters_first)
    keep = pm_inlier_mask(state.poses, state.points, prob, cam)
    prob2 = prob._replace(edge_valid=keep)
    state = lm_phase(
        prob2,
        ba_pm_init(
            prob2._replace(poses=state.poses, points=state.points),
            cam, True, axis_name,
        ),
        n_iters_second,
    )
    inlier = pm_inlier_mask(state.poses, state.points, prob2, cam)
    return BAResultPM(
        poses=state.poses, points=state.points,
        edge_inlier=inlier, final_chi2=state.F,
    )


class BAResultPM(NamedTuple):
    poses: jax.Array
    points: jax.Array
    edge_inlier: jax.Array  # [P,D]
    final_chi2: jax.Array


ba_solve_pm_jit = jax.jit(
    ba_solve_pm, static_argnames=("n_iters_first", "n_iters_second", "n_cg")
)

# Chunked (host-driven) variants for the interruptible schedule: one jit
# per LM iteration lets the host check an abort flag between iterations
# (reference InterruptBA semantics) and lets tracking's device programs
# interleave with a long solve on the device stream.
ba_pm_init_jit = jax.jit(ba_pm_init)
ba_pm_step_jit = jax.jit(ba_pm_step, static_argnames=("n_cg",))
pm_inlier_mask_jit = jax.jit(pm_inlier_mask)


def ba_solve_pm_interruptible(
    prob: BAProblemPM,
    cam: Camera,
    should_abort=None,
    n_iters_first: int = 5,
    n_iters_second: int = 10,
    n_cg: int = 20,
    sync_every: int = 3,
) -> "BAResultPM":
    """Host-driven two-stage schedule with abort checks between LM
    iterations (reference LocalMapping.cpp:109-114 mbAbortBA protocol).

    `should_abort()` is polled between iteration chunks; when it returns
    True the remaining iterations are skipped and the current estimate is
    finalized (chi2 inlier marking still runs, matching the reference's
    early-exit behavior). `sync_every` bounds how many iterations are
    enqueued before the host blocks on a device value, which (a) bounds
    abort latency and (b) yields the GIL/device stream to the tracker
    between chunks."""
    if should_abort is None:
        should_abort = lambda: False
    # one explicit upload: assembly hands numpy leaves (it runs under the
    # map lock and must not pay the ~10 MB transfer there); without this,
    # every jitted step call would re-stage the host arrays
    prob = jax.tree.map(jnp.asarray, prob)

    def phase(prob_, state, n_iters):
        done = 0
        while done < n_iters:
            if should_abort():
                break
            n = min(sync_every, n_iters - done)
            for _ in range(n):
                state = ba_pm_step_jit(prob_, cam, state, n_cg)
            float(state.F)  # value fetch = reliable device sync point
            done += n
        return state

    state = phase(prob, ba_pm_init_jit(prob, cam), n_iters_first)
    keep = pm_inlier_mask_jit(state.poses, state.points, prob, cam)
    prob2 = prob._replace(edge_valid=keep)
    if not should_abort():
        state = phase(
            prob2,
            ba_pm_init_jit(
                prob2._replace(poses=state.poses, points=state.points), cam
            ),
            n_iters_second,
        )
    inlier = pm_inlier_mask_jit(state.poses, state.points, prob2, cam)
    return BAResultPM(
        poses=state.poses, points=state.points,
        edge_inlier=inlier, final_chi2=state.F,
    )
