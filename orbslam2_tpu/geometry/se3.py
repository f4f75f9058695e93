"""SE(3) Lie-group operations on batched 4x4 homogeneous matrices.

TPU-native replacement for the reference's `Eigen::Isometry3f` poses and
g2o's `SE3Quat` exp/log maps (reference Thirdparty/g2o/g2o/types/se3quat.h).
Poses are plain `[..., 4, 4]` float arrays so that composition is a matmul
and everything vmaps/shards trivially.

Tangent convention matches g2o: xi = (omega, upsilon) — rotation first —
and optimizer updates are LEFT-multiplicative: T_new = exp(xi) @ T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Small-matrix geometry must be true float32 — on TPU the default matmul
# precision would route 3x3 products through bf16 passes and wreck pose
# accuracy, so every product here pins precision explicitly.
_mm = functools.partial(jnp.matmul, precision="highest")
_einsum = functools.partial(jnp.einsum, precision="highest")


def identity(batch_shape=()) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (*batch_shape, 4, 4))


def from_Rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """Build [...,4,4] from rotation [...,3,3] and translation [...,3]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, (*batch, 3, 3))
    t = jnp.broadcast_to(t, (*batch, 3))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (*batch, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def inverse(T: jax.Array) -> jax.Array:
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_Rt(Rt, -_einsum("...ij,...j->...i", Rt, t))


def compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return _mm(A, B)


def transform(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply [...,4,4] to points [...,3] (broadcasting over batch dims)."""
    return _einsum("...ij,...j->...i", rotation(T), p) + translation(T)


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of [...,3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues: [...,3] -> [...,3,3]. Numerically safe near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = _mm(W, W)
    # sin(t)/t and (1-cos t)/t^2 with Taylor guards around zero.
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def log_so3(R: jax.Array) -> jax.Array:
    """Inverse Rodrigues: [...,3,3] -> [...,3].

    Goes through the quaternion (Shepperd extraction is stable for every
    rotation, including angles at pi where the antisymmetric part vanishes):
    angle = 2*atan2(|v|, w), axis = v/|v|.
    """
    q = to_quaternion(R)
    v = q[..., :3]
    w = q[..., 3]
    flip = jnp.where(w < 0, -1.0, 1.0)  # principal angle in [0, pi]
    v = v * flip[..., None]
    w = w * flip
    n = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(n, w)
    # v = axis * sin(angle/2): w_vec = v * angle/sin(angle/2); Taylor near 0.
    scale = jnp.where(
        n < 1e-6,
        2.0 / jnp.maximum(w, _EPS),
        angle / jnp.maximum(n, _EPS),
    )
    return v * scale[..., None]


def _left_jacobian(w: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(w): V matrix of the SE(3) exp."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = _mm(W, W)
    small = theta2 < 1e-8
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def _left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = _mm(W, W)
    small = theta2 < 1e-8
    half_theta = 0.5 * theta
    cot = jnp.cos(half_theta) / jnp.where(jnp.abs(jnp.sin(half_theta)) < _EPS, _EPS, jnp.sin(half_theta))
    D = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * cot) / theta2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + D[..., None, None] * W2


def exp(xi: jax.Array) -> jax.Array:
    """se(3) exp: xi = [...,6] (omega, upsilon) -> [...,4,4]."""
    w = xi[..., :3]
    u = xi[..., 3:]
    R = exp_so3(w)
    V = _left_jacobian(w)
    t = _einsum("...ij,...j->...i", V, u)
    return from_Rt(R, t)


def log(T: jax.Array) -> jax.Array:
    """SE(3) log: [...,4,4] -> [...,6] (omega, upsilon)."""
    w = log_so3(rotation(T))
    Vinv = _left_jacobian_inv(w)
    u = _einsum("...ij,...j->...i", Vinv, translation(T))
    return jnp.concatenate([w, u], axis=-1)


def retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative update used by all optimizers: exp(xi) @ T."""
    return _mm(exp(xi), T)


def to_quaternion(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order.

    Shepperd's method, branch-free via argmax over the four candidates.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def cand_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], axis=-2)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.where(tr > 0, 0, jnp.argmax(scores, axis=-1))
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quaternion(q: jax.Array) -> jax.Array:
    """Quaternion (x, y, z, w) -> rotation matrix [...,3,3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
