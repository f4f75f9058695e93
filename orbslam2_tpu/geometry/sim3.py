"""Sim(3) similarity transforms for loop closing.

Replacement for g2o's `Sim3` type (reference Thirdparty/g2o/g2o/types/sim3.h)
used by the essential-graph optimization and Sim3 loop solver
(reference src/Optimizer.cpp:790-1249, src/Sim3Solver.cpp).

A Sim3 is stored as a pytree tuple of dense arrays (R [...,3,3],
t [...,3], s [...]) acting as  x -> s * R @ x + t.
Tangent convention (7-vector): (omega, upsilon, sigma) — rotation,
translation, log-scale — with left-multiplicative retraction.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp

_mm = functools.partial(jnp.matmul, precision="highest")
_einsum = functools.partial(jnp.einsum, precision="highest")

from . import se3


class Sim3(NamedTuple):
    R: jax.Array  # [...,3,3]
    t: jax.Array  # [...,3]
    s: jax.Array  # [...]

    def matrix(self) -> jax.Array:
        """Return [...,4,4] with sR in the upper block."""
        return se3.from_Rt(self.s[..., None, None] * self.R, self.t)


def identity(batch_shape=()) -> Sim3:
    return Sim3(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*batch_shape, 3, 3)),
        t=jnp.zeros((*batch_shape, 3), jnp.float32),
        s=jnp.ones(batch_shape, jnp.float32),
    )


def from_se3(T: jax.Array, s=None) -> Sim3:
    R = se3.rotation(T)
    t = se3.translation(T)
    if s is None:
        s = jnp.ones(T.shape[:-2], T.dtype)
    return Sim3(R=R, t=t, s=s)


def to_se3(S: Sim3) -> jax.Array:
    """Project to SE(3): keep R, scale translation by s (reference
    LoopClosing.cpp:463-466 pattern: Tiw = [R | t/s])."""
    return se3.from_Rt(S.R, S.t / S.s[..., None])


def apply(S: Sim3, p: jax.Array) -> jax.Array:
    return S.s[..., None] * _einsum("...ij,...j->...i", S.R, p) + S.t


def compose(A: Sim3, B: Sim3) -> Sim3:
    return Sim3(
        R=_mm(A.R, B.R),
        t=A.s[..., None] * _einsum("...ij,...j->...i", A.R, B.t) + A.t,
        s=A.s * B.s,
    )


def inverse(S: Sim3) -> Sim3:
    Rinv = jnp.swapaxes(S.R, -1, -2)
    sinv = 1.0 / S.s
    return Sim3(
        R=Rinv,
        t=-sinv[..., None] * _einsum("...ij,...j->...i", Rinv, S.t),
        s=sinv,
    )


def exp(xi: jax.Array) -> Sim3:
    """sim(3) exp of [...,7] = (omega, upsilon, sigma).

    Uses the closed-form W matrix (see Strasdat's thesis / g2o sim3.h).
    """
    w = xi[..., :3]
    u = xi[..., 3:6]
    sigma = xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.exp_so3(w)

    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-16))
    W = se3.hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # Coefficients for W-matrix: A*I + B*W + C*W^2 such that t = W_mat @ u.
    # Closed form handling the sigma->0 and theta->0 limits.
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta2 < 1e-10

    # Generic terms
    A_gen = (s - 1.0) / jnp.where(small_sigma, 1.0, sigma)
    A = jnp.where(small_sigma, 1.0 + sigma / 2.0 + sigma**2 / 6.0, A_gen)

    # a = s*sin(theta), b = s*cos(theta)
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c2 = sigma**2 + theta2
    c2 = jnp.where(c2 < 1e-12, 1.0, c2)

    B_big = (a * sigma + (1.0 - b) * theta) / (theta * c2)
    C_big = (A - ((b - 1.0) * sigma + a * theta) / c2) / jnp.where(small_theta, 1.0, theta2)
    # theta -> 0 limits (sigma arbitrary):
    sig_safe = jnp.where(small_sigma, 1.0, sigma)
    B_sm = jnp.where(
        small_sigma,
        0.5 + sigma / 3.0,
        ((sigma - 1.0) * s + 1.0) / (sig_safe**2),
    )
    C_sm = jnp.where(
        small_sigma,
        1.0 / 6.0 + sigma / 8.0,
        ((0.5 * sig_safe**2 - sig_safe + 1.0) * s - 1.0) / (sig_safe**3),
    )
    B = jnp.where(small_theta, B_sm, B_big)
    C = jnp.where(small_theta, C_sm, C_big)

    Wmat = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    t = _einsum("...ij,...j->...i", Wmat, u)
    return Sim3(R=R, t=t, s=s)


def log(S: Sim3) -> jax.Array:
    """Inverse of `exp`. Solves the linear W-matrix system for upsilon."""
    w = se3.log_so3(S.R)
    sigma = jnp.log(S.s)
    # Rebuild the same W matrix used in exp and solve W u = t.
    Wmat = _w_matrix(w, sigma)
    u = jnp.linalg.solve(Wmat, S.t[..., None])[..., 0]
    return jnp.concatenate([w, u, sigma[..., None]], axis=-1)


def _w_matrix(w: jax.Array, sigma: jax.Array) -> jax.Array:
    # Probe exp's linear t = Wmat @ u map with the three basis vectors.
    e = jnp.eye(3, dtype=w.dtype)
    cols = []
    for k in range(3):
        u = jnp.broadcast_to(e[k], w.shape)
        xi = jnp.concatenate([w, u, sigma[..., None]], axis=-1)
        cols.append(exp(xi).t)
    return jnp.stack(cols, axis=-1)


def retract(S: Sim3, xi: jax.Array) -> Sim3:
    return compose(exp(xi), S)
