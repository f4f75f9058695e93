"""Batched two-view linear triangulation (SVD/eigen of the DLT system).

Replaces the per-point SVD in the reference's LocalMapping
(src/LocalMapping.cpp:292-320): x3D from rays of two keyframes via the
4x4 DLT normal equations, fully vmapped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_mm = functools.partial(jnp.matmul, precision="highest")


def triangulate_dlt(P1: jax.Array, P2: jax.Array, xn1: jax.Array, xn2: jax.Array):
    """Triangulate normalized image points.

    P1, P2: [...,3,4] projection matrices (world->image-plane, i.e. [R|t]
            for normalized coordinates).
    xn1, xn2: [...,2] normalized coordinates ((u-cx)/fx, (v-cy)/fy).

    Returns (X [...,3], ok mask) — solves A X = 0 via the eigenvector of
    A^T A with the smallest eigenvalue (stable, batched, TPU-friendly;
    equivalent to the reference's cv-style SVD on the 4x4 A).
    """
    rows = [
        xn1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        xn1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        xn2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        xn2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # [...,4,4]
    AtA = _mm(jnp.swapaxes(A, -1, -2), A)
    # Smallest eigenvector of symmetric 4x4.
    w, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    w_h = h[..., 3]
    ok = jnp.abs(w_h) > 1e-12
    X = h[..., :3] / jnp.where(ok, w_h, 1.0)[..., None]
    return X, ok


def rays_parallax_cos(O1: jax.Array, O2: jax.Array, X: jax.Array):
    """cos of the parallax angle between rays O1->X and O2->X
    (reference src/LocalMapping.cpp:274-289)."""
    r1 = X - O1
    r2 = X - O2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)
