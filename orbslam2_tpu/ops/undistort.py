"""Keypoint undistortion (reference Frame::UndistortKeyPoints,
src/Frame.cpp:471-503).

The reference calls cv::undistortPoints on the detected keypoints when
the camera has radial/tangential distortion (k1 != 0; a no-op for the
pre-rectified stereo pipelines). This is the same algorithm, batched and
device-side: normalize, then fixed-point iteration of the inverse
Brown–Conrady model (cv::undistortPoints's iterative scheme), then
re-project through K. Runs inside the frontend's fused per-frame program
so it costs no extra dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp


def _distort_normalized(x, y, k1, k2, p1, p2, k3):
    """Forward Brown–Conrady model on normalized coordinates."""
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def undistort_points(
    uv,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    k1: float = 0.0,
    k2: float = 0.0,
    p1: float = 0.0,
    p2: float = 0.0,
    k3: float = 0.0,
    n_iters: int = 8,
):
    """Undistort pixel keypoints [N,2] -> ideal pixel coordinates [N,2].

    Fixed-point iteration x_{n+1} = (x_obs - tangential(x_n)) / radial(x_n)
    — cv::undistortPoints's scheme (OpenCV uses 5 iterations; 8 converges
    below 0.01 px for EuRoC/TUM-grade distortion)."""
    u = (uv[..., 0] - cx) / fx
    v = (uv[..., 1] - cy) / fy
    x, y = u, v
    for _ in range(n_iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        inv_r = 1.0 / jnp.where(jnp.abs(radial) < 1e-9, 1e-9, radial)
        x = (u - dx) * inv_r
        y = (v - dy) * inv_r
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)


def distort_points(
    uv, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0
):
    """Forward distortion of ideal pixel points (for tests/round-trips)."""
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    xd, yd = _distort_normalized(x, y, k1, k2, p1, p2, k3)
    return jnp.stack([xd * fx + cx, yd * fy + cy], axis=-1)
