"""FAST-9/16 corner scoring as a dense, batched map operation.

TPU-native replacement for the reference's per-cell cv::FAST calls
(reference src/ORBextractor.cpp:702-766). Instead of detecting corners
cell-by-cell on the host, we compute the OpenCV-style FAST *score map*
(the largest threshold at which a pixel is still a corner) for every
pixel of every image in the batch at once, then do 3x3 NMS. Threshold
logic (20 with fallback 7 per 30px cell) is applied downstream by
masking this single score map — one pass over the image instead of two.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (dx, dy), clockwise — the standard FAST-16 ring.
CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
ARC_LEN = 9  # FAST-9: need 9 contiguous ring pixels all brighter/darker


def fast_score(img: jax.Array) -> jax.Array:
    """FAST-9/16 score map.

    img: [..., H, W] float32 grayscale (0..255).
    Returns score [..., H, W]: max threshold t such that the pixel passes the
    segment test (0 where never a corner). Matches OpenCV's nonmax score.
    Border of 3 px is zero.
    """
    H, W = img.shape[-2], img.shape[-1]
    pad = [(0, 0)] * (img.ndim - 2) + [(3, 3), (3, 3)]
    ip = jnp.pad(img, pad, mode="edge")

    # d[k] = ring_k - center, stacked on a new leading axis: [16, ..., H, W]
    ds = [
        ip[..., 3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] - img
        for (dx, dy) in CIRCLE
    ]

    # For each of the 16 arcs of length 9:
    #   bright corner at t  iff min_{k in arc} d_k > t   → candidate score = arc min
    #   dark corner at t    iff max_{k in arc} d_k < -t  → candidate score = -arc max
    # Total score = max over arcs of both candidates. The 16 circular
    # window-of-9 mins/maxes are built by log-doubling (9 = 8 + 1), which
    # halves the dense VPU passes vs. naive per-arc reduction.
    def win9(vals, op):
        w2 = [op(vals[k], vals[(k + 1) % 16]) for k in range(16)]
        w4 = [op(w2[k], w2[(k + 2) % 16]) for k in range(16)]
        w8 = [op(w4[k], w4[(k + 4) % 16]) for k in range(16)]
        return [op(w8[k], vals[(k + 8) % 16]) for k in range(16)]

    mins = win9(ds, jnp.minimum)
    maxs = win9(ds, jnp.maximum)
    score = jnp.zeros_like(img)
    for k in range(16):
        score = jnp.maximum(score, mins[k])
        score = jnp.maximum(score, -maxs[k])
    return jnp.maximum(score, 0.0)


def nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression mask: True where score is the strict-or-tie
    local max (ties broken toward the first in raster order via epsilon on
    the neighborhood max is unnecessary for float scores)."""
    neigh = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (score.ndim - 2) + (3, 3),
        window_strides=(1,) * score.ndim,
        padding=[(0, 0)] * (score.ndim - 2) + [(1, 1), (1, 1)],
    )
    return (score >= neigh) & (score > 0.0)
