"""Pinhole stereo camera model: projection, unprojection, frustum tests.

Replaces the per-object camera code scattered through the reference's
Frame (src/Frame.cpp:336-392 isInFrustum, :878-893 UnprojectStereo) with
batched, mask-returning functions. Intrinsics travel as a small pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3


class Camera(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    bf: jax.Array  # baseline * fx  (stereo); 0 for mono
    width: int
    height: int

    @property
    def b(self):
        return self.bf / self.fx

    def K(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def make_camera(fx, fy, cx, cy, bf=0.0, width=752, height=480) -> Camera:
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return Camera(f32(fx), f32(fy), f32(cx), f32(cy), f32(bf), int(width), int(height))


def project(cam: Camera, pc: jax.Array):
    """Camera-frame points [...,3] -> pixel (u, v) [...,2]; caller checks z>0."""
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[..., 0] * inv_z + cam.cx
    v = cam.fy * pc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Camera, pc: jax.Array):
    """Camera-frame points -> (u, v, uR) [...,3] — the stereo measurement
    (reference g2o stereo edge residual, types_six_dof_expmap.h)."""
    uv = project(cam, pc)
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def unproject_stereo(cam: Camera, u, v, depth):
    """Pixel + stereo depth -> camera-frame 3D point [...,3]
    (reference src/Frame.cpp:878-893)."""
    x = (u - cam.cx) * depth / cam.fx
    y = (v - cam.cy) * depth / cam.fy
    return jnp.stack([x, y, depth * jnp.ones_like(x)], axis=-1)


def in_image(cam: Camera, uv: jax.Array, min_x=0.0, min_y=0.0):
    u, v = uv[..., 0], uv[..., 1]
    return (u >= min_x) & (u < cam.width) & (v >= min_y) & (v < cam.height)


def is_in_frustum(
    cam: Camera,
    Tcw: jax.Array,
    pw: jax.Array,
    normal: jax.Array,
    min_dist: jax.Array,
    max_dist: jax.Array,
    view_cos_limit: float = 0.5,
):
    """Batched reference Frame::isInFrustum (src/Frame.cpp:336-392).

    Returns (visible_mask, uv, ur, dist, view_cos) where visibility requires:
    positive depth, inside image, distance within the point's scale-invariance
    band, and viewing angle cos > limit.
    """
    pc = se3.transform(Tcw, pw)
    z = pc[..., 2]
    uvr = project_stereo(cam, pc)
    uv = uvr[..., :2]
    ur = uvr[..., 2]

    Ow = se3.translation(se3.inverse(Tcw))
    po = pw - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * normal, axis=-1) / jnp.maximum(dist, 1e-9)

    visible = (
        (z > 0.0)
        & in_image(cam, uv)
        & (dist >= min_dist)
        & (dist <= max_dist)
        & (view_cos > view_cos_limit)
    )
    return visible, uv, ur, dist, view_cos
