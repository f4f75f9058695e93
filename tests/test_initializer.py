import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.geometry import camera, se3
from orbslam2_tpu.ops import initializer


def _cam():
    return camera.make_camera(458.0, 457.0, 376.0, 240.0, width=752, height=480)


def make_two_view(rng, n=200, planar=False, noise=0.3, tx=0.4):
    cam = _cam()
    if planar:
        pts = np.stack(
            [
                rng.uniform(-4, 4, n),
                rng.uniform(-3, 3, n),
                np.full(n, 8.0) + 0.3 * rng.uniform(-4, 4, n) * 0.0,
            ],
            1,
        )
    else:
        pts = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 20, n)], 1
        )
    xi = np.array([0.01, -0.04, 0.005, tx, 0.05, 0.08], np.float32)
    T2 = np.asarray(se3.exp(jnp.asarray(xi)))

    def proj(T, p):
        pc = p @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        return np.stack(
            [458.0 * pc[:, 0] / z + 376.0, 457.0 * pc[:, 1] / z + 240.0], 1
        ), z

    uv1, z1 = proj(np.eye(4), pts)
    uv2, z2 = proj(T2, pts)
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    valid = (z1 > 0) & (z2 > 0)
    return cam, jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32), \
        jnp.asarray(valid), T2, pts


@pytest.fixture(scope="module")
def init_jit():
    return jax.jit(
        initializer.initialize_two_view,
        static_argnames=("n_hyp", "min_triangulated"),
    )


class TestInitializer:
    def test_general_scene_uses_fundamental(self, rng, init_jit):
        cam, uv1, uv2, valid, T2, pts = make_two_view(rng, planar=False)
        res = init_jit(jax.random.PRNGKey(0), uv1, uv2, valid, cam)
        assert bool(res.success)
        assert not bool(res.used_homography)
        # rotation recovered; translation up to scale
        R_err = np.asarray(res.T21)[:3, :3] - T2[:3, :3]
        assert np.abs(R_err).max() < 0.03  # minimal-sample 8-pt; BA refines later
        t_est = np.asarray(res.T21)[:3, 3]
        t_gt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
        assert np.abs(t_est - t_gt).max() < 0.05

    def test_planar_scene_uses_homography(self, rng, init_jit):
        cam, uv1, uv2, valid, T2, pts = make_two_view(rng, planar=True)
        res = init_jit(jax.random.PRNGKey(1), uv1, uv2, valid, cam)
        assert bool(res.used_homography)
        assert bool(res.success)
        R_err = np.asarray(res.T21)[:3, :3] - T2[:3, :3]
        assert np.abs(R_err).max() < 2e-2

    def test_triangulated_points_match_scale(self, rng, init_jit):
        cam, uv1, uv2, valid, T2, pts = make_two_view(rng, noise=0.1)
        res = init_jit(jax.random.PRNGKey(2), uv1, uv2, valid, cam)
        assert bool(res.success)
        ok = np.asarray(res.point_ok)
        X = np.asarray(res.points)[ok]
        gt = pts[ok]
        # up-to-scale: compare after median-scale alignment
        s = np.median(gt[:, 2]) / np.median(X[:, 2])
        err = np.linalg.norm(X * s - gt, axis=1) / np.linalg.norm(gt, axis=1)
        assert np.median(err) < 0.02

    def test_no_parallax_rejected(self, rng, init_jit):
        cam, uv1, uv2, valid, T2, pts = make_two_view(rng, tx=0.0005, noise=0.0)
        res = init_jit(jax.random.PRNGKey(3), uv1, uv2, valid, cam)
        assert not bool(res.success)
