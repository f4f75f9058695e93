import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.ops import pnp


def make_pnp_problem(rng, n=120, noise=0.0, outlier_frac=0.0):
    pw = rng.uniform(low=[-5, -3, 4], high=[5, 3, 25], size=(n, 3)).astype(np.float32)
    xi = np.array([0.1, -0.15, 0.08, 0.4, -0.3, 0.2], np.float32)
    T = np.asarray(se3.exp(jnp.asarray(xi)))
    pc = pw @ T[:3, :3].T + T[:3, 3]
    obs = pc[:, :2] / pc[:, 2:3]
    obs += rng.normal(0, noise, obs.shape)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    obs[out_idx] += rng.uniform(0.05, 0.3, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return (
        jnp.asarray(pw),
        jnp.asarray(obs.astype(np.float32)),
        T,
        out_idx,
    )


class TestEPnP:
    def test_exact_solution(self, rng):
        pw, obs, T, _ = make_pnp_problem(rng, n=50)
        R, t, err = pnp.epnp_solve(pw, obs, jnp.ones(50))
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=2e-3)
        np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=5e-3)

    def test_minimal_four_points(self, rng):
        pw, obs, T, _ = make_pnp_problem(rng, n=4)
        R, t, err = pnp.epnp_solve(pw, obs, jnp.ones(4))
        # minimal sets are noisier; pose should still be close
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=0.05)
        np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=0.15)

    def test_weighted_subset(self, rng):
        pw, obs, T, _ = make_pnp_problem(rng, n=80)
        obs_np = np.array(obs)
        obs_np[40:] += 10.0  # garbage in ignored rows
        w = jnp.asarray(np.arange(80) < 40, jnp.float32)
        R, t, err = pnp.epnp_solve(pw, jnp.asarray(obs_np), w)
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=5e-3)


class TestPnPRansac:
    @pytest.fixture(scope="class")
    def ransac_jit(self):
        return jax.jit(pnp.pnp_ransac, static_argnames=("n_hyp",))

    def test_recovers_with_outliers(self, rng, ransac_jit):
        pw, obs, T, out_idx = make_pnp_problem(rng, n=150, noise=1e-3, outlier_frac=0.3)
        max_err2 = jnp.full(150, (2.0 / 458.0) ** 2 * 5.991)
        res = ransac_jit(
            jax.random.PRNGKey(0), pw, obs, jnp.ones(150, bool), max_err2
        )
        np.testing.assert_allclose(np.asarray(res.R), T[:3, :3], atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), T[:3, 3], atol=2e-2)
        inl = np.asarray(res.inliers)
        assert inl[out_idx].mean() < 0.1
        clean = np.setdiff1d(np.arange(150), out_idx)
        assert inl[clean].mean() > 0.9

    def test_respects_validity_mask(self, rng, ransac_jit):
        pw, obs, T, _ = make_pnp_problem(rng, n=100, noise=1e-3)
        obs_np = np.array(obs)
        obs_np[60:] = 77.0  # invalid garbage
        valid = jnp.asarray(np.arange(100) < 60)
        max_err2 = jnp.full(100, (2.0 / 458.0) ** 2 * 5.991)
        res = ransac_jit(
            jax.random.PRNGKey(1), pw, jnp.asarray(obs_np), valid, max_err2
        )
        np.testing.assert_allclose(np.asarray(res.R), T[:3, :3], atol=5e-3)
        assert not np.asarray(res.inliers)[60:].any()
