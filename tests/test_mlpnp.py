import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.ops import mlpnp


def make_problem(rng, n=120, noise_rad=0.0, outlier_frac=0.0):
    pw = rng.uniform(low=[-5, -3, 4], high=[5, 3, 25], size=(n, 3)).astype(np.float32)
    xi = np.array([0.08, -0.12, 0.05, 0.5, -0.3, 0.25], np.float32)
    T = np.asarray(se3.exp(jnp.asarray(xi)))
    pc = pw @ T[:3, :3].T + T[:3, 3]
    v = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    if noise_rad > 0:
        v = v + rng.normal(0, noise_rad, v.shape)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    if n_out:
        rand = rng.normal(size=(n_out, 3))
        rand[:, 2] = np.abs(rand[:, 2]) + 0.5
        v[out_idx] = rand / np.linalg.norm(rand, axis=1, keepdims=True)
    return jnp.asarray(pw), jnp.asarray(v.astype(np.float32)), T, out_idx


class TestMLPnP:
    def test_exact(self, rng):
        pw, v, T, _ = make_problem(rng, n=60)
        Tcw = mlpnp.mlpnp_solve(pw, v, jnp.ones(60))
        np.testing.assert_allclose(np.asarray(Tcw), T, atol=1e-3)

    def test_minimal_sets(self, rng):
        # near-minimal sets across several draws (RANSAC hypothesis size)
        ok = 0
        for k in range(8):
            pw, v, T, _ = make_problem(np.random.default_rng(k), n=6)
            Tcw = mlpnp.mlpnp_solve(pw, v, jnp.ones(6))
            if np.abs(np.asarray(Tcw)[:3, :3] - T[:3, :3]).max() < 0.05:
                ok += 1
        assert ok >= 6, f"only {ok}/8 minimal solves succeeded"

    def test_ransac_with_outliers(self, rng):
        pw, v, T, out_idx = make_problem(rng, n=150, noise_rad=2e-4, outlier_frac=0.3)
        cos_th = jnp.full(150, np.cos(np.radians(0.5)))
        res = jax.jit(mlpnp.mlpnp_ransac, static_argnames=("n_hyp",))(
            jax.random.PRNGKey(0), pw, v, jnp.ones(150, bool), cos_th
        )
        np.testing.assert_allclose(np.asarray(res.Tcw)[:3, :3], T[:3, :3], atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.Tcw)[:3, 3], T[:3, 3], atol=3e-2)
        inl = np.asarray(res.inliers)
        assert inl[out_idx].mean() < 0.1
        clean = np.setdiff1d(np.arange(150), out_idx)
        assert inl[clean].mean() > 0.85

    def test_bearings_from_pixels(self):
        uv = jnp.asarray([[376.0, 240.0]])
        v = mlpnp.bearings_from_pixels(uv, 458.0, 457.0, 376.0, 240.0)
        np.testing.assert_allclose(np.asarray(v)[0], [0, 0, 1], atol=1e-6)
