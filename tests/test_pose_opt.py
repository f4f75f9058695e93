import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.geometry import camera, se3
from orbslam2_tpu.ops import pose_opt


def make_problem(rng, n=300, noise_px=0.4, outlier_frac=0.0, stereo_frac=0.8):
    cam = camera.make_camera(458.0, 457.0, 376.0, 240.0, bf=47.9, width=752, height=480)
    pw = rng.uniform(low=[-5, -3, 4], high=[5, 3, 25], size=(n, 3)).astype(np.float32)
    xi_true = np.array([0.02, -0.03, 0.01, 0.3, -0.2, 0.15], np.float32)
    T_true = se3.exp(jnp.asarray(xi_true))
    pc = np.asarray(se3.transform(T_true, jnp.asarray(pw)))
    obs = np.array(camera.project_stereo(cam, jnp.asarray(pc)))
    obs[:, :2] += rng.normal(0, noise_px, (n, 2))
    is_stereo = rng.uniform(size=n) < stereo_frac
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    obs[out_idx, :2] += rng.uniform(15, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    valid = np.ones(n, bool)
    inv_sigma2 = np.ones(n, np.float32)
    return cam, jnp.asarray(pw), jnp.asarray(obs), jnp.asarray(inv_sigma2), \
        jnp.asarray(is_stereo), jnp.asarray(valid), T_true, out_idx


@pytest.fixture(scope="module")
def jitted():
    return jax.jit(pose_opt.pose_optimize, static_argnames=("n_rounds", "n_iters"))


class TestPoseOptimize:
    def test_recovers_pose_from_perturbed_init(self, rng, jitted):
        cam, pw, obs, is2, ster, valid, T_true, _ = make_problem(rng, noise_px=0.0)
        T0 = se3.retract(T_true, jnp.asarray([0.02, -0.01, 0.03, 0.1, 0.05, -0.08], jnp.float32))
        res = jitted(T0, pw, obs, is2, ster, valid, cam)
        err = np.asarray(se3.log(se3.compose(res.Tcw, se3.inverse(T_true))))
        assert np.abs(err).max() < 1e-3, err
        assert int(res.n_inliers) == pw.shape[0]

    def test_robust_to_outliers(self, rng, jitted):
        cam, pw, obs, is2, ster, valid, T_true, out_idx = make_problem(
            rng, noise_px=0.3, outlier_frac=0.25
        )
        T0 = se3.retract(T_true, jnp.asarray([0.01, 0.02, -0.01, 0.08, -0.06, 0.05], jnp.float32))
        res = jitted(T0, pw, obs, is2, ster, valid, cam)
        err = np.asarray(se3.log(se3.compose(res.Tcw, se3.inverse(T_true))))
        assert np.abs(err[:3]).max() < 5e-3, err  # rotation
        assert np.abs(err[3:]).max() < 2e-2, err  # translation
        inlier = np.asarray(res.inlier)
        assert inlier[out_idx].mean() < 0.1, "outliers not rejected"
        clean = np.setdiff1d(np.arange(pw.shape[0]), out_idx)
        assert inlier[clean].mean() > 0.9, "inliers wrongly rejected"

    def test_mono_edges_only(self, rng, jitted):
        cam, pw, obs, is2, _, valid, T_true, _ = make_problem(rng, noise_px=0.2, stereo_frac=0.0)
        ster = jnp.zeros(pw.shape[0], bool)
        T0 = se3.retract(T_true, jnp.asarray([0.0, 0.01, 0.0, 0.05, 0.0, -0.04], jnp.float32))
        res = jitted(T0, pw, obs, is2, ster, valid, cam)
        err = np.asarray(se3.log(se3.compose(res.Tcw, se3.inverse(T_true))))
        assert np.abs(err).max() < 5e-3, err

    def test_invalid_edges_ignored(self, rng, jitted):
        cam, pw, obs, is2, ster, valid, T_true, _ = make_problem(rng, noise_px=0.0, n=200)
        # corrupt half the observations but mark them invalid
        obs_np = np.array(obs)
        obs_np[100:] += 500.0
        valid = jnp.asarray(np.arange(200) < 100)
        T0 = se3.retract(T_true, jnp.asarray([0.01, 0.0, 0.0, 0.05, 0.02, 0.0], jnp.float32))
        res = jitted(T0, pw, jnp.asarray(obs_np), is2, ster, valid, cam)
        err = np.asarray(se3.log(se3.compose(res.Tcw, se3.inverse(T_true))))
        assert np.abs(err).max() < 1e-3, err
        assert int(res.n_inliers) <= 100

    def test_points_behind_camera_rejected(self, rng, jitted):
        cam, pw, obs, is2, ster, valid, T_true, _ = make_problem(rng, noise_px=0.1, n=150)
        pw_np = np.array(pw)
        pw_np[:10, 2] = -5.0  # behind camera
        res = jitted(T_true, jnp.asarray(pw_np), obs, is2, ster, valid, cam)
        inl = np.asarray(res.inlier)
        assert not inl[:10].any()
