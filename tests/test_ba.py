import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.geometry import camera, se3
from orbslam2_tpu.ops import ba


def make_bundle(rng, K=6, P=250, noise_px=0.3, outlier_frac=0.0):
    cam = camera.make_camera(458.0, 457.0, 376.0, 240.0, bf=47.9, width=752, height=480)
    # cameras along a line looking forward
    poses_gt = []
    for k in range(K):
        xi = np.array([0.0, 0.02 * k, 0.0, 0.25 * k, 0.01 * k, 0.0], np.float32)
        poses_gt.append(np.asarray(se3.exp(jnp.asarray(xi))))
    poses_gt = np.stack(poses_gt)
    points_gt = rng.uniform(low=[-6, -4, 5], high=[6, 4, 30], size=(P, 3)).astype(np.float32)

    obs_kf, obs_pt, obs, stereo = [], [], [], []
    for k in range(K):
        pc = points_gt @ poses_gt[k][:3, :3].T + poses_gt[k][:3, 3]
        uvr = np.array(camera.project_stereo(camera.Camera(
            cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, cam.width, cam.height), jnp.asarray(pc)))
        vis = (pc[:, 2] > 1) & (uvr[:, 0] > 0) & (uvr[:, 0] < 752) & (uvr[:, 1] > 0) & (uvr[:, 1] < 480)
        for p in np.nonzero(vis)[0]:
            obs_kf.append(k)
            obs_pt.append(p)
            o = uvr[p] + np.concatenate([rng.normal(0, noise_px, 2), [0.0]])
            o[2] = o[0] - cam.bf / pc[p, 2]
            obs.append(o)
            stereo.append(True)
    E = len(obs_kf)
    obs = np.array(obs, np.float32)
    n_out = int(outlier_frac * E)
    out_idx = rng.choice(E, n_out, replace=False)
    obs[out_idx, :2] += rng.uniform(20, 80, (n_out, 2))

    prob = ba.BAProblem(
        poses=jnp.asarray(poses_gt),
        points=jnp.asarray(points_gt),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs=jnp.asarray(obs),
        inv_sigma2=jnp.ones(E, jnp.float32),
        is_stereo=jnp.ones(E, bool),
        edge_valid=jnp.ones(E, bool),
        pose_fixed=jnp.asarray(np.arange(K) == 0),
    )
    return cam, prob, poses_gt, points_gt, out_idx


class TestBA:
    def test_recovers_from_perturbation(self, rng):
        cam, prob, poses_gt, points_gt, _ = make_bundle(rng, noise_px=0.0)
        K, P = poses_gt.shape[0], points_gt.shape[0]
        dpose = rng.normal(0, 0.01, (K, 6)).astype(np.float32)
        dpose[0] = 0
        poses0 = np.asarray(se3.retract(jnp.asarray(poses_gt), jnp.asarray(dpose)))
        points0 = points_gt + rng.normal(0, 0.05, (P, 3)).astype(np.float32)
        res = ba.ba_solve_jit(
            prob._replace(poses=jnp.asarray(poses0), points=jnp.asarray(points0)), cam
        )
        pose_err = np.asarray(se3.log(se3.compose(res.poses, se3.inverse(jnp.asarray(poses_gt)))))
        assert np.abs(pose_err).max() < 2e-3, np.abs(pose_err).max()
        pt_err = np.linalg.norm(np.asarray(res.points) - points_gt, axis=1)
        assert np.median(pt_err) < 5e-3

    def test_rejects_outlier_edges(self, rng):
        cam, prob, poses_gt, points_gt, out_idx = make_bundle(
            rng, noise_px=0.3, outlier_frac=0.1
        )
        res = ba.ba_solve_jit(prob, cam)
        inl = np.asarray(res.edge_inlier)
        assert inl[out_idx].mean() < 0.05
        clean = np.setdiff1d(np.arange(len(inl)), out_idx)
        assert inl[clean].mean() > 0.9

    def test_fixed_pose_unchanged(self, rng):
        cam, prob, poses_gt, points_gt, _ = make_bundle(rng, noise_px=0.5)
        res = ba.ba_solve_jit(prob, cam)
        np.testing.assert_allclose(
            np.asarray(res.poses)[0], poses_gt[0], atol=1e-6
        )

    def test_noise_reduction(self, rng):
        """BA from noisy points should beat the initial reprojection error."""
        cam, prob, poses_gt, points_gt, _ = make_bundle(rng, noise_px=0.5)
        points0 = points_gt + rng.normal(0, 0.3, points_gt.shape).astype(np.float32)
        prob0 = prob._replace(points=jnp.asarray(points0))
        e2_before, _ = ba.edge_chi2(prob0.poses, prob0.points, prob0, cam)
        res = ba.ba_solve_jit(prob0, cam)
        e2_after, _ = ba.edge_chi2(res.poses, res.points, prob0, cam)
        assert float(jnp.median(e2_after)) < 0.3 * float(jnp.median(e2_before))
