import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.geometry import camera, se3, sim3
from orbslam2_tpu.ops import posegraph, sim3solve


def _cam():
    return camera.make_camera(458.0, 457.0, 376.0, 240.0, bf=47.9, width=752, height=480)


class TestHorn:
    def test_exact_recovery(self, rng):
        R = np.asarray(se3.exp_so3(jnp.asarray([0.2, -0.4, 0.1])))
        t = np.array([0.5, -0.2, 0.8], np.float32)
        X2 = rng.uniform(-3, 3, (30, 3)).astype(np.float32)
        X1 = X2 @ R.T + t
        S = sim3solve.horn_sim3(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones(30), fix_scale=True
        )
        np.testing.assert_allclose(np.asarray(S.R), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(S.t), t, atol=1e-5)

    def test_scale_recovery(self, rng):
        R = np.asarray(se3.exp_so3(jnp.asarray([0.1, 0.3, -0.2])))
        X2 = rng.uniform(-3, 3, (40, 3)).astype(np.float32)
        X1 = 1.7 * (X2 @ R.T) + np.array([1.0, 0.0, -0.5], np.float32)
        S = sim3solve.horn_sim3(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones(40), fix_scale=False
        )
        assert abs(float(S.s) - 1.7) < 1e-3


class TestSim3Ransac:
    def test_with_outliers(self, rng):
        cam = _cam()
        n = 80
        R = np.asarray(se3.exp_so3(jnp.asarray([0.05, -0.1, 0.03])))
        t = np.array([0.4, 0.1, -0.2], np.float32)
        X2 = rng.uniform([-2, -2, 4], [2, 2, 15], (n, 3)).astype(np.float32)
        X1 = X2 @ R.T + t
        out_idx = rng.choice(n, 20, replace=False)
        X1_n = X1.copy()
        X1_n[out_idx] += rng.uniform(1, 3, (20, 3))
        uv1 = np.asarray(camera.project(cam, jnp.asarray(X1_n)))
        uv2 = np.asarray(camera.project(cam, jnp.asarray(X2)))
        maxe = np.full(n, 9.21, np.float32)
        res = jax.jit(sim3solve.sim3_ransac, static_argnames=("fix_scale", "n_hyp"))(
            jax.random.PRNGKey(0),
            jnp.asarray(X1_n), jnp.asarray(X2),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(maxe), jnp.asarray(maxe),
            jnp.ones(n, bool), cam,
        )
        assert int(res.n_inliers) >= 55
        np.testing.assert_allclose(np.asarray(res.S12.R), R, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.S12.t), t, atol=2e-2)

    def test_optimize_sim3_refines(self, rng):
        cam = _cam()
        n = 60
        R = np.asarray(se3.exp_so3(jnp.asarray([0.1, 0.05, -0.08])))
        t = np.array([0.3, -0.1, 0.2], np.float32)
        X2 = rng.uniform([-2, -2, 4], [2, 2, 15], (n, 3)).astype(np.float32)
        X1 = X2 @ R.T + t
        uv1 = np.asarray(camera.project(cam, jnp.asarray(X1)))
        uv2 = np.asarray(camera.project(cam, jnp.asarray(X2)))
        S0 = sim3.Sim3(
            R=jnp.asarray(np.asarray(se3.exp_so3(jnp.asarray([0.08, 0.07, -0.06])))),
            t=jnp.asarray(t + 0.1),
            s=jnp.asarray(1.0),
        )
        S, inl, n_inl = sim3solve.optimize_sim3(
            S0, jnp.asarray(X1), jnp.asarray(X2),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), cam,
        )
        assert int(n_inl) >= 55
        np.testing.assert_allclose(np.asarray(S.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(S.t), t, atol=5e-3)


class TestEssentialGraph:
    def test_loop_closure_corrects_drift(self, rng):
        """Odometry chain around a square with accumulated drift; a loop
        edge back to the start must pull the chain into shape."""
        K = 24
        # ground truth: poses around a circle (Twc); use Tcw convention
        gt = []
        for k in range(K):
            ang = 2 * np.pi * k / K
            c = np.array([np.cos(ang) * 5, 0.0, np.sin(ang) * 5])
            yaw = -ang
            Rwc = np.asarray(se3.exp_so3(jnp.asarray([0.0, yaw, 0.0])))
            Tcw = np.eye(4, dtype=np.float32)
            Tcw[:3, :3] = Rwc.T
            Tcw[:3, 3] = -Rwc.T @ c
            gt.append(Tcw)
        gt = np.stack(gt)

        # odometry measurements with a consistent small bias -> drift
        bias = np.array([0.002, -0.001, 0.003, 0.01, 0.005, -0.008], np.float32) * 4
        est = [gt[0]]
        meas_ij = []  # S_{k+1,k} measured
        for k in range(K - 1):
            T_rel = gt[k + 1] @ np.linalg.inv(gt[k])
            T_noisy = np.asarray(se3.exp(jnp.asarray(bias))) @ T_rel
            meas_ij.append(T_noisy)
            est.append(T_noisy @ est[-1])
        est = np.stack(est)
        drift = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        assert drift > 0.3  # drift is meaningful

        # vertices from drifted estimates; edges: chain + loop(K-1 -> 0)
        V = sim3.Sim3(
            R=jnp.asarray(est[:, :3, :3]),
            t=jnp.asarray(est[:, :3, 3]),
            s=jnp.ones(K),
        )
        ei, ej, meas_R, meas_t = [], [], [], []
        for k in range(K - 1):
            # edge (i=k, j=k+1), measurement Sji = S_{k+1} S_k^{-1}
            ei.append(k)
            ej.append(k + 1)
            m = np.linalg.inv(meas_ij[k])  # Sji as seen from j... careful
            meas_R.append(meas_ij[k][:3, :3])
            meas_t.append(meas_ij[k][:3, 3])
        # loop edge with TRUE relative transform (loop detection gives this)
        T_loop = gt[0] @ np.linalg.inv(gt[K - 1])
        ei.append(K - 1)
        ej.append(0)
        meas_R.append(T_loop[:3, :3])
        meas_t.append(T_loop[:3, 3])

        # residual convention: r = log(Sji ∘ Si ∘ Sj^-1), Sji maps i->j
        prob = posegraph.PoseGraphProblem(
            vertices=V,
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            meas=sim3.Sim3(
                R=jnp.asarray(np.stack(meas_R)),
                t=jnp.asarray(np.stack(meas_t)),
                s=jnp.ones(K),
            ),
            edge_valid=jnp.ones(K, bool),
            fixed=jnp.asarray(np.arange(K) == 0),
        )
        V_opt, F = posegraph.optimize_essential_graph(prob, n_iters=15)
        est_t = np.asarray(sim3.to_se3(V_opt))
        err_end = np.linalg.norm(est_t[-1][:3, 3] - gt[-1][:3, 3])
        assert err_end < 0.5 * drift, f"drift {drift:.3f} -> {err_end:.3f}"
