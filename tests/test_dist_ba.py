"""Distributed BA on the virtual 8-device CPU mesh: must agree with the
single-device solver and actually shard (SURVEY.md §7 step 10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import ba
from orbslam2_tpu.parallel import dist_ba, mesh as mesh_mod
from tests.test_ba import make_bundle


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
class TestDistributedBA:
    def test_matches_single_device(self, rng):
        cam, prob, poses_gt, points_gt, _ = make_bundle(rng, K=6, P=200, noise_px=0.3)
        mesh = mesh_mod.make_mesh()
        n = mesh.devices.size
        assert n == 8
        prob_p = dist_ba.pad_edges_to_multiple(prob, n)

        single = ba.ba_solve_jit(prob, cam)
        fn = dist_ba.make_distributed_ba(mesh, cam)
        dist = fn(prob_p)

        np.testing.assert_allclose(
            np.asarray(single.poses), np.asarray(dist.poses), atol=5e-4
        )
        pt_d = np.linalg.norm(
            np.asarray(single.points) - np.asarray(dist.points), axis=1
        )
        assert np.median(pt_d) < 1e-3

    def test_converges_from_noise(self, rng):
        cam, prob, poses_gt, points_gt, _ = make_bundle(rng, K=8, P=300, noise_px=0.2)
        from orbslam2_tpu.geometry import se3

        dpose = rng.normal(0, 0.01, (8, 6)).astype(np.float32)
        dpose[0] = 0
        poses0 = se3.retract(jnp.asarray(poses_gt), jnp.asarray(dpose))
        points0 = points_gt + rng.normal(0, 0.05, points_gt.shape).astype(np.float32)

        mesh = mesh_mod.make_mesh()
        prob_p = dist_ba.pad_edges_to_multiple(
            prob._replace(poses=poses0, points=jnp.asarray(points0)),
            mesh.devices.size,
        )
        fn = dist_ba.make_distributed_ba(mesh, cam)
        res = fn(prob_p)
        pose_err = np.asarray(
            se3.log(se3.compose(res.poses, se3.inverse(jnp.asarray(poses_gt))))
        )
        # 0.2px noise over an 8-camera chain: mm-level absolute error is the
        # expected optimum; the key property is matching the single solver.
        assert np.abs(pose_err).max() < 1e-2
        single = ba.ba_solve_jit(
            prob._replace(poses=poses0, points=jnp.asarray(points0)), cam
        )
        np.testing.assert_allclose(
            np.asarray(single.poses), np.asarray(res.poses), atol=1e-5
        )

    def test_edge_shards_placed(self, rng):
        """Edge inputs must actually be sharded over the mesh."""
        cam, prob, *_ = make_bundle(rng, K=4, P=100)
        mesh = mesh_mod.make_mesh()
        prob_p = dist_ba.pad_edges_to_multiple(prob, mesh.devices.size)
        sharded_obs = jax.device_put(prob_p.obs, mesh_mod.edge_sharded(mesh))
        assert len(sharded_obs.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
class TestDistributedBAPointMajor:
    def test_pm_sharded_matches_single(self, rng):
        """Point-major map-block sharding (the north-star decomposition)
        must agree with the single-device point-major solver."""
        cam, prob, poses_gt, points_gt, _ = make_bundle(rng, K=6, P=200, noise_px=0.3)
        pm = ba.coo_to_pm(prob)
        single = ba.ba_solve_pm_jit(pm, cam)
        mesh = mesh_mod.make_mesh()
        pm_p = dist_ba.pad_points_to_multiple(pm, mesh.devices.size)
        fn = dist_ba.make_distributed_ba_pm(mesh, cam)
        dist = fn(pm_p)
        np.testing.assert_allclose(
            np.asarray(single.poses), np.asarray(dist.poses), atol=5e-4
        )
        P = points_gt.shape[0]
        pt_d = np.linalg.norm(
            np.asarray(single.points)[:P] - np.asarray(dist.points)[:P], axis=1
        )
        assert np.median(pt_d) < 1e-3


def _drift_chain_graph(K=24):
    """Circle of K Sim3 vertices with biased odometry edges + one true
    loop edge — the same shape as the essential-graph correction the
    reference runs at loop closure (Optimizer.cpp:790-1052)."""
    from orbslam2_tpu.geometry import se3, sim3
    from orbslam2_tpu.ops import posegraph

    gt, est, meas_R, meas_t, ei, ej = [], [], [], [], [], []
    for k in range(K):
        ang = 2 * np.pi * k / K
        c = np.array([np.cos(ang) * 5, 0.0, np.sin(ang) * 5])
        Rwc = np.asarray(se3.exp_so3(jnp.asarray([0.0, -ang, 0.0])))
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = Rwc.T
        Tcw[:3, 3] = -Rwc.T @ c
        gt.append(Tcw)
    bias = np.array([0.002, -0.001, 0.003, 0.01, 0.005, -0.008], np.float32) * 4
    est = [gt[0]]
    for k in range(K - 1):
        T_rel = gt[k + 1] @ np.linalg.inv(gt[k])
        T_noisy = np.asarray(se3.exp(jnp.asarray(bias))) @ T_rel
        ei.append(k); ej.append(k + 1)
        meas_R.append(T_noisy[:3, :3]); meas_t.append(T_noisy[:3, 3])
        est.append(T_noisy @ est[-1])
    est = np.stack(est)
    T_loop = gt[0] @ np.linalg.inv(gt[K - 1])
    ei.append(K - 1); ej.append(0)
    meas_R.append(T_loop[:3, :3]); meas_t.append(T_loop[:3, 3])
    prob = posegraph.PoseGraphProblem(
        vertices=sim3.Sim3(
            R=jnp.asarray(est[:, :3, :3]), t=jnp.asarray(est[:, :3, 3]),
            s=jnp.ones(K),
        ),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        meas=sim3.Sim3(
            R=jnp.asarray(np.stack(meas_R)), t=jnp.asarray(np.stack(meas_t)),
            s=jnp.ones(K),
        ),
        edge_valid=jnp.ones(K, bool),
        fixed=jnp.asarray(np.arange(K) == 0),
    )
    return prob, np.stack(gt)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
class TestDistributedPoseGraph:
    def test_sharded_matches_single(self):
        """Sim3 edges sharded over the 8-device mesh: same optimum as the
        single-device essential-graph solver (north star: sharded GN over
        Sim3 edges with psum reductions)."""
        from orbslam2_tpu.geometry import sim3
        from orbslam2_tpu.ops import posegraph
        from orbslam2_tpu.parallel import dist_posegraph

        prob, gt = _drift_chain_graph(K=24)
        V_single, F_single = posegraph.optimize_essential_graph_jit(
            prob, n_iters=15
        )
        mesh = mesh_mod.make_mesh()
        prob_p = dist_posegraph.pad_graph_edges_to_multiple(
            prob, mesh.devices.size
        )
        fn = dist_posegraph.make_distributed_posegraph(mesh, n_iters=15)
        V_dist, F_dist = fn(prob_p)

        np.testing.assert_allclose(
            np.asarray(V_single.t), np.asarray(V_dist.t), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(V_single.R), np.asarray(V_dist.R), atol=1e-3
        )
        assert abs(float(F_single) - float(F_dist)) < 1e-3 * max(
            1.0, abs(float(F_single))
        )
        # and it actually corrected the drift
        est_t = np.asarray(sim3.to_se3(V_dist))
        drift0 = np.linalg.norm(
            np.asarray(sim3.to_se3(prob.vertices))[-1][:3, 3] - gt[-1][:3, 3]
        )
        err_end = np.linalg.norm(est_t[-1][:3, 3] - gt[-1][:3, 3])
        assert err_end < 0.5 * drift0
