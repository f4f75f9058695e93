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
