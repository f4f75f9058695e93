"""Interruptible bundle adjustment (reference mbAbortBA protocol,
src/LocalMapping.cpp:109-114; abort checks in Optimizer.cpp:426-787)."""

import numpy as np
import jax.numpy as jnp

from orbslam2_tpu.geometry import camera as camera_mod
from orbslam2_tpu.ops import ba


def _make_problem(rng, K=4, P=64, D=4, noise=2.0):
    cam = camera_mod.make_camera(450.0, 450.0, 320.0, 240.0, bf=45.0)
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(K):
        poses[k, :3, 3] = [0.15 * k, 0.0, 0.0]
    points = rng.uniform([-3, -2, 4], [3, 2, 12], (P, 3)).astype(np.float32)
    obs_kf = rng.integers(0, K, (P, D)).astype(np.int32)
    pc = (
        np.einsum("pdij,pj->pdi", poses[obs_kf][:, :, :3, :3], points)
        + poses[obs_kf][:, :, :3, 3]
    )
    z = np.maximum(pc[..., 2], 1.0)
    obs = np.stack(
        [
            450.0 * pc[..., 0] / z + 320.0,
            450.0 * pc[..., 1] / z + 240.0,
            450.0 * pc[..., 0] / z + 320.0 - 45.0 / z,
        ],
        axis=-1,
    ).astype(np.float32)
    obs += rng.normal(0, noise, obs.shape).astype(np.float32)
    prob = ba.BAProblemPM(
        poses=jnp.asarray(poses),
        points=jnp.asarray(points + rng.normal(0, 0.1, points.shape)),
        obs_kf=jnp.asarray(obs_kf),
        obs=jnp.asarray(obs),
        inv_sigma2=jnp.ones((P, D), jnp.float32),
        is_stereo=jnp.ones((P, D), bool),
        edge_valid=jnp.ones((P, D), bool),
        pose_fixed=jnp.asarray(np.arange(K) == 0),
    )
    return prob, cam


class TestInterruptibleBA:
    def test_uninterrupted_matches_fused(self, rng):
        """No abort => chunked schedule reaches the same quality as the
        fused jit (same LM algorithm, same iteration count)."""
        prob, cam = _make_problem(rng)
        res_fused = ba.ba_solve_pm_jit(prob, cam)
        res_chunk = ba.ba_solve_pm_interruptible(prob, cam)
        assert float(res_chunk.final_chi2) <= 1.2 * float(res_fused.final_chi2)
        np.testing.assert_allclose(
            np.asarray(res_chunk.points), np.asarray(res_fused.points),
            atol=5e-2,
        )

    def test_abort_immediately_returns_initial_estimate(self, rng):
        prob, cam = _make_problem(rng)
        res = ba.ba_solve_pm_interruptible(
            prob, cam, should_abort=lambda: True
        )
        # no LM iteration ran: estimate is the input (inliers still marked)
        np.testing.assert_allclose(
            np.asarray(res.points), np.asarray(prob.points), atol=1e-6
        )
        assert res.edge_inlier.shape == prob.edge_valid.shape

    def test_abort_mid_solve_returns_partial_progress(self, rng):
        prob, cam = _make_problem(rng)
        calls = {"n": 0}

        def abort_after_two_checks():
            calls["n"] += 1
            return calls["n"] > 2

        res_partial = ba.ba_solve_pm_interruptible(
            prob, cam, should_abort=abort_after_two_checks, sync_every=1
        )
        res_full = ba.ba_solve_pm_interruptible(prob, cam)
        chi_initial = float(
            ba.ba_pm_init_jit(prob, cam).F
        )
        chi_partial = float(res_partial.final_chi2)
        chi_full = float(res_full.final_chi2)
        # partial made progress over the initial estimate but the full
        # schedule does at least as well
        assert chi_partial < chi_initial
        assert chi_full <= chi_partial * 1.05

    def test_abort_latency_bounded_by_sync_every(self, rng):
        """should_abort is polled at least once per sync_every iterations."""
        prob, cam = _make_problem(rng)
        polls = {"n": 0}

        def count():
            polls["n"] += 1
            return False

        ba.ba_solve_pm_interruptible(
            prob, cam, should_abort=count, n_iters_first=5, n_iters_second=10,
            sync_every=1,
        )
        assert polls["n"] >= 15  # one check per iteration + phase checks
