#!/usr/bin/env python
"""BA per-iteration cost on the real chip + pose-gather lowering A/B.

Builds synthetic bundles at local-BA scale (32 KFs / 4k pts / 16k obs)
and merged-map scale (256 KFs / 33k pts / 197k obs), times ba_solve_pm,
and A/Bs the per-edge pose gather (poses[obs_kf]) against a one-hot
matmul formulation. Timing: enqueue N, fetch one final VALUE.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=20, name=""):
    import jax
    import numpy as np

    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def build(K, P, D, rng):
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.geometry import camera, se3
    from orbslam2_tpu.ops import ba

    cam = camera.make_camera(458.0, 457.0, 376.0, 240.0, bf=47.9)
    poses = np.zeros((K, 4, 4), np.float32)
    for k in range(K):
        a = 2 * np.pi * k / K
        R = np.asarray(se3.exp_so3(jnp.asarray([0.0, -a, 0.0], jnp.float32)))
        c = np.array([np.sin(a) * 8, 0.2 * np.sin(5 * a), np.cos(a) * 8])
        poses[k, :3, :3] = R.T
        poses[k, :3, 3] = -R.T @ c
        poses[k, 3, 3] = 1
    theta = rng.uniform(0, 2 * np.pi, P)
    rr = rng.uniform(14, 20, P)
    points = np.stack(
        [rr * np.sin(theta), rng.uniform(-3, 3, P), rr * np.cos(theta)], 1
    ).astype(np.float32)
    base_kf = (theta / (2 * np.pi) * K).astype(np.int32)
    offs = rng.integers(-(D // 2), D - D // 2, (P, D))
    obs_kf = ((base_kf[:, None] + offs) % K).astype(np.int32)
    pc = (
        np.einsum("pdij,pj->pdi", poses[obs_kf][..., :3, :3], points)
        + poses[obs_kf][..., :3, 3]
    )
    z = np.maximum(pc[..., 2], 1.0)
    u = 458.0 * pc[..., 0] / z + 376.0
    v = 457.0 * pc[..., 1] / z + 240.0
    ur = u - 47.9 / z
    obs = np.stack([u, v, ur], -1).astype(np.float32)
    prob = ba.BAProblemPM(
        poses=jnp.asarray(poses),
        points=jnp.asarray(points + rng.normal(0, 0.05, points.shape).astype(np.float32)),
        obs_kf=jnp.asarray(obs_kf),
        obs=jnp.asarray(obs),
        inv_sigma2=jnp.ones((P, D), jnp.float32),
        is_stereo=jnp.ones((P, D), bool),
        edge_valid=jnp.asarray(pc[..., 2] > 1.0),
        pose_fixed=jnp.asarray(np.arange(K) == 0),
    )
    return prob, cam


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import functools
    import json

    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.ops import ba

    artifact = {"device": jax.devices()[0].platform, "scales": {}}
    rng = np.random.default_rng(0)
    for tag, K, P, D in (("local", 32, 4096, 4), ("merged", 256, 32768, 8)):
        prob, cam = build(K, P, D, rng)

        solve = jax.jit(functools.partial(
            ba.ba_solve_pm, n_iters_first=5, n_iters_second=10, n_cg=20))
        dt = timeit(lambda p: solve(p, cam), (prob,), n=5,
                    name=f"[{tag}] ba_solve_pm 15 LM iters")
        print(f"    -> {dt/15*1e3:.2f} ms/LM-iter", flush=True)
        n_edges = int(np.asarray(prob.edge_valid).sum())
        artifact["scales"][tag] = {
            "n_kfs": K, "n_points": P, "max_obs": D, "n_edges": n_edges,
            "solve_ms_15_lm_iters": round(dt * 1e3, 3),
            "ms_per_lm_iter": round(dt / 15 * 1e3, 3),
            # each LM iteration runs 20 preconditioned-CG steps
            "ms_per_cg_step": round(dt / (15 * 20) * 1e3, 4),
        }

        # edge-terms A/B: gather vs one-hot pose fetch
        @jax.jit
        def terms_gather(poses, points, prob):
            r, Jc, Jp, comp, dok = ba._pm_edge_terms(poses, points, prob, cam)
            return jnp.sum(r), jnp.sum(Jc)

        timeit(terms_gather, (prob.poses, prob.points, prob),
               name=f"[{tag}] edge terms (pose gather)")

        @jax.jit
        def terms_onehot(poses, points, prob):
            Pp, Dd = prob.obs_kf.shape
            oh = jax.nn.one_hot(prob.obs_kf.reshape(-1), K, dtype=jnp.float32)
            T = jax.lax.dot_general(
                oh, poses.reshape(K, 16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(Pp, Dd, 4, 4)
            prob2 = prob
            # replicate _pm_edge_terms body with T precomputed
            from orbslam2_tpu.geometry import se3 as se3m
            R = T[..., :3, :3]
            pc = jnp.einsum("pdij,pj->pdi", R, points,
                            precision=jax.lax.Precision.HIGHEST) + T[..., :3, 3]
            x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
            zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
            inv_z = 1.0 / zs
            u = cam.fx * x * inv_z + cam.cx
            return jnp.sum(u), jnp.sum(pc)

        timeit(terms_onehot, (prob.poses, prob.points, prob),
               name=f"[{tag}] edge terms (one-hot poses)")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BA_PROFILE.json",
    )
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"artifact written to {out}")


if __name__ == "__main__":
    main()
