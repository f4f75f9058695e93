#!/usr/bin/env python
"""Distributed bundle-adjustment scaling harness (BASELINE config 5).

Builds a merged-map-scale synthetic bundle (hundreds of keyframes, tens
of thousands of points, hundreds of thousands of observations), then
measures BA wall time per LM iteration at mesh sizes 1..N and reports
scaling efficiency. On this environment N>1 uses the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count); on a pod slice the
same code rides ICI.

Usage: python examples/bench_dist_ba.py [--devices 8] [--kfs 300]
       [--points 30000] [--obs-per-point 6] [--tpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--kfs", type=int, default=300)
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--obs-per-point", type=int, default=6)
    ap.add_argument("--tpu", action="store_true", help="run on the real chip(s)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from orbslam2_tpu.geometry import camera, se3
    from orbslam2_tpu.ops import ba
    from orbslam2_tpu.parallel import dist_ba
    from orbslam2_tpu.parallel.mesh import EDGE_AXIS

    rng = np.random.default_rng(0)
    K, P = args.kfs, args.points
    E = P * args.obs_per_point
    cam = camera.make_camera(458.0, 457.0, 376.0, 240.0, bf=47.9)

    # camera ring + points around it
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

    # each point observed by obs_per_point nearby cameras
    base_kf = (theta / (2 * np.pi) * K).astype(np.int32)
    offs = rng.integers(-3, 4, (P, args.obs_per_point))
    obs_kf = ((base_kf[:, None] + offs) % K).astype(np.int32).ravel()
    obs_pt = np.repeat(np.arange(P, dtype=np.int32), args.obs_per_point)
    pc = (
        np.einsum("eij,ej->ei", poses[obs_kf, :3, :3], points[obs_pt])
        + poses[obs_kf, :3, 3]
    )
    z = pc[:, 2]
    good = z > 1.0
    u = 458.0 * pc[:, 0] / np.maximum(z, 1.0) + 376.0
    v = 457.0 * pc[:, 1] / np.maximum(z, 1.0) + 240.0
    ur = u - 47.9 / np.maximum(z, 1.0)
    obs = np.stack([u, v, ur], 1).astype(np.float32)
    obs[:, :2] += rng.normal(0, 0.5, (E, 2))

    # perturb initial state
    dpose = rng.normal(0, 0.005, (K, 6)).astype(np.float32)
    dpose[0] = 0
    poses0 = np.asarray(se3.retract(jnp.asarray(poses), jnp.asarray(dpose)))
    points0 = points + rng.normal(0, 0.05, points.shape).astype(np.float32)

    prob = ba.BAProblem(
        poses=jnp.asarray(poses0),
        points=jnp.asarray(points0),
        obs_kf=jnp.asarray(obs_kf),
        obs_pt=jnp.asarray(obs_pt),
        obs=jnp.asarray(obs),
        inv_sigma2=jnp.ones(E, jnp.float32),
        is_stereo=jnp.ones(E, bool),
        edge_valid=jnp.asarray(good),
        pose_fixed=jnp.asarray(np.arange(K) == 0),
    )
    n_lm = 15  # 5 + 10 schedule
    print(f"bundle: K={K} P={P} E={E} | devices available: {len(jax.devices())}")

    pm = ba.coo_to_pm(prob, max_obs=args.obs_per_point + 1)
    results = {}
    sizes = [s for s in (1, 2, 4, args.devices) if s <= len(jax.devices())]
    for n in sorted(set(sizes)):
        mesh = Mesh(np.array(jax.devices()[:n]), (EDGE_AXIS,))
        pm_n = dist_ba.pad_points_to_multiple(pm, n)
        fn = dist_ba.make_distributed_ba_pm(mesh, cam)
        t0 = time.time()
        out = fn(pm_n)
        chi = float(out.final_chi2)  # value fetch = true sync
        compile_s = time.time() - t0
        t0 = time.time()
        chi = float(fn(pm_n).final_chi2)
        dt = time.time() - t0
        results[n] = dt
        print(
            f"  mesh={n}: {dt*1e3:.0f}ms total, {dt/n_lm*1e3:.1f}ms/LM-iter "
            f"(compile {compile_s:.0f}s, chi2 {chi:.3e})"
        )
    artifact = {
        "bundle": {"n_kfs": K, "n_points": P, "n_obs": E},
        "device": jax.devices()[0].platform,
        "n_lm_iters": n_lm,
        "mesh_sizes": {
            str(n): {
                "total_ms": round(dt * 1e3, 1),
                "ms_per_lm_iter": round(dt / n_lm * 1e3, 2),
            }
            for n, dt in results.items()
        },
    }
    if 1 in results and len(results) > 1:
        n_max = max(results)
        eff = results[1] / (results[n_max] * n_max)
        print(f"scaling efficiency at {n_max} devices: {eff*100:.0f}%")
        artifact["scaling_efficiency"] = {
            "devices": n_max, "efficiency": round(eff, 3)
        }
        if not args.tpu:
            note = (
                "virtual CPU-mesh devices share the same host cores, so"
                " this efficiency number measures collective overhead only —"
                " real scaling requires a pod slice (run with --tpu there)."
            )
            print("NOTE: " + note)
            artifact["caveat"] = note
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DIST_SCALING.json",
    )
    import json

    # merge under a per-platform key so the CPU-mesh scaling run and the
    # real-chip absolute-time run accumulate into one artifact
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged[artifact["device"]] = artifact
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"artifact written to {out_path}")


if __name__ == "__main__":
    main()
