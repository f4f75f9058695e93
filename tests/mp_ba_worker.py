"""Worker process for the multi-host distributed-BA test.

Launched by tests/test_multihost.py as N separate OS processes joined by
a localhost coordinator (`jax.distributed`), each exposing 2 virtual CPU
devices — a faithful stand-in for the N-host × chips-per-host topology
(BASELINE config 5) that exercises the real multi-controller code path:
global mesh over non-addressable devices, per-process shard
materialization, cross-process collectives.

Usage: python mp_ba_worker.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys


def build_bundle(seed: int = 0, K: int = 6, P: int = 96, E: int = 384):
    """Deterministic synthetic bundle (same on every process)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    fx, fy, cx, cy, bf = 458.0, 457.0, 376.0, 240.0, 47.9
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(K):
        poses[k, :3, 3] = [0.25 * k, 0.0, 0.0]
    points = rng.uniform([-3, -2, 4], [3, 2, 15], (P, 3)).astype(np.float32)
    obs_kf = rng.integers(0, K, E).astype(np.int32)
    obs_pt = rng.integers(0, P, E).astype(np.int32)
    pc = (
        np.einsum("eij,ej->ei", poses[obs_kf, :3, :3], points[obs_pt])
        + poses[obs_kf, :3, 3]
    )
    z = np.maximum(pc[:, 2], 1.0)
    noise = rng.normal(0, 0.3, (E, 3)).astype(np.float32)
    obs = np.stack(
        [
            fx * pc[:, 0] / z + cx,
            fy * pc[:, 1] / z + cy,
            fx * pc[:, 0] / z + cx - bf / z,
        ],
        axis=1,
    ).astype(np.float32) + noise
    return (fx, fy, cx, cy, bf), poses, points, obs_kf, obs_pt, obs


def build_posegraph(K: int = 16):
    """Drifted ring of Sim3 vertices + one true loop edge (numpy-built,
    identical on every process)."""
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.geometry import sim3
    from orbslam2_tpu.ops import posegraph

    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array(
            [[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32
        )

    gt, ei, ej, meas_R, meas_t = [], [], [], [], []
    for k in range(K):
        ang = 2 * np.pi * k / K
        c = np.array([np.cos(ang) * 4, 0.0, np.sin(ang) * 4])
        Rwc = rot_y(-ang)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ c
        gt.append(T)
    drift = np.eye(4, dtype=np.float32)
    drift[:3, 3] = [0.02, -0.01, 0.015]
    est = [gt[0]]
    for k in range(K - 1):
        T_rel = gt[k + 1] @ np.linalg.inv(gt[k])
        T_noisy = drift @ T_rel
        ei.append(k); ej.append(k + 1)
        meas_R.append(T_noisy[:3, :3]); meas_t.append(T_noisy[:3, 3])
        est.append(T_noisy @ est[-1])
    T_loop = gt[0] @ np.linalg.inv(gt[K - 1])
    ei.append(K - 1); ej.append(0)
    meas_R.append(T_loop[:3, :3]); meas_t.append(T_loop[:3, 3])
    est = np.stack(est)
    return posegraph.PoseGraphProblem(
        vertices=sim3.Sim3(
            R=jnp.asarray(est[:, :3, :3]), t=jnp.asarray(est[:, :3, 3]),
            s=jnp.ones(K),
        ),
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


def solve_single_process():
    """Reference result: same bundle, single process, local 2-device mesh."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from orbslam2_tpu.geometry import camera
    from orbslam2_tpu.ops import ba
    from orbslam2_tpu.parallel import dist_ba
    from orbslam2_tpu.parallel.mesh import EDGE_AXIS

    (fx, fy, cx, cy, bf), poses, points, obs_kf, obs_pt, obs = build_bundle()
    cam = camera.make_camera(fx, fy, cx, cy, bf=bf)
    prob = ba.BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(points),
        obs_kf=jnp.asarray(obs_kf), obs_pt=jnp.asarray(obs_pt),
        obs=jnp.asarray(obs),
        inv_sigma2=jnp.ones(obs.shape[0], jnp.float32),
        is_stereo=jnp.ones(obs.shape[0], bool),
        edge_valid=jnp.ones(obs.shape[0], bool),
        pose_fixed=jnp.asarray(np.arange(poses.shape[0]) == 0),
    )
    pm = dist_ba.pad_points_to_multiple(ba.coo_to_pm(prob, max_obs=8), 4)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:1]), (EDGE_AXIS,))
    step = dist_ba.make_distributed_ba_pm(
        mesh, cam, n_iters_first=3, n_iters_second=5, n_cg=12
    )
    res = step(jax.device_get(pm))

    from orbslam2_tpu.ops import posegraph
    from orbslam2_tpu.parallel import dist_posegraph

    pg = dist_posegraph.pad_graph_edges_to_multiple(build_posegraph(), 4)
    V, err = posegraph.optimize_essential_graph_jit(pg, n_iters=10)
    return (
        np.asarray(res.poses), float(res.final_chi2),
        np.asarray(V.t), float(err),
    )


def main():
    pid, nproc, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from orbslam2_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from orbslam2_tpu.geometry import camera
    from orbslam2_tpu.ops import ba
    from orbslam2_tpu.parallel import dist_ba
    from orbslam2_tpu.parallel.mesh import EDGE_AXIS

    (fx, fy, cx, cy, bf), poses, points, obs_kf, obs_pt, obs = build_bundle()
    cam = camera.make_camera(fx, fy, cx, cy, bf=bf)

    # assemble point-major on host (numpy), then shard point rows globally
    import jax.numpy as jnp

    prob = ba.BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(points),
        obs_kf=jnp.asarray(obs_kf), obs_pt=jnp.asarray(obs_pt),
        obs=jnp.asarray(obs),
        inv_sigma2=jnp.ones(obs.shape[0], jnp.float32),
        is_stereo=jnp.ones(obs.shape[0], bool),
        edge_valid=jnp.ones(obs.shape[0], bool),
        pose_fixed=jnp.asarray(np.arange(poses.shape[0]) == 0),
    )
    pm = jax.device_get(
        dist_ba.pad_points_to_multiple(
            ba.coo_to_pm(prob, max_obs=8), 2 * nproc
        )
    )

    mesh = multihost.global_mesh()
    pt, rep = P(EDGE_AXIS), P()
    specs = ba.BAProblemPM(
        poses=rep, points=pt, obs_kf=pt, obs=pt, inv_sigma2=pt,
        is_stereo=pt, edge_valid=pt, pose_fixed=rep,
    )
    pm_g = multihost.put_global(pm, specs, mesh)

    step = dist_ba.make_distributed_ba_pm(
        mesh, cam, n_iters_first=3, n_iters_second=5, n_cg=12
    )
    res = step(pm_g)
    poses_out = multihost.fetch_replicated(res.poses)
    chi2 = float(multihost.fetch_replicated(res.final_chi2))

    # distributed Sim3 pose graph across the same process group
    from orbslam2_tpu.geometry import sim3
    from orbslam2_tpu.ops import posegraph
    from orbslam2_tpu.parallel import dist_posegraph

    pg = build_posegraph()
    pg = jax.device_get(
        dist_posegraph.pad_graph_edges_to_multiple(pg, 2 * nproc)
    )
    pg_specs = posegraph.PoseGraphProblem(
        vertices=sim3.Sim3(R=rep, t=rep, s=rep),
        edge_i=pt, edge_j=pt,
        meas=sim3.Sim3(R=pt, t=pt, s=pt),
        edge_valid=pt, fixed=rep,
    )
    pg_g = multihost.put_global(pg, pg_specs, mesh)
    step_pg = dist_posegraph.make_distributed_posegraph(mesh, n_iters=10)
    V, err = step_pg(pg_g)
    pg_t = multihost.fetch_replicated(V.t)
    pg_err = float(multihost.fetch_replicated(err))

    if pid == 0:
        np.savez(out, poses=poses_out, chi2=chi2, pg_t=pg_t, pg_err=pg_err)
    print(f"[proc {pid}] chi2={chi2:.6f} pg_err={pg_err:.6f} OK", flush=True)


if __name__ == "__main__":
    main()
