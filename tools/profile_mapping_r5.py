#!/usr/bin/env python
"""Per-program device-time profile at bench shapes (r5).

Measures each hot jitted program's pure device time (pipelined dispatch,
one final value sync) and its synchronous wall time (dispatch + fetch =
what a worker stage actually pays over the tunnel). Decides where the
mapping-side chip time goes (VERDICT r4 task 4).
"""

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.slam.shapes import ShapePolicy
from orbslam2_tpu.slam.system import System
from orbslam2_tpu.vocab import train


def bench_fn(name, fn, n=12):
    """fn() -> device output. Returns (pipelined ms/call, sync ms/call)."""
    out = fn()
    jax.block_until_ready(out)
    # pipelined: enqueue n, force one value at the end
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(leaf)).ravel()[:1]
    dt_pipe = (time.perf_counter() - t0) / n * 1e3
    # synchronous: fetch every call
    t0 = time.perf_counter()
    for _ in range(4):
        out = fn()
        jax.device_get(out)
    dt_sync = (time.perf_counter() - t0) / 4 * 1e3
    print(f"{name:28s} device~{dt_pipe:8.2f} ms   sync {dt_sync:8.2f} ms",
          flush=True)
    return dt_pipe, dt_sync


def main():
    cfg = SlamConfig(
        camera=CameraConfig(bf=91.73, fps=20.0),
        orb=OrbConfig(n_features=1200),
        shapes=ShapePolicy(fixed=True),
    )
    rng = np.random.default_rng(0)
    voc = train.train_vocabulary(
        rng.integers(0, 256, (2048, 32)).astype(np.uint8), k=8, depth=3
    )
    sys_ = System(voc, cfg, threaded=False)
    sh = cfg.shapes
    N = cfg.orb.n_features
    key = jax.random.PRNGKey(0)

    feat = dict(
        desc=jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.int64).astype(np.uint32)),
        valid=jnp.asarray(np.ones(N, bool)),
        angle=jnp.asarray(rng.uniform(0, 6.28, N).astype(np.float32)),
        uv=jnp.asarray(rng.uniform(0, 400, (N, 2)).astype(np.float32)),
        octave=jnp.asarray(rng.integers(0, 8, N).astype(np.int32)),
        u_right=jnp.asarray(rng.uniform(-1, 300, N).astype(np.float32)),
    )
    images = rng.integers(0, 255, (2, 480, 752)).astype(np.uint8)

    # tracker fused step
    tr = sys_.tracker
    Pl = sh.bucket(512, 512, sh.local_cand_cap)
    full_args = (
        images, np.zeros((N, 3), np.float32), np.ones(N, bool),
        np.zeros((N, 8), np.uint32), feat["octave"], feat["angle"],
        np.full(N, -1, np.int32), np.eye(4, dtype=np.float32),
        np.float32(7.0), np.bool_(False), np.bool_(False),
        jnp.zeros((Pl, 3)), jnp.zeros((Pl, 8), jnp.uint32),
        jnp.zeros((Pl, 3)), jnp.zeros(Pl), jnp.ones(Pl),
        jnp.asarray(np.ones(Pl, bool)), np.float32(1.0),
    )
    bench_fn("tracker _full_step", lambda: tr._jit_full_step(*full_args))

    lm = sys_.local_mapper
    Kn = sh.bucket_select(2, 1, sh.neighbor_cap)
    epi_args = (
        feat["uv"], feat["desc"], np.ones(N, bool), feat["angle"],
        np.ones(N, bool), feat["u_right"], feat["u_right"], feat["octave"],
        (feat["uv"],) * Kn, (feat["octave"],) * Kn, (feat["desc"],) * Kn,
        (np.ones(N, bool),) * Kn, (feat["angle"],) * Kn,
        (np.ones(N, bool),) * Kn, (feat["u_right"],) * Kn,
        (feat["u_right"],) * Kn,
        (np.eye(3, dtype=np.float32),) * Kn, (np.zeros(2, np.float32),) * Kn,
        np.eye(4, dtype=np.float32), (np.eye(4, dtype=np.float32),) * Kn,
        np.eye(4, dtype=np.float32), (np.eye(4, dtype=np.float32),) * Kn,
        np.zeros(3, np.float32), (np.zeros(3, np.float32),) * Kn,
    )
    bench_fn("mapper epi_batch (10 nb)", lambda: lm._jit_epipolar_batch(*epi_args))

    Kt = sh.bucket_select(2, 1, sh.fuse_targets_cap)
    Ps = sh.bucket(256, 256, sh.fuse_src_cap)
    fuse_b_args = (
        (feat["uv"],) * Kt, (feat["octave"],) * Kt, (feat["u_right"],) * Kt,
        (feat["desc"],) * Kt, (feat["valid"],) * Kt,
        (np.zeros((Ps, 2), np.float32),) * Kt, (np.zeros(Ps, np.float32),) * Kt,
        (np.zeros(Ps, np.int32),) * Kt, np.zeros((Ps, 8), np.uint32),
        (np.ones(Ps, bool),) * Kt,
    )
    bench_fn("mapper fuse_batch (16 tg)", lambda: lm._jit_fuse_batch(*fuse_b_args))

    Pb = sh.bucket(256, 256, sh.fuse_pt_cap)
    fuse_s_args = (
        feat["uv"], feat["octave"], feat["u_right"], feat["desc"],
        feat["valid"],
        jnp.zeros((Pb, 2)), jnp.zeros(Pb), jnp.zeros(Pb, jnp.int32),
        jnp.zeros((Pb, 8), jnp.uint32), jnp.asarray(np.ones(Pb, bool)),
    )
    bench_fn("mapper fuse_single (4096)", lambda: lm._jit_fuse(*fuse_s_args))

    # BA tiers: one 5-iteration chunk (the solver's unit of work)
    from orbslam2_tpu.ops import ba as ba_mod

    cam = sys_.frontend.camera
    for K, P, D in sh.ba_tiers:
        prob = ba_mod.BAProblemPM(
            poses=jnp.tile(jnp.eye(4), (K, 1, 1)),
            points=jnp.asarray(rng.uniform(-5, 5, (P, 3)).astype(np.float32))
            .at[:, 2].add(10.0),
            obs_kf=jnp.asarray(rng.integers(0, K, (P, D)).astype(np.int32)),
            obs=jnp.asarray(rng.uniform(0, 400, (P, D, 3)).astype(np.float32)),
            inv_sigma2=jnp.ones((P, D)),
            is_stereo=jnp.asarray(np.ones((P, D), bool)),
            edge_valid=jnp.asarray(np.ones((P, D), bool)),
            pose_fixed=jnp.asarray(np.arange(K) == 0),
        )
        st = ba_mod.ba_pm_init_jit(prob, cam)
        jax.block_until_ready(st)
        bench_fn(
            f"ba_pm_step x5 ({K}x{P}x{D})",
            lambda prob=prob, st=st: ba_mod.ba_pm_step_jit(prob, cam, st, 5),
            n=6,
        )

    # loop-side: batched BoW match over 8 candidates
    lc = sys_.loop_closer
    Cb = sh.bucket_select(2, 2, 8)
    bench_fn("loop bow_batch (8 cand)", lambda: lc._jit_bow_batch(
        feat["desc"], feat["valid"], feat["angle"],
        (feat["desc"],) * Cb, (np.ones(N, bool),) * Cb,
        (feat["angle"],) * Cb,
    ))
    B = sh.bucket(256, 256, sh.sim3_cap)
    bench_fn("sim3 ransac (4096)", lambda: lc._jit_ransac(
        key, jnp.zeros((B, 3)).at[:, 2].set(5.0),
        jnp.zeros((B, 3)).at[:, 2].set(5.0),
        jnp.zeros((B, 2)), jnp.zeros((B, 2)), jnp.ones(B), jnp.ones(B),
        jnp.asarray(np.ones(B, bool)), cam, fix_scale=True,
    ), n=6)

    # frontend alone
    fe = sys_.frontend
    img32 = jnp.asarray(np.stack([images[0], images[1]]), jnp.float32)
    bench_fn("frontend _process", lambda: fe._process(img32))


if __name__ == "__main__":
    main()
