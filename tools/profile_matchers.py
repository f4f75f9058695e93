#!/usr/bin/env python
"""Time the per-frame matcher kernels on the real chip (N=M=1200)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=40, name=""):
    import jax
    import numpy as np

    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.ops import matchers, orb

    N = M = 1200
    rng = np.random.default_rng(0)
    params = orb.OrbParams()
    sf = jnp.asarray(orb.scale_factors(params), jnp.float32)

    def feats(n):
        return dict(
            uv=jnp.asarray(rng.uniform(16, 460, (n, 2)), jnp.float32),
            octv=jnp.asarray(rng.integers(0, 8, n), jnp.int32),
            desc=jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint64), jnp.uint32),
            valid=jnp.ones(n, bool),
            angle=jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32),
        )

    a, b = feats(N), feats(M)

    @jax.jit
    def stereo(a_uv, a_o, a_d, a_v, b_uv, b_o, b_d, b_v):
        return matchers.stereo_match(
            a_uv, a_o, a_d, a_v, b_uv, b_o, b_d, b_v, sf, bf=47.9, min_z=0.11
        ).valid

    timeit(stereo, (a["uv"], a["octv"], a["desc"], a["valid"],
                    b["uv"], b["octv"], b["desc"], b["valid"]),
           name="stereo_match")

    @jax.jit
    def proj_frame(a_, b_):
        pf, d = matchers.search_by_projection_frame(
            a_["uv"], a_["octv"], a_["desc"], a_["valid"], a_["angle"],
            b_["uv"], b_["octv"], b_["desc"], b_["valid"], b_["angle"],
            sf, th=7.0, forward=jnp.asarray(False), backward=jnp.asarray(False),
        )
        return pf

    timeit(proj_frame, (a, b), name="search_by_projection_frame")

    ur_a = jnp.asarray(rng.uniform(-1, 400, N), jnp.float32)
    ur_b = jnp.asarray(rng.uniform(0, 400, M), jnp.float32)
    level_b = jnp.asarray(rng.integers(0, 8, M), jnp.int32)
    view_cos = jnp.asarray(rng.uniform(0.9, 1.0, M), jnp.float32)
    isig = jnp.asarray(1.0 / orb.level_sigma2(params), jnp.float32)

    @jax.jit
    def proj_points(a_, b_):
        pf, d = matchers.search_by_projection_points(
            a_["uv"], a_["octv"], ur_a, a_["desc"], a_["valid"],
            b_["uv"], ur_b, level_b, view_cos, b_["desc"], b_["valid"],
            sf, th=1.0,
        )
        return pf

    timeit(proj_points, (a, b), name="search_by_projection_points")

    @jax.jit
    def fuse(a_, b_):
        out = matchers.fuse_match(
            a_["uv"], a_["octv"], ur_a, a_["desc"], a_["valid"],
            b_["uv"], ur_b, level_b, b_["desc"], b_["valid"],
            sf, isig, th=3.0,
        )
        return out[0]

    timeit(fuse, (a, b), name="fuse_match")


if __name__ == "__main__":
    main()
