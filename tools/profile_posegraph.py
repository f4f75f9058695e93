#!/usr/bin/env python
"""Time optimize_essential_graph on the real chip at realistic scales."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.geometry import se3, sim3
    from orbslam2_tpu.ops import posegraph

    for K, cov_step in ((256, 5), (1024, 7)):
        rng = np.random.default_rng(0)
        # ground-truth ring of keyframes
        Rk = np.zeros((K, 3, 3), np.float32)
        tk = np.zeros((K, 3), np.float32)
        for k in range(K):
            a = 2 * np.pi * k / K
            Rk[k] = np.asarray(se3.exp_so3(jnp.asarray([0.0, a, 0.0], jnp.float32)))
            tk[k] = [np.sin(a) * 10, 0, np.cos(a) * 10]
        V_gt = sim3.Sim3(R=jnp.asarray(Rk), t=jnp.asarray(tk), s=jnp.ones(K))

        # edges: sequential chain + covisibility skips + one loop edge
        ei, ej = [], []
        for k in range(K - 1):
            ei.append(k + 1); ej.append(k)
        for k in range(0, K - cov_step, cov_step):
            ei.append(k + cov_step); ej.append(k)
        for k in range(0, K - 17, 13):
            ei.append(k + 17); ej.append(k)
        ei.append(K - 1); ej.append(0)
        E = len(ei)
        ei = jnp.asarray(np.array(ei, np.int32))
        ej = jnp.asarray(np.array(ej, np.int32))

        def at(S, idx):
            return sim3.Sim3(R=S.R[idx], t=S.t[idx], s=S.s[idx])

        meas = jax.vmap(lambda a, b: sim3.compose(a, sim3.inverse(b)))(
            at(V_gt, ei), at(V_gt, ej)
        )
        # drifted initial vertices
        noise = rng.normal(0, 0.02, (K, 7)).astype(np.float32)
        noise[0] = 0
        noise[:, 6] = 0
        V0 = sim3.retract(V_gt, jnp.asarray(np.cumsum(noise, axis=0) * 0.2))

        prob = posegraph.PoseGraphProblem(
            vertices=V0, edge_i=ei, edge_j=ej, meas=meas,
            edge_valid=jnp.ones(E, bool),
            fixed=jnp.asarray(np.arange(K) == 0),
        )
        fn = jax.jit(lambda p: posegraph.optimize_essential_graph(p, n_iters=20, n_cg=50))
        out = fn(prob)
        F = float(out[1])
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = fn(prob)
        F = float(out[1])
        dt = (time.perf_counter() - t0) / n
        print(f"K={K} E={E}: {dt*1e3:.1f} ms for 20 GN iters (final F {F:.3e})",
              flush=True)


if __name__ == "__main__":
    main()
