#!/usr/bin/env python
"""A/B the stereo_match fetch idioms: table gather vs select chain,
row gather vs one-hot fetch."""

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
    print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.ops import hamming, matchers, orb

    N = M = 1200
    rng = np.random.default_rng(0)
    params = orb.OrbParams()
    sf = jnp.asarray(orb.scale_factors(params), jnp.float32)

    uvL = jnp.asarray(rng.uniform(16, 460, (N, 2)), jnp.float32)
    octL = jnp.asarray(rng.integers(0, 8, N), jnp.int32)
    descL = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint64), jnp.uint32)
    validL = jnp.ones(N, bool)
    uvR = jnp.asarray(rng.uniform(16, 460, (M, 2)), jnp.float32)
    octR = jnp.asarray(rng.integers(0, 8, M), jnp.int32)
    descR = jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint64), jnp.uint32)
    validR = jnp.ones(M, bool)

    def stereo_core(sf_lookup, fetch_u):
        th_orb = (hamming.TH_HIGH + hamming.TH_LOW) // 2
        max_d = 47.9 / 0.11
        dist = hamming.hamming_matrix(descL, descR)
        band = jnp.abs(uvR[:, 1][None, :] - uvL[:, 1][:, None]) <= 2.0 * sf_lookup()[:, None]
        octave_ok = jnp.abs(octR[None, :] - octL[:, None]) <= 1
        uL = uvL[:, 0][:, None]
        uR = uvR[:, 0][None, :]
        disp_ok = (uR >= uL - max_d) & (uR <= uL)
        mask = band & octave_ok & disp_ok
        best_idx, best_dist = hamming.masked_argmin(dist, mask)
        u_right = fetch_u(best_idx)
        disparity = uvL[:, 0] - u_right
        matched = (best_dist < th_orb) & (disparity >= 0.0) & (disparity < max_d)
        d_acc = jnp.where(matched, best_dist, hamming.MAX_DIST)
        n_acc = jnp.sum(matched)
        sorted_d = jnp.sort(d_acc)
        median = sorted_d[jnp.clip(n_acc // 2, 0, d_acc.shape[0] - 1)]
        keep = matched & (best_dist < 1.5 * 1.4 * median.astype(jnp.float32))
        return jnp.sum(keep), u_right

    @jax.jit
    def v_gather():
        return stereo_core(lambda: sf[octL], lambda bi: uvR[bi, 0])[0]

    @jax.jit
    def v_select_onehot():
        return stereo_core(
            lambda: matchers.lookup_level(sf, octL),
            lambda bi: matchers._fetch(matchers._choice_matrix(bi, M), uvR[:, 0]),
        )[0]

    @jax.jit
    def v_select_gather():
        return stereo_core(lambda: matchers.lookup_level(sf, octL), lambda bi: uvR[bi, 0])[0]

    @jax.jit
    def v_gather_onehot():
        return stereo_core(
            lambda: sf[octL],
            lambda bi: matchers._fetch(matchers._choice_matrix(bi, M), uvR[:, 0]),
        )[0]

    timeit(v_gather, (), name="stereo: table-gather + row-gather (old)")
    timeit(v_select_onehot, (), name="stereo: select-chain + one-hot (new)")
    timeit(v_select_gather, (), name="stereo: select-chain + row-gather")
    timeit(v_gather_onehot, (), name="stereo: table-gather + one-hot")


if __name__ == "__main__":
    main()
