#!/usr/bin/env python
"""Decisive sync check: is the frontend really 15.5 ms/frame?

Times N frontend calls three ways:
  A) block_until_ready on the list of outputs (bench.py's method)
  B) final scalar VALUE fetch only
  C) per-call scalar value fetch (fully serialized, upper bound)
"""

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

    from orbslam2_tpu.datasets.synthetic import SyntheticWorld
    from orbslam2_tpu.ops import matchers, orb

    params = orb.OrbParams(n_features=1200, n_levels=8)
    sf = jnp.asarray(orb.scale_factors(params), jnp.float32)
    world = SyntheticWorld(n_points=700, seed=2)

    @jax.jit
    def frontend(images):
        f = orb.extract(images, params)
        sm = matchers.stereo_match(
            f.uv[0], f.octave[0], f.desc[0], f.valid[0],
            f.uv[1], f.octave[1], f.desc[1], f.valid[1],
            sf, bf=world.bf, min_z=world.baseline,
        )
        # scalar handle for value-forced sync
        return jnp.sum(sm.valid), f.uv, f.desc

    frames = []
    for i, T in enumerate(world.trajectory(4, step=0.3)):
        imL, imR = world.render_stereo(T)
        frames.append(jnp.asarray(np.stack([imL, imR]), jnp.float32))

    out = frontend(frames[0])
    print("warmup n_matches:", int(out[0]), flush=True)

    N = 30
    # A) block_until_ready list
    t0 = time.perf_counter()
    outs = [frontend(frames[i % 4]) for i in range(N)]
    jax.block_until_ready(outs)
    dtA = (time.perf_counter() - t0) / N
    print(f"A block_until_ready(list): {dtA*1e3:8.2f} ms/frame", flush=True)

    # B) final value fetch
    t0 = time.perf_counter()
    outs = [frontend(frames[i % 4]) for i in range(N)]
    _ = int(outs[-1][0])
    dtB = (time.perf_counter() - t0) / N
    print(f"B final value fetch:       {dtB*1e3:8.2f} ms/frame", flush=True)

    # B2) fetch EVERY scalar after enqueueing all
    t0 = time.perf_counter()
    outs = [frontend(frames[i % 4]) for i in range(N)]
    _ = [int(o[0]) for o in outs]
    dtB2 = (time.perf_counter() - t0) / N
    print(f"B2 all value fetches:      {dtB2*1e3:8.2f} ms/frame", flush=True)

    # C) serialized per-call fetch
    t0 = time.perf_counter()
    for i in range(N):
        _ = int(frontend(frames[i % 4])[0])
    dtC = (time.perf_counter() - t0) / N
    print(f"C per-call value fetch:    {dtC*1e3:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
