#!/usr/bin/env python
"""Headline benchmark: stereo tracking front-end frames/s on one chip.

The reference's real-time budget is the 20 fps EuRoC inter-frame gap
(reference Examples/Stereo/stereo_euroc.cc:176-183, EuRoC.yaml:22) — its
driver sleeps whatever the ~50 ms/frame tracking loop leaves over. We
measure the per-frame device pipeline (full ORB extraction for both eyes
over the 8-level pyramid + stereo matching, EuRoC-sized 752x480 frames,
1200 features) and report frames/s; vs_baseline is the ratio to that
20 fps real-time budget.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method notes: dispatches are pipelined (async enqueue, one sync at the
end) so the number reflects device throughput rather than tunnel
round-trip latency. Synchronization is a VALUE fetch of a reduction of
the final dispatch's output — the device stream is in-order, so this
proves all N dispatches completed (`block_until_ready` does not reliably
synchronize over the tunnel transport). A persistent compilation cache
keeps warmup short on repeat runs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
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
        return f.uv, f.desc, sm.u_right, sm.depth, sm.valid

    # a few distinct EuRoC-sized frames, cycled
    frames = []
    for i, T in enumerate(world.trajectory(4, step=0.3)):
        imL, imR = world.render_stereo(T)
        frames.append(jnp.asarray(np.stack([imL, imR]), jnp.float32))

    @jax.jit
    def reduce_last(depth):
        return jnp.sum(depth)

    # warmup / compile both programs, force one value fetch
    out = frontend(frames[0])
    n_matches = int(np.asarray(out[4]).sum())
    _ = float(reduce_last(out[3]))

    # pipelined throughput: enqueue everything, then fetch a VALUE that
    # depends on the final dispatch (in-order stream => syncs all N)
    N = 240
    t0 = time.perf_counter()
    last = None
    for i in range(N):
        last = frontend(frames[i % len(frames)])[3]
    _ = float(reduce_last(last))
    dt = time.perf_counter() - t0
    fps = N / dt

    baseline_fps = 20.0  # reference real-time budget (EuRoC camera rate)
    print(
        json.dumps(
            {
                "metric": "stereo_frontend_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s (752x480 stereo, 1200 ORB features, 8 levels)",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )
    # context for humans reading logs (stderr keeps stdout to one line)
    print(
        f"# device={jax.devices()[0].platform} n_stereo_matches={n_matches} "
        f"wall={dt:.2f}s for {N} frames",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
