#!/usr/bin/env python
"""Profile the full per-frame pipeline on the real TPU chip.

Prints the per-stage timing report (reference System.cpp:244-258 analog)
plus per-frame latency percentiles — the evidence base for end-to-end
optimization (VERDICT r1 item 1/5)."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import numpy as np

    from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
    from orbslam2_tpu.datasets.synthetic import SyntheticWorld
    from orbslam2_tpu.slam.system import System

    threaded = "--threaded" in sys.argv
    n_frames = int(os.environ.get("FRAMES", "100"))
    world = SyntheticWorld(n_points=900, seed=7, baseline=0.2)
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=1200),
    )
    sys_ = System(None, cfg, enable_loop_closing=False, threaded=threaded)
    poses_gt, frames = world.render_sequence(n_frames, step=0.06)

    lat = []
    for i, (imL, imR) in enumerate(frames):
        t0 = time.perf_counter()
        sys_.track_stereo(imL, imR, i / 20.0)
        lat.append(time.perf_counter() - t0)
    sys_.wait_idle()
    report = sys_.shutdown()
    lat = np.asarray(lat[10:]) * 1e3
    print(report)
    print(
        f"\nper-frame ms (after warmup): median {np.median(lat):.1f} "
        f"p90 {np.percentile(lat, 90):.1f} mean {lat.mean():.1f} "
        f"-> {1e3 / np.median(lat):.1f} fps median "
        f"(threaded={threaded}, device={jax.devices()[0].platform})"
    )


if __name__ == "__main__":
    main()
