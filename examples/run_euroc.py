#!/usr/bin/env python
"""EuRoC stereo driver — the reference's Examples/Stereo/stereo_euroc.cc.

Usage (matching the reference's positional CLI, stereo_euroc.cc:43-47):

    python examples/run_euroc.py <vocabulary.npz|ORBvoc.txt> <settings.yaml> \
        <mav0/cam0/data> <mav0/cam1/data> <timestamps.txt> [out_prefix]

The settings YAML is the reference's own EuRoC.yaml (same keys, including
the LEFT./RIGHT. rectification blocks). Writes CameraTrajectory.txt and
OfflineCameraTrajectory.txt in the reference's TUM format and prints the
per-stage timing report at shutdown.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    if len(argv) < 6:
        print(__doc__)
        return 2
    voc_path, settings, left_dir, right_dir, times_file = argv[1:6]
    out_prefix = argv[6] if len(argv) > 6 else ""

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import numpy as np

    from orbslam2_tpu.datasets.euroc import EurocSequence
    from orbslam2_tpu.slam.system import Sensor, System

    system = System(voc_path, settings, Sensor.STEREO)
    seq = EurocSequence(left_dir, right_dir, times_file, system.config)
    print(f"images in sequence: {len(seq)}")

    track_times = []
    for i in range(len(seq)):
        imL, imR, t = seq[i]
        t0 = time.perf_counter()
        system.track_stereo(imL, imR, t)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        # (the reference sleeps any slack to pace at camera rate,
        # stereo_euroc.cc:176-183; batch evaluation runs unpaced)
        if i % 200 == 0:
            print(
                f"frame {i}: state={system.get_tracking_state().name} "
                f"kfs={system.map.n_keyframes()} pts={len(system.map.pt_valid)} "
                f"{1e3*dt:.0f}ms"
            )

    tt = np.array(track_times[5:])
    print(f"\nmean tracking time: {tt.mean()*1e3:.1f}ms  median: {np.median(tt)*1e3:.1f}ms")
    print(system.shutdown())
    system.save_trajectory_tum(out_prefix + "CameraTrajectory.txt")
    system.save_offline_trajectory_tum(out_prefix + "OfflineCameraTrajectory.txt")
    system.save_keyframe_trajectory_tum(out_prefix + "KeyFrameTrajectory.txt")
    print("trajectories saved")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
