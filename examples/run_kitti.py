#!/usr/bin/env python
"""KITTI odometry stereo driver — the reference's Examples/Stereo/stereo_kitti.cc.

Usage (matching the reference's positional CLI, stereo_kitti.cc):

    python examples/run_kitti.py <vocabulary.npz|ORBvoc.txt> <settings.yaml> \
        <sequence_dir> [out_prefix]

`settings.yaml` is one of the reference's KITTI settings files
(Examples/Stereo/KITTI00-02.yaml / KITTI03.yaml / KITTI04-12.yaml — same
keys read here). `sequence_dir` holds image_0/ image_1/ times.txt.
KITTI frames are pre-rectified, so no remap stage runs. Writes the
KITTI-format trajectory (12 floats of [R|t] per line, reference
System.cpp:415-455) plus the TUM online/offline trajectories.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    if len(argv) < 4:
        print(__doc__)
        return 2
    voc_path, settings, seq_dir = argv[1:4]
    out_prefix = argv[4] if len(argv) > 4 else ""

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import numpy as np

    from orbslam2_tpu.datasets.kitti import KittiSequence
    from orbslam2_tpu.slam.system import Sensor, System

    system = System(voc_path, settings, Sensor.STEREO)
    seq = KittiSequence(seq_dir)
    print(f"images in sequence: {len(seq)}")

    track_times = []
    for i in range(len(seq)):
        imL, imR, t = seq[i]
        t0 = time.perf_counter()
        system.track_stereo(imL, imR, t)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        if i % 200 == 0:
            print(
                f"frame {i}: state={system.get_tracking_state().name} "
                f"kfs={system.map.n_keyframes()} pts={len(system.map.pt_valid)} "
                f"{1e3*dt:.0f}ms"
            )

    tt = np.array(track_times[5:])
    print(f"\nmean tracking time: {tt.mean()*1e3:.1f}ms  median: {np.median(tt)*1e3:.1f}ms")
    print(system.shutdown())
    system.save_trajectory_kitti(out_prefix + "CameraTrajectory.txt")
    system.save_trajectory_tum(out_prefix + "CameraTrajectoryTUM.txt")
    system.save_offline_trajectory_tum(out_prefix + "OfflineCameraTrajectory.txt")
    print("trajectories saved")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
