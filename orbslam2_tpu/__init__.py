"""orbslam2_tpu — a TPU-native stereo/monocular visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ORB-SLAM2 fork `Luigi940260/orb-slam2-optimized` (reference mounted at
/root/reference): FAST+ORB feature extraction over an image pyramid,
Hamming-distance matching, DBoW2-style place recognition, EPnP/MLPnP
RANSAC relocalization, Sim3 loop closing and Schur-complement bundle
adjustment — all expressed as batched, statically-shaped device kernels
orchestrated by a thin host runtime, and sharded over `jax.sharding`
meshes for multi-chip scaling.

Architecture stance (vs. the reference's C++ thread/pointer design):
  * map state is struct-of-arrays with fixed capacities + validity masks,
    not an object graph behind mutexes;
  * every RANSAC loop is hypothesis-parallel (batched solve + argmax);
  * the thread pipeline (Tracking / LocalMapping / LoopClosing threads,
    reference src/System.cpp:63-77) becomes host-sequenced device stages
    with staged two-phase write-backs for the asynchronous optimizations.
"""

__version__ = "0.1.0"
