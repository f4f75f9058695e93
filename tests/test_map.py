"""Map-store invariants: batched maintenance == per-point maintenance.

The batched descriptor/normal updates (slam/map.py) replaced the scalar
per-point loops on the hot paths; these tests pin their equivalence on
randomized multi-observation maps (reference semantics: MapPoint.cpp:224-289
distinctive descriptors, :341-399 normals/depth bands).
"""

import numpy as np
import pytest

from orbslam2_tpu.slam.map import SlamMap


class _FakeFrame:
    def __init__(self, rng, n):
        self.uv = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        self.octave = rng.integers(0, 8, n).astype(np.int32)
        self.desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
        self.u_right = np.where(rng.random(n) < 0.5, self.uv[:, 0] - 5, -1).astype(
            np.float32
        )
        self.depth = np.where(self.u_right >= 0, rng.uniform(1, 20, n), -1).astype(
            np.float32
        )
        self.valid = np.ones(n, bool)
        self.point_ids = np.full(n, -1, np.int64)
        self.frame_id = 0
        self.timestamp = 0.0


def _random_map(seed, n_kf=5, n_kp=64, n_pts=120):
    rng = np.random.default_rng(seed)
    m = SlamMap(n_kp)
    for k in range(n_kf):
        fr = _FakeFrame(rng, n_kp)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(0, 2, 3)
        m.add_keyframe(fr, T)
    pids = []
    for _ in range(n_pts):
        ref = int(rng.integers(0, n_kf))
        pid = m.add_point(rng.normal(0, 5, 3), ref, rng.integers(0, 2**16, 8))
        n_obs = int(rng.integers(1, n_kf + 1))
        for k in rng.choice(n_kf, n_obs, replace=False):
            idx = int(rng.integers(0, n_kp))
            m.add_observation(pid, int(k), idx)
        pids.append(pid)
    # tombstone one keyframe to exercise the invalid-kf filtering
    m.kf_valid.discard(n_kf - 1)
    return m, pids


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_descriptors_match_scalar(seed):
    m1, pids = _random_map(seed)
    m2, _ = _random_map(seed)
    for p in pids:
        m1.compute_distinctive_descriptor(p)
    m2.compute_distinctive_descriptors_batch(pids)
    for p in pids:
        np.testing.assert_array_equal(m1.pt_desc[p], m2.pt_desc[p])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_normals_match_scalar(seed):
    m1, pids = _random_map(seed)
    m2, _ = _random_map(seed)
    for p in pids:
        m1.update_normal_and_depth(p)
    m2.update_normals_batch(pids)
    for p in pids:
        np.testing.assert_allclose(m1.pt_normal[p], m2.pt_normal[p], atol=1e-12)
        np.testing.assert_allclose(m1.pt_max_dist[p], m2.pt_max_dist[p], rtol=1e-12)
        np.testing.assert_allclose(m1.pt_min_dist[p], m2.pt_min_dist[p], rtol=1e-12)
