import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import hamming, matchers, orb
from orbslam2_tpu.datasets.synthetic import SyntheticWorld


class TestHamming:
    def test_matches_numpy_popcount(self, rng):
        A = rng.integers(0, 2**32, size=(40, 8), dtype=np.uint32)
        B = rng.integers(0, 2**32, size=(60, 8), dtype=np.uint32)
        got = np.asarray(hamming.hamming_matrix(jnp.asarray(A), jnp.asarray(B)))
        want = np.zeros((40, 60), np.int32)
        for i in range(40):
            for j in range(60):
                want[i, j] = bin(
                    int.from_bytes(A[i].tobytes(), "little")
                    ^ int.from_bytes(B[j].tobytes(), "little")
                ).count("1")
        np.testing.assert_array_equal(got, want)

    def test_identical_zero(self, rng):
        A = rng.integers(0, 2**32, size=(10, 8), dtype=np.uint32)
        d = hamming.hamming_pair(jnp.asarray(A), jnp.asarray(A))
        assert np.all(np.asarray(d) == 0)

    def test_masked_two_smallest(self):
        dist = jnp.asarray([[5, 3, 9, 1]])
        mask = jnp.asarray([[True, True, True, False]])
        idx, best, second = hamming.masked_two_smallest(dist, mask)
        assert int(idx[0]) == 1 and int(best[0]) == 3 and int(second[0]) == 5


class TestRotationConsistency:
    def test_keeps_dominant_rotation(self, rng):
        n = 200
        # 90% of matches share rotation 0.5 rad; 10% are random outliers
        a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        b = a - 0.5
        outliers = rng.choice(n, 20, replace=False)
        b[outliers] = rng.uniform(0, 2 * np.pi, 20)
        valid = np.ones(n, bool)
        keep = np.asarray(
            matchers.rotation_consistency_mask(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid)
            )
        )
        inlier_mask = np.ones(n, bool)
        inlier_mask[outliers] = False
        assert keep[inlier_mask].mean() > 0.95
        assert keep[outliers].mean() < 0.35


class TestStereoMatch:
    @pytest.fixture(scope="class")
    def stereo_result(self):
        world = SyntheticWorld(n_points=500, seed=3, baseline=0.2)
        Tcw = world.trajectory(1)[0]
        imL, imR, id_map = world.render_stereo(Tcw, return_id_map=True)
        self.__class__.id_map = id_map
        params = orb.OrbParams(n_features=1000)
        feats = orb.extract_jit(jnp.stack([jnp.asarray(imL), jnp.asarray(imR)]), params)
        sf = jnp.asarray(orb.scale_factors(params), jnp.float32)
        sm = matchers.stereo_match(
            feats.uv[0], feats.octave[0], feats.desc[0], feats.valid[0],
            feats.uv[1], feats.octave[1], feats.desc[1], feats.valid[1],
            sf, bf=world.bf, min_z=world.baseline,
        )
        return world, Tcw, feats, sm

    def test_enough_matches(self, stereo_result):
        _, _, feats, sm = stereo_result
        n = int(np.sum(np.asarray(sm.valid)))
        assert n > 150, f"only {n} stereo matches"

    def test_depth_accuracy(self, stereo_result):
        world, Tcw, feats, sm = stereo_result
        uv = np.asarray(feats.uv[0])
        oct_ = np.asarray(feats.octave[0])
        depth = np.asarray(sm.depth)
        valid = np.asarray(sm.valid)
        id_map = self.id_map
        pc = world.points @ Tcw[:3, :3].T.astype(np.float64) + Tcw[:3, 3].astype(np.float64)
        z = pc[:, 2]
        errs = []
        # Keypoint coords are integer at their own pyramid level, so the
        # disparity carries ~0.5*scale(oct) px of quantization noise — the
        # reference fork has the same physics (no subpixel refinement,
        # src/Frame.cpp:538-673). Judge accuracy on the fine octaves.
        for i in np.nonzero(valid & (oct_ <= 2))[0]:
            u_i = min(max(int(round(uv[i, 0])), 0), world.width - 1)
            v_i = min(max(int(round(uv[i, 1])), 0), world.height - 1)
            sid = id_map[v_i, u_i]
            if sid >= 0:
                errs.append(abs(depth[i] - z[sid]) / z[sid])
        errs = np.array(errs)
        assert len(errs) > 100
        assert np.median(errs) < 0.09, f"median rel depth err {np.median(errs)}"

    def test_unmatched_marked(self, stereo_result):
        _, _, _, sm = stereo_result
        ur = np.asarray(sm.u_right)
        valid = np.asarray(sm.valid)
        assert np.all(ur[~valid] == -1.0)
        assert np.all(np.asarray(sm.depth)[~valid] == -1.0)


class TestProjectionMatch:
    def test_self_projection_recovers_identity(self, rng):
        """Project a frame's own keypoints: each point should match itself."""
        world = SyntheticWorld(n_points=300, seed=5, width=320, height=240)
        Tcw = world.trajectory(1)[0]
        imL, _ = world.render_stereo(Tcw)
        params = orb.OrbParams(n_features=400, n_levels=4)
        feats = orb.extract_jit(jnp.asarray(imL)[None], params)
        sf = jnp.asarray(orb.scale_factors(params), jnp.float32)

        uv = feats.uv[0]
        n = uv.shape[0]
        point_for_kp, dists = matchers.search_by_projection_frame(
            uv, feats.octave[0], feats.desc[0], feats.valid[0], feats.angle[0],
            uv, feats.octave[0], feats.desc[0], feats.valid[0], feats.angle[0],
            sf, th=7.0,
            forward=jnp.asarray(False), backward=jnp.asarray(False),
        )
        pfk = np.asarray(point_for_kp)
        valid = np.asarray(feats.valid[0])
        matched = pfk >= 0
        assert matched[valid].mean() > 0.9
        # self-match: kp i should map to point i
        idx = np.nonzero(matched & valid)[0]
        assert np.mean(pfk[idx] == idx) > 0.95
