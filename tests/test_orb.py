import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import fast, orb
from orbslam2_tpu.datasets.synthetic import SyntheticWorld


def _square_image(h=128, w=160):
    """Gray image with a bright square — 4 strong corners."""
    img = np.full((h, w), 100.0, np.float32)
    img[40:80, 50:100] = 220.0
    return img


class TestFast:
    def test_corner_detected_on_square(self):
        img = _square_image()
        score = np.asarray(fast.fast_score(jnp.asarray(img)[None]))[0]
        nms = np.asarray(fast.nms3(jnp.asarray(score)[None]))[0]
        ys, xs = np.nonzero(nms & (score > 20))
        corners = np.array([[40, 50], [40, 99], [79, 50], [79, 99]])
        for cy, cx in corners:
            d = np.min(np.abs(ys - cy) + np.abs(xs - cx)) if len(ys) else 1e9
            assert d <= 2, f"corner ({cy},{cx}) missed (nearest d={d})"

    def test_flat_image_no_corners(self):
        img = jnp.full((1, 64, 64), 120.0)
        score = fast.fast_score(img)
        assert float(jnp.max(score)) == 0.0

    def test_score_monotone_in_contrast(self):
        img1 = _square_image()
        img2 = np.full_like(img1, 100.0)
        img2[40:80, 50:100] = 140.0  # weaker contrast
        s1 = float(jnp.max(fast.fast_score(jnp.asarray(img1)[None])))
        s2 = float(jnp.max(fast.fast_score(jnp.asarray(img2)[None])))
        assert s1 > s2 > 0


class TestOrbExtract:
    @pytest.fixture(scope="class")
    def world_frame(self):
        world = SyntheticWorld(n_points=300, width=320, height=240)
        Tcw = world.trajectory(1)[0]
        imL, imR = world.render_stereo(Tcw)
        return world, imL, imR

    @pytest.fixture(scope="class")
    def feats(self, world_frame):
        _, imL, imR = world_frame
        params = orb.OrbParams(n_features=500, n_levels=4)
        images = jnp.stack([jnp.asarray(imL), jnp.asarray(imR)])
        return orb.extract_jit(images, params), params

    def test_shapes_and_validity(self, feats):
        f, params = feats
        N = params.n_features
        assert f.uv.shape == (2, N, 2)
        assert f.desc.shape == (2, N, 8)
        assert f.desc.dtype == jnp.uint32
        n_valid = int(jnp.sum(f.valid[0]))
        assert n_valid > 100, f"too few keypoints: {n_valid}"

    def test_border_respected(self, feats):
        f, params = feats
        uv = np.asarray(f.uv)
        valid = np.asarray(f.valid)
        oct_ = np.asarray(f.octave)
        sf = orb.scale_factors(params)
        # keypoints live in level coords * scale; border is KP_BORDER * scale
        for b in range(2):
            m = valid[b]
            lim = orb.KP_BORDER * sf[oct_[b][m]]
            assert np.all(uv[b][m, 0] >= lim - 1e-3)
            assert np.all(uv[b][m, 1] >= lim - 1e-3)

    def test_budget_per_level(self, feats):
        f, params = feats
        budgets = orb.features_per_level(params)
        oct_ = np.asarray(f.octave[0])
        valid = np.asarray(f.valid[0])
        for lvl, b in enumerate(budgets):
            assert np.sum((oct_ == lvl) & valid) <= b

    def test_determinism(self, world_frame):
        _, imL, _ = world_frame
        params = orb.OrbParams(n_features=300, n_levels=3)
        im = jnp.asarray(imL)[None]
        f1 = orb.extract_jit(im, params)
        f2 = orb.extract_jit(im, params)
        assert np.array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
        assert np.array_equal(np.asarray(f1.uv), np.asarray(f2.uv))

    def test_descriptor_bits_distributed(self, feats):
        """Valid descriptors should have roughly half the bits set."""
        f, _ = feats
        d = np.asarray(f.desc[0])[np.asarray(f.valid[0])]
        bits = np.unpackbits(d.view(np.uint8), axis=1).sum(axis=1)
        assert 60 < bits.mean() < 196

    def test_ic_angle_points_to_centroid(self):
        # bright blob right of center -> centroid along +x -> angle ~ 0
        img = np.full((64, 64), 50.0, np.float32)
        img[30:35, 40:46] = 250.0
        pad = jnp.pad(jnp.asarray(img), ((orb.EDGE, orb.EDGE), (orb.EDGE, orb.EDGE)), mode="reflect")
        ang = orb._ic_angle_single(pad, jnp.asarray([32]), jnp.asarray([32]))
        assert abs(float(ang[0])) < 0.35

        img2 = np.full((64, 64), 50.0, np.float32)
        img2[40:46, 30:35] = 250.0  # blob below center -> angle ~ +pi/2
        pad2 = jnp.pad(jnp.asarray(img2), ((orb.EDGE, orb.EDGE), (orb.EDGE, orb.EDGE)), mode="reflect")
        ang2 = orb._ic_angle_single(pad2, jnp.asarray([32]), jnp.asarray([32]))
        assert abs(float(ang2[0]) - np.pi / 2) < 0.35


class TestFeatureBudget:
    def test_budget_sums_to_n_features(self):
        for n in (500, 1000, 1200, 2000):
            p = orb.OrbParams(n_features=n)
            assert sum(orb.features_per_level(p)) == n

    def test_level_sizes_shrink(self):
        p = orb.OrbParams()
        sizes = orb.level_sizes(480, 752, p)
        assert sizes[0] == (480, 752)
        for (h1, w1), (h2, w2) in zip(sizes, sizes[1:]):
            assert h2 < h1 and w2 < w1
