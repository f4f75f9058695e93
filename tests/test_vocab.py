import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.vocab import bow, train
from orbslam2_tpu.vocab.database import KeyFrameDatabase


@pytest.fixture(scope="module")
def tiny_vocab(request):
    rng = np.random.default_rng(1)
    descs = rng.integers(0, 256, (3000, 32), dtype=np.uint8)
    doc_ids = np.repeat(np.arange(30), 100)
    return train.train_vocabulary(descs, k=6, depth=3, doc_ids=doc_ids), descs


class TestVocabulary:
    def test_transform_deterministic(self, tiny_vocab):
        voc, descs = tiny_vocab
        d = jnp.asarray(np.ascontiguousarray(descs[:100]).view(np.uint32).reshape(-1, 8))
        valid = jnp.ones(100, bool)
        w1, v1 = bow.transform_jit(voc, d, valid)
        w2, v2 = bow.transform_jit(voc, d, valid)
        assert np.array_equal(np.asarray(w1), np.asarray(w2))
        assert np.asarray(w1).max() < voc.n_words
        assert np.asarray(w1).min() >= 0

    def test_same_descriptor_same_word(self, tiny_vocab):
        voc, descs = tiny_vocab
        d = np.ascontiguousarray(descs[:1]).view(np.uint32).reshape(1, 8)
        dd = jnp.asarray(np.repeat(d, 5, axis=0))
        w, _ = bow.transform_jit(voc, dd, jnp.ones(5, bool))
        assert len(np.unique(np.asarray(w))) == 1

    def test_self_similarity_is_one(self, tiny_vocab):
        voc, descs = tiny_vocab
        d = jnp.asarray(np.ascontiguousarray(descs[:200]).view(np.uint32).reshape(-1, 8))
        _, v = bow.transform_jit(voc, d, jnp.ones(200, bool))
        s = bow.l1_score(v, v)
        assert abs(float(s) - 1.0) < 1e-5

    def test_similar_images_score_higher(self, tiny_vocab):
        voc, descs = tiny_vocab
        rng = np.random.default_rng(2)
        base = descs[:300]
        # "same place": flip a couple of bits in half the descriptors
        near = base.copy()
        noise = rng.integers(0, 256, near[:150].shape, dtype=np.uint8)
        near[:150] ^= noise & rng.integers(0, 2, near[:150].shape, dtype=np.uint8)
        far = descs[1000:1300]

        def vec(d):
            dj = jnp.asarray(np.ascontiguousarray(d).view(np.uint32).reshape(-1, 8))
            return bow.transform_jit(voc, dj, jnp.ones(len(d), bool))[1]

        v0, vn, vf = vec(base), vec(near), vec(far)
        assert float(bow.l1_score(v0, vn)) > float(bow.l1_score(v0, vf))

    def test_npz_roundtrip(self, tiny_vocab, tmp_path):
        voc, descs = tiny_vocab
        p = str(tmp_path / "voc.npz")
        bow.save_npz(voc, p)
        voc2 = bow.load_npz(p)
        d = jnp.asarray(np.ascontiguousarray(descs[:50]).view(np.uint32).reshape(-1, 8))
        w1, _ = bow.transform_jit(voc, d, jnp.ones(50, bool))
        w2, _ = bow.transform_jit(voc2, d, jnp.ones(50, bool))
        assert np.array_equal(np.asarray(w1), np.asarray(w2))

    def test_dbow2_text_roundtrip(self, tiny_vocab, tmp_path):
        """Write a tiny DBoW2-format text file and load it back."""
        voc, _ = tiny_vocab
        # synthesize a 2-level k=2 vocabulary text file by hand
        p = str(tmp_path / "voc.txt")
        rng = np.random.default_rng(3)
        lines = ["2 2 0 0"]
        descs = {}
        # nodes: 1,2 children of root(0); 3,4 children of 1; 5,6 children of 2
        for nid, parent, leaf in [(1, 0, 0), (2, 0, 0), (3, 1, 1), (4, 1, 1), (5, 2, 1), (6, 2, 1)]:
            d = rng.integers(0, 256, 32)
            descs[nid] = d
            lines.append(
                f"{parent} {leaf} " + " ".join(str(x) for x in d) + " 0.5"
            )
        open(p, "w").write("\n".join(lines))
        v = bow.load_dbow2_text(p)
        assert v.k == 2 and v.depth == 2 and v.n_words == 4


class TestScorers:
    """All six DBoW2 scoring metrics (reference ScoringObject.cpp)."""

    def _vecs(self, tiny_vocab, norm):
        voc, descs = tiny_vocab

        def vec(d):
            dj = jnp.asarray(np.ascontiguousarray(d).view(np.uint32).reshape(-1, 8))
            w = bow.transform_words(voc, dj, jnp.ones(len(d), bool))
            return bow.bow_vector(voc, w, norm=norm)

        return vec(descs[:300]), vec(descs[:300].copy()), vec(descs[1000:1300])

    @pytest.mark.parametrize("method", ["l1", "l2", "chi_square", "bhattacharyya"])
    def test_self_score_is_one(self, tiny_vocab, method):
        va, vb, _ = self._vecs(tiny_vocab, bow.SCORING_NORM[method])
        assert abs(float(bow.score(va, vb, method)) - 1.0) < 1e-4

    def test_kl_self_divergence_zero(self, tiny_vocab):
        va, vb, _ = self._vecs(tiny_vocab, bow.SCORING_NORM["kl"])
        assert abs(float(bow.score(va, vb, "kl"))) < 1e-5

    @pytest.mark.parametrize(
        "method", ["l1", "l2", "chi_square", "bhattacharyya", "dot_product"]
    )
    def test_discriminates_places(self, tiny_vocab, method):
        va, _, vf = self._vecs(tiny_vocab, bow.SCORING_NORM[method])
        # same place scores strictly higher than a different place
        assert float(bow.score(va, va, method)) > float(bow.score(va, vf, method))

    def test_kl_discriminates_places(self, tiny_vocab):
        va, _, vf = self._vecs(tiny_vocab, bow.SCORING_NORM["kl"])
        # KL is a divergence: lower is better
        assert float(bow.score(va, va, "kl")) < float(bow.score(va, vf, "kl"))

    def test_l2_matches_closed_form(self, tiny_vocab):
        va, _, vf = self._vecs(tiny_vocab, "l2")
        expect = 1.0 - np.sqrt(max(0.0, 1.0 - min(1.0, float(np.sum(
            np.asarray(va) * np.asarray(vf))))))
        assert abs(float(bow.score(va, vf, "l2")) - expect) < 1e-6

    def test_chi_square_matches_sparse_semantics(self, tiny_vocab):
        # dense formula must equal DBoW2's common-nonzero-words sum
        va, _, vf = self._vecs(tiny_vocab, "l1")
        a, f = np.asarray(va, np.float64), np.asarray(vf, np.float64)
        common = (a > 0) & (f > 0) & (a + f != 0)
        expect = 2.0 * np.sum(a[common] * f[common] / (a[common] + f[common]))
        assert abs(float(bow.score(va, vf, "chi_square")) - expect) < 1e-6


class TestKeyFrameDatabase:
    def test_reloc_candidates_rank_true_match(self, tiny_vocab):
        from orbslam2_tpu.slam.map import SlamMap

        voc, descs = tiny_vocab
        m = SlamMap(n_kp=100)
        db = KeyFrameDatabase(voc.n_words)

        def wv(d):
            dj = jnp.asarray(np.ascontiguousarray(d).view(np.uint32).reshape(-1, 8))
            w = np.asarray(bow.transform_words(voc, dj, jnp.ones(len(d), bool)))
            return w, bow.bow_sparse(w, np.asarray(voc.word_weight))

        # 5 "keyframes" with distinct descriptor sets
        for kf in range(5):
            m.kf_pose[kf] = np.eye(4, dtype=np.float32)
            m.kf_valid.add(kf)
            m.covis[kf] = {}
            w, v = wv(descs[kf * 300 : kf * 300 + 250])
            db.add(kf, w, v)

        # query resembling keyframe 2
        q = descs[600:850].copy()
        w, v = wv(q)
        cands = db.detect_relocalization_candidates(w, v, m)
        assert 2 in cands


class TestSparseBow:
    """The engine's place-recognition path stores sparse (word id, weight)
    vectors (reference DBoW2 BowVector); the dense form is the oracle."""

    def test_sparse_matches_dense_l1(self, tiny_vocab):
        voc, descs = tiny_vocab
        ww = np.asarray(voc.word_weight)

        def both(d):
            dj = jnp.asarray(
                np.ascontiguousarray(d).view(np.uint32).reshape(-1, 8)
            )
            w = np.asarray(bow.transform_words(voc, dj, jnp.ones(len(d), bool)))
            dense = np.asarray(bow.bow_vector(voc, jnp.asarray(w)))
            return bow.bow_sparse(w, ww), dense

        sa, da = both(descs[:300])
        sb, db_ = both(descs[200:520])
        dense_score = 1.0 - 0.5 * np.abs(da - db_).sum()
        sparse_score = bow.l1_score_sparse(sa, sb)
        assert abs(sparse_score - dense_score) < 1e-5
        # sparse weights reconstruct the dense vector exactly
        rebuilt = np.zeros_like(da)
        rebuilt[sa[0]] = sa[1]
        np.testing.assert_allclose(rebuilt, da, atol=1e-6)

    def test_sparse_memory_is_bounded_by_features(self, tiny_vocab):
        voc, descs = tiny_vocab
        ww = np.asarray(voc.word_weight)
        dj = jnp.asarray(
            np.ascontiguousarray(descs[:400]).view(np.uint32).reshape(-1, 8)
        )
        w = np.asarray(bow.transform_words(voc, dj, jnp.ones(400, bool)))
        wid, wv = bow.bow_sparse(w, ww)
        assert len(wid) <= 400
        assert wid.nbytes + wv.nbytes < 400 * 12 + 16
