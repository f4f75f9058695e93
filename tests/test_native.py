"""Native preprocessing runtime: correctness vs cv2 and the numpy fallback."""

import numpy as np
import pytest

from orbslam2_tpu import native


@pytest.fixture(scope="module")
def maps():
    rng = np.random.default_rng(3)
    sh, sw = 120, 160
    dh, dw = 100, 140
    src = rng.integers(0, 256, (sh, sw), dtype=np.uint8)
    # mild warp
    yy, xx = np.mgrid[0:dh, 0:dw].astype(np.float32)
    mapx = xx * (sw - 2) / dw + 0.3 * np.sin(yy / 9.0)
    mapy = yy * (sh - 2) / dh + 0.4 * np.cos(xx / 11.0)
    return src, mapx.astype(np.float32), mapy.astype(np.float32)


class TestNative:
    def test_library_built(self):
        assert native.available(), "native library missing — build native/"

    def test_remap_matches_cv2(self, maps):
        import cv2

        src, mapx, mapy = maps
        got = native.remap_bilinear(src, mapx, mapy)
        want = cv2.remap(src, mapx, mapy, cv2.INTER_LINEAR).astype(np.float32)
        interior = np.s_[2:-2, 2:-2]
        assert np.abs(got[interior] - want[interior]).max() < 1.0

    def test_async_matches_sync(self, maps):
        src, mapx, mapy = maps
        ar = native.AsyncRemap()
        handles = [ar.submit(src, mapx, mapy) for _ in range(4)]
        outs = [ar.wait(h) for h in handles]
        want = native.remap_bilinear(src, mapx, mapy)
        for o in outs:
            np.testing.assert_allclose(o, want, atol=1e-4)

    def test_grayscale(self, rng):
        img = rng.integers(0, 256, (50, 60, 3), dtype=np.uint8)
        got = native.to_grayscale(img, bgr=True)
        want = (
            0.114 * img[..., 0] + 0.587 * img[..., 1] + 0.299 * img[..., 2]
        ).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=0.51)

    def test_vocab_parser_matches_python(self, rng, tmp_path):
        """Native multi-threaded ORBvoc.txt parser agrees with the Python
        fallback on a generated k=4/L=3 vocabulary file."""
        from orbslam2_tpu.vocab import bow

        k, L = 4, 3
        lines = [f"{k} {L} 0 0"]
        parent_of = {0: -1}
        next_id = 1
        frontier = [0]
        for level in range(L):
            new_frontier = []
            for p in frontier:
                for _ in range(k):
                    parent_of[next_id] = p
                    new_frontier.append(next_id)
                    next_id += 1
            frontier = new_frontier
        leaves = set(frontier)
        for nid in range(1, next_id):
            d = rng.integers(0, 256, 32)
            w = float(rng.uniform(0, 2)) if nid in leaves else 0.0
            lines.append(
                f"{parent_of[nid]} {int(nid in leaves)} "
                + " ".join(str(x) for x in d)
                + f" {w:.6f}"
            )
        p = str(tmp_path / "voc.txt")
        open(p, "w").write("\n".join(lines) + "\n")

        got = native.parse_vocabulary_text(p, n_threads=3)
        assert got is not None
        gk, gL, parents, is_leaf, desc, weights = got
        assert (gk, gL) == (k, L)
        assert len(parents) == next_id
        for nid in range(1, next_id):
            assert parents[nid] == parent_of[nid]
            assert bool(is_leaf[nid]) == (nid in leaves)
        # whole-vocabulary equality through the loader (native vs python path)
        v_native = bow.load_dbow2_text(p)
        import orbslam2_tpu.native as native_mod

        lib = native_mod._lib
        native_mod._lib = None
        try:
            v_py = bow.load_dbow2_text(p)
        finally:
            native_mod._lib = lib
        np.testing.assert_array_equal(
            np.asarray(v_native.children_idx), np.asarray(v_py.children_idx)
        )
        np.testing.assert_array_equal(
            np.asarray(v_native.children_desc), np.asarray(v_py.children_desc)
        )
        np.testing.assert_allclose(
            np.asarray(v_native.word_weight), np.asarray(v_py.word_weight),
            rtol=1e-6,
        )
