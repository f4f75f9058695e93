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
