"""EuRoC MAV dataset driver.

Re-implements the reference's Examples/Stereo/stereo_euroc.cc: timestamp
list loading (:21-41), image path construction, and stereo rectification
from the LEFT./RIGHT. K/D/R/P blocks of the settings YAML (:75-102,
cv::initUndistortRectifyMap + remap). IO is host-side (cv2); everything
downstream is the device pipeline.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..config import SlamConfig


def load_timestamps(path: str) -> List[float]:
    """EuRoC_TimeStamps/*.txt: one ns timestamp per line (stereo_euroc.cc:29-40)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(float(line) / 1e9)
    return out


def image_paths(folder: str, times_file: str) -> List[str]:
    """Image file names are <ns>.png matching the timestamp list."""
    out = []
    with open(times_file) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(os.path.join(folder, line + ".png"))
    return out


class Rectifier:
    """Stereo rectification maps (reference stereo_euroc.cc:75-105)."""

    def __init__(self, config: SlamConfig):
        import cv2

        L, R = config.rectify_left, config.rectify_right
        if L is None or R is None:
            self.maps = None
            return
        size = (L.width, L.height)
        self.m1l, self.m2l = cv2.initUndistortRectifyMap(
            L.K, L.D, L.R, L.P[:3, :3], size, cv2.CV_32F
        )
        self.m1r, self.m2r = cv2.initUndistortRectifyMap(
            R.K, R.D, R.R, R.P[:3, :3], size, cv2.CV_32F
        )
        self.maps = True

    def __call__(self, im_left: np.ndarray, im_right: np.ndarray):
        if self.maps is None:
            return im_left, im_right
        from .. import native

        if native.available():
            # native threaded remap: both eyes rectify concurrently
            ar = native.AsyncRemap()
            hl = ar.submit(im_left, self.m1l, self.m2l)
            hr = ar.submit(im_right, self.m1r, self.m2r)
            return ar.wait(hl), ar.wait(hr)
        import cv2

        return (
            cv2.remap(im_left, self.m1l, self.m2l, cv2.INTER_LINEAR),
            cv2.remap(im_right, self.m1r, self.m2r, cv2.INTER_LINEAR),
        )


class EurocSequence:
    """Iterates rectified grayscale stereo pairs + timestamps."""

    def __init__(
        self,
        left_folder: str,
        right_folder: str,
        times_file: str,
        config: SlamConfig,
    ):
        self.left_paths = image_paths(left_folder, times_file)
        self.right_paths = image_paths(right_folder, times_file)
        self.timestamps = load_timestamps(times_file)
        self.rectifier = Rectifier(config)

    def __len__(self):
        return len(self.timestamps)

    def __getitem__(self, i: int):
        import cv2

        imL = cv2.imread(self.left_paths[i], cv2.IMREAD_GRAYSCALE)
        imR = cv2.imread(self.right_paths[i], cv2.IMREAD_GRAYSCALE)
        if imL is None or imR is None:
            raise FileNotFoundError(self.left_paths[i])
        imL, imR = self.rectifier(imL, imR)
        return (
            imL.astype(np.float32),
            imR.astype(np.float32),
            self.timestamps[i],
        )
