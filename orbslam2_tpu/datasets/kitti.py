"""KITTI odometry dataset driver (reference Examples/Stereo/stereo_kitti.cc):
pre-rectified grayscale pairs in image_0/ image_1/ + times.txt."""

from __future__ import annotations

import os
import numpy as np


class KittiSequence:
    def __init__(self, sequence_dir: str):
        self.left_dir = os.path.join(sequence_dir, "image_0")
        self.right_dir = os.path.join(sequence_dir, "image_1")
        with open(os.path.join(sequence_dir, "times.txt")) as f:
            self.timestamps = [float(x) for x in f.read().split()]

    def __len__(self):
        return len(self.timestamps)

    def __getitem__(self, i: int):
        import cv2

        name = f"{i:06d}.png"
        imL = cv2.imread(os.path.join(self.left_dir, name), cv2.IMREAD_GRAYSCALE)
        imR = cv2.imread(os.path.join(self.right_dir, name), cv2.IMREAD_GRAYSCALE)
        if imL is None or imR is None:
            raise FileNotFoundError(name)
        return imL.astype(np.float32), imR.astype(np.float32), self.timestamps[i]
