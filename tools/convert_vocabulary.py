#!/usr/bin/env python
"""Convert a DBoW2 text vocabulary (ORBvoc.txt) to the engine's npz format.

Usage: python tools/convert_vocabulary.py ORBvoc.txt vocab.npz

The classic ORB-SLAM2 vocabulary (k=10, L=6, ~1M words) loads in a few
minutes from text (the reference's loadFromTextFile is equally slow,
System.cpp:38-39 — its slowest init step); the npz loads in seconds
thereafter.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 2
    src, dst = argv[1], argv[2]
    from orbslam2_tpu.vocab import bow

    print(f"loading DBoW2 text vocabulary from {src} ...")
    voc = bow.load_dbow2_text(src)
    print(f"k={voc.k} L={voc.depth} words={voc.n_words}")
    bow.save_npz(voc, dst)
    print(f"saved {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
