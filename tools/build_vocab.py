#!/usr/bin/env python
"""Pre-build and cache the benchmark vocabulary (VERDICT r3 task 6).

The reference loads a pre-trained production vocabulary at startup
(ORBvoc.txt, k=10 L=6 — reference src/System.cpp:38-39); bench.py was
instead training a small fresh vocabulary per run, whose discrimination
was implicated in three rounds of failed on-chip loop closure. This tool
does the offline step once: renders views around the benchmark circuit
world, extracts ORB descriptors, trains a k=10 depth=4 tree (~10k words
for ~50 places: word count >> places), and writes assets/vocab_circuit.npz
which bench.py loads.

    python tools/build_vocab.py [--views 48] [--k 10] [--depth 4]
"""

import argparse
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=48)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--per-view", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    # --generic: train on a corpus of OTHER synthetic worlds (varied
    # seeds/geometry), NOT the bench circuit — the production analog of
    # the reference's ORBvoc.txt, which was trained on unrelated imagery
    # (k=10 L=6; reference src/System.cpp:38-39). VERDICT r4 task 5: the
    # 48-view circuit vocabulary retrieved far candidates so uniformly
    # that 94 Sim3 attempts ran per bench (~20 s of chip time, all
    # rejected at the n_bow gate).
    ap.add_argument("--generic", action="store_true")
    ap.add_argument(
        "--out", type=str,
        default=os.path.join(REPO, "assets", "vocab_circuit.npz"),
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import numpy as np

    from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
    from orbslam2_tpu.datasets.synthetic import SyntheticWorld
    from orbslam2_tpu.slam.frontend import Frontend
    from orbslam2_tpu.vocab import bow, train

    if args.generic:
        worlds = [
            SyntheticWorld(
                n_points=2000, seed=s, baseline=0.2,
                vertical_extent=ve, cylinder_radius=r, near_fraction=nf,
            )
            for s, r, ve, nf in (
                (3, 9.0, 5.0, 0.12), (5, 13.0, 7.0, 0.2),
                (33, 11.0, 6.0, 0.0), (47, 15.0, 6.0, 0.15),
                (60, 10.0, 8.0, 0.25), (71, 12.0, 5.0, 0.1),
            )
        ]
    else:
        worlds = [SyntheticWorld(
            n_points=2000, seed=21, baseline=0.2, vertical_extent=6.0,
            cylinder_radius=11.0, near_fraction=0.15,
        )]
    world = worlds[0]
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=1200),
    )
    fe = Frontend(cfg)
    descs, docs = [], []
    t0 = time.time()
    for w, wld in enumerate(worlds):
        for d, T in enumerate(wld.trajectory_circuit(args.views)):
            imL, _ = wld.render_stereo(T)
            f = fe.process(imL, imL)
            v = np.asarray(f.valid)
            dd = np.asarray(f.desc)[v][: args.per_view]
            descs.append(np.ascontiguousarray(dd).view(np.uint8))
            docs.append(np.full(len(dd), w * 1000 + d))
    corpus = np.concatenate(descs)
    print(f"corpus: {len(corpus)} descriptors from {args.views} views "
          f"({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    voc = train.train_vocabulary(
        corpus, k=args.k, depth=args.depth, doc_ids=np.concatenate(docs)
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    bow.save_npz(voc, args.out)
    print(f"vocabulary: {voc.n_words} words -> {args.out} "
          f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
