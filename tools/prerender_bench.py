#!/usr/bin/env python
"""Pre-render the bench sequence into .render_cache in parallel.

bench.py renders its 504-frame circuit at ~5 s/frame single-threaded
(~40 min on this 2-CPU host) before the timed window. This tool renders
the same sequence with one worker process per CPU and writes the exact
npz bench.py looks for, so the bench starts at the parity check.
"""

import os
import sys
from multiprocessing import Pool

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _world():
    from orbslam2_tpu.datasets.synthetic import SyntheticWorld

    # MUST match bench.py's world parameters exactly
    return SyntheticWorld(
        n_points=2000, seed=21, baseline=0.2, vertical_extent=6.0,
        cylinder_radius=11.0, near_fraction=0.15,
        noise_sigma=1.5, exposure_drift=0.05,
    )


def _poses():
    return _world().trajectory_figure8()[0]


def _render_chunk(args):
    lo, hi = args
    world = _world()
    poses = _poses()
    out = np.zeros((hi - lo, 2, world.height, world.width), np.uint8)
    for i in range(lo, hi):
        a, b = world.render_stereo(poses[i])
        out[i - lo, 0] = np.clip(np.rint(a), 0, 255).astype(np.uint8)
        out[i - lo, 1] = np.clip(np.rint(b), 0, 255).astype(np.uint8)
    return lo, out


def main():
    world = _world()
    poses = _poses()
    n = len(poses)
    cache_dir = os.path.join(REPO, ".render_cache")
    os.makedirs(cache_dir, exist_ok=True)
    key = f"bench_s{world.seed}_n{world.n_points}_f{n}_v3"
    path = os.path.join(cache_dir, key + ".npz")
    if os.path.exists(path):
        print(f"already cached: {path}")
        return
    n_proc = min(os.cpu_count() or 1, 4)
    bounds = np.linspace(0, n, n_proc + 1).astype(int)
    chunks = [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_proc)]
    stack = np.zeros((n, 2, world.height, world.width), np.uint8)
    with Pool(n_proc) as pool:
        for lo, arr in pool.imap_unordered(_render_chunk, chunks):
            stack[lo : lo + len(arr)] = arr
            print(f"chunk @{lo} done ({len(arr)} frames)", flush=True)
    np.savez_compressed(path, frames=stack)
    print(f"wrote {path} ({os.path.getsize(path)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
