"""Shape policy: padded bucket sizes for every jitted device program.

Everything under `jax.jit` compiles once PER INPUT SHAPE. The reference
has no equivalent concern (C++ runs any size); here the shape ladder IS
the compile budget. Two policies:

  * pow2 (default, CPU tests): pad each varying axis to the next power of
    two above a floor — few distinct shapes, fast compiles on CPU, grows
    with the map.
  * fixed (TPU bench / production): ONE shape per program — each varying
    axis is padded to a fixed cap, so after `System.precompile()` the
    steady-state run never compiles again (round-2 postmortem: mid-run
    recompiles of the fused frame step at each grown candidate bucket
    were the single largest cost — BENCH_r02 "Fused frame step"
    sigma 4.7 s).

When a fixed-cap axis overflows:
  * matcher candidate axes SELECT the best rows (hot path; dropped
    candidates return next frame), and
  * solver axes (BA points/keyframes) GROW to the next power of two — a
    rare recompile is better than silently dropping residuals.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def pow2(n: int, lo: int) -> int:
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


@dataclass
class ShapePolicy:
    fixed: bool = False
    #: fused-step local-map candidate rows (tracking)
    local_cand_cap: int = 8192
    #: fuse / Sim3-projection point rows (local mapping, loop closing;
    #: pre-filtered to frustum-visible rows before padding)
    fuse_pt_cap: int = 4096
    #: forward-fuse source rows (<= n_features, padded)
    fuse_src_cap: int = 2048
    #: epipolar-triangulation neighbor axis — exactly the reference's 10
    #: best covisible neighbors for stereo (GetBestCovisibilityKeyFrames(10),
    #: LocalMapping.cpp:200); padding past 10 was 37% wasted vmap lanes in
    #: the creation program (r3 on-chip: 270 ms/keyframe, the largest
    #: mapping-thread device cost). NOTE: mono requests 20 neighbors
    #: (nn=20, LocalMapping.cpp:200); fixed mode truncates that walk to
    #: this cap (local_mapping.py active[:K]) — only the pow2 policy runs
    #: the full 20-neighbor mono walk (documented deviation).
    neighbor_cap: int = 10
    #: fuse target-keyframe axis (1st+2nd covisibility ring; the
    #: reference walks up to ~35, capped here to bound the launch)
    fuse_targets_cap: int = 16
    #: bundle adjustment tiers (K keyframes, P points, D obs slots):
    #: the solver compiles once per tier (all precompiled); the small
    #: tier keeps steady-state local BA ~9x cheaper on-device than the
    #: merged-map tiers (measured r3: 4 ms vs 36 ms per LM iteration).
    #: the top tier must cover the flagship run's full map — r4's bench
    #: map reached ~17k points (123 KFs) and overflowing 16384 forced a
    #: 9-second mid-run GBA recompile; the r5 figure-8 map reaches
    #: ~170 KFs / 24k points and overflowing (160, 24576) cost 34 s of
    #: mid-run compiles, hence the third tier
    ba_tiers: tuple = (
        (64, 8192, 8), (96, 12288, 16), (160, 24576, 16), (320, 40960, 16),
    )
    #: Sim3 correspondence rows (loop closing): base BoW matches plus the
    #: guided-search extension can reach ~2x n_features
    sim3_cap: int = 4096
    #: essential-graph vertices / edges (the r5 figure-8 map's essential
    #: graph exceeds 1024 edges — spanning tree + covis>=100 + loop edges
    #: over ~170 keyframes)
    pg_k_cap: int = 256
    pg_e_cap: int = 2048
    #: relocalization candidate axis
    reloc_cands: int = 5

    # -- bucket selectors ------------------------------------------------

    def bucket(self, n: int, lo: int, cap: int) -> int:
        """Solver-style bucket: fixed cap, growing past it if overflowed."""
        if not self.fixed:
            return pow2(n, lo)
        return cap if n <= cap else pow2(n, cap)

    def bucket_select(self, n: int, lo: int, cap: int) -> int:
        """Matcher-style bucket: fixed cap; caller must select n<=cap rows."""
        if not self.fixed:
            return pow2(n, lo)
        return cap

    def ba_shape(self, n_k: int, n_p: int, max_d: int):
        """(K, P, D) bucket for a bundle-adjustment problem. Fixed mode
        picks the smallest tier fitting (n_k, n_p); observations beyond
        the tier's D are truncated per point (oldest kept) — a documented
        trade vs the reference, which keeps all edges."""
        if not self.fixed:
            return pow2(n_k, 8), pow2(n_p, 256), pow2(max_d, 2)
        for k, p, d in self.ba_tiers:
            if n_k <= k and n_p <= p:
                return k, p, d
        k, p, d = self.ba_tiers[-1]
        return max(k, pow2(n_k, 8)), max(p, pow2(n_p, 256)), d


def pad_rows(a: np.ndarray, size: int, fill=0) -> np.ndarray:
    """Pad (or truncate) axis 0 to `size`."""
    if len(a) == size:
        return a
    out = np.full((size,) + a.shape[1:], fill, a.dtype)
    m = min(len(a), size)
    out[:m] = a[:m]
    return out


def select_top(ids: np.ndarray, score: np.ndarray, cap: int) -> np.ndarray:
    """Keep the `cap` highest-scoring ids (order-preserving)."""
    if len(ids) <= cap:
        return ids
    keep = np.argpartition(score, len(ids) - cap)[len(ids) - cap:]
    keep.sort()
    return ids[keep]
