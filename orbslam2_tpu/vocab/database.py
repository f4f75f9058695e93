"""Keyframe database: BoW inverted file + candidate detection.

Re-implements the reference KeyFrameDatabase (src/KeyFrameDatabase.cpp):
word-id -> keyframe inverted file, shared-word accumulation, the
0.8*maxCommonWords gate, covisibility-group score accumulation and the
0.75*bestAccScore cut — for both loop candidates (:51-172, excluding
covisible keyframes and applying minScore) and relocalization candidates
(:174-284, no exclusion / no minScore).

Storage is SPARSE at every scale (the DBoW2 design, BowVector.cpp):
per keyframe a sorted (word id, weight) pair of arrays (~14 KB at
1200 features — vs 4 MB for a dense vector over the 1M-word ORBvoc), and
scoring is O(shared words) by merge-intersection. The shared-word
accumulation concatenates the query words' inverted lists and bincounts —
one vectorized pass instead of the reference's per-word list walk.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..slam.map import SlamMap
from .bow import l1_score_sparse


class KeyFrameDatabase:
    def __init__(self, n_words: int):
        self.n_words = n_words
        self.kf_words: Dict[int, np.ndarray] = {}  # kf -> sorted unique word ids
        self.kf_bow: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}  # sparse (wid, w)
        #: kf -> per-feature FeatureVector node ids [N] int32 (-1 invalid)
        #: — the reference KeyFrame's mFeatVec analog (KeyFrame.cpp:51-53),
        #: used by the node-bucketed SearchByBoW in loop closing
        self.kf_nodes: Dict[int, np.ndarray] = {}
        #: flat postings store (word, kf) with amortized-doubling append —
        #: the inverted file as two parallel arrays. A query is one
        #: np.isin + bincount pass instead of a per-word python list walk
        #: (the list walk was ~half the per-keyframe 'Loop detection' span)
        self._post_w = np.empty(1 << 14, np.int64)
        self._post_kf = np.empty(1 << 14, np.int64)
        self._post_n = 0
        self._erased: Set[int] = set()

    def add(self, kf: int, words: np.ndarray, bow, nodes: np.ndarray = None):
        """words: per-descriptor word ids [N] (-1 invalid); bow: sparse
        (word ids, weights) from bow_sparse; nodes: per-descriptor
        FeatureVector node ids [N] (-1 invalid)."""
        uw = np.unique(words[words >= 0])
        self.kf_words[kf] = uw
        self.kf_bow[kf] = bow
        if nodes is not None:
            self.kf_nodes[kf] = nodes
        self._erased.discard(kf)
        n, m = self._post_n, len(uw)
        while n + m > len(self._post_w):
            self._post_w = np.concatenate([self._post_w, np.empty_like(self._post_w)])
            self._post_kf = np.concatenate([self._post_kf, np.empty_like(self._post_kf)])
        self._post_w[n : n + m] = uw
        self._post_kf[n : n + m] = kf
        self._post_n = n + m

    def erase(self, kf: int):
        if kf in self.kf_words:
            self._erased.add(kf)
        self.kf_words.pop(kf, None)
        self.kf_bow.pop(kf, None)
        self.kf_nodes.pop(kf, None)

    def clear(self):
        self.kf_words.clear()
        self.kf_bow.clear()
        self.kf_nodes.clear()
        self._post_n = 0
        self._erased.clear()

    # ------------------------------------------------------------------

    def _common_words(self, words: np.ndarray, exclude: Set[int]):
        """Shared-word counts per keyframe: one vectorized membership +
        bincount pass over the flat postings store (O(total postings))."""
        n = self._post_n
        if n == 0:
            return {}
        qw = np.unique(words[words >= 0])
        if qw.size == 0:
            return {}
        sel = np.isin(self._post_w[:n], qw, assume_unique=False)
        kf_hits = self._post_kf[:n][sel]
        if kf_hits.size == 0:
            return {}
        counts = np.bincount(kf_hits)
        kfs = np.nonzero(counts)[0]
        skip = self._erased | exclude
        return {
            int(k): int(counts[k]) for k in kfs if int(k) not in skip
        }

    @staticmethod
    def _l1_score(v1, v2) -> float:
        return l1_score_sparse(v1, v2)

    def _accumulate_groups(
        self,
        scored: Dict[int, float],
        slam_map: SlamMap,
        min_score_gate: Optional[float],
    ) -> List[int]:
        """Covisibility-group accumulation + 0.75*bestAccScore cut
        (reference KeyFrameDatabase.cpp:115-171)."""
        best_acc = 0.0
        groups = []  # (acc_score, best_kf)
        for kf, sc in scored.items():
            acc = sc
            best_kf, best_sc = kf, sc
            for nb in slam_map.covisible_keyframes(kf, 10):
                if nb in scored:
                    acc += scored[nb]
                    if scored[nb] > best_sc:
                        best_kf, best_sc = nb, scored[nb]
            groups.append((acc, best_kf))
            best_acc = max(best_acc, acc)
        min_to_retain = 0.75 * best_acc
        out, seen = [], set()
        for acc, kf in groups:
            if acc > min_to_retain and kf not in seen:
                seen.add(kf)
                out.append(kf)
        return out

    def detect_loop_candidates(
        self, kf: int, min_score: float, slam_map: SlamMap
    ) -> List[int]:
        exclude = set(slam_map.covisible_keyframes(kf))
        exclude.add(kf)
        counts = self._common_words(self.kf_words.get(kf, np.empty(0)), exclude)
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        bow = self.kf_bow[kf]
        scored = {}
        for okf, c in counts.items():
            if c > min_common:
                s = self._l1_score(bow, self.kf_bow[okf])
                if s >= min_score:
                    scored[okf] = s
        if not scored:
            return []
        return self._accumulate_groups(scored, slam_map, min_score)

    def detect_relocalization_candidates(
        self, words: np.ndarray, bow, slam_map: SlamMap
    ) -> List[int]:
        counts = self._common_words(words, set())
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        scored = {}
        for okf, c in counts.items():
            if c > min_common:
                scored[okf] = self._l1_score(bow, self.kf_bow[okf])
        if not scored:
            return []
        return self._accumulate_groups(scored, slam_map, None)
