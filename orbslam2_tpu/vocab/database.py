"""Keyframe database: BoW inverted file + candidate detection.

Re-implements the reference KeyFrameDatabase (src/KeyFrameDatabase.cpp):
word-id -> keyframe inverted file, shared-word accumulation, the
0.8*maxCommonWords gate, covisibility-group score accumulation and the
0.75*bestAccScore cut — for both loop candidates (:51-172, excluding
covisible keyframes and applying minScore) and relocalization candidates
(:174-284, no exclusion / no minScore).

The inverted file is host-side (python dict of arrays): insertion and
query volumes are per-keyframe, not per-pixel — device work stays in the
vocabulary transform.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import numpy as np

from ..slam.map import SlamMap


class KeyFrameDatabase:
    def __init__(self, n_words: int):
        self.n_words = n_words
        self.inverted: Dict[int, List[int]] = {}
        self.kf_words: Dict[int, np.ndarray] = {}  # kf -> unique word ids
        self.kf_bow: Dict[int, np.ndarray] = {}  # kf -> dense/sparse bow vector

    def add(self, kf: int, words: np.ndarray, bow: np.ndarray):
        uw = np.unique(words[words >= 0])
        self.kf_words[kf] = uw
        self.kf_bow[kf] = bow
        for w in uw:
            self.inverted.setdefault(int(w), []).append(kf)

    def erase(self, kf: int):
        for w in self.kf_words.pop(kf, ()):
            lst = self.inverted.get(int(w))
            if lst and kf in lst:
                lst.remove(kf)
        self.kf_bow.pop(kf, None)

    def clear(self):
        self.inverted.clear()
        self.kf_words.clear()
        self.kf_bow.clear()

    # ------------------------------------------------------------------

    def _common_words(self, words: np.ndarray, exclude: Set[int]):
        counts: Dict[int, int] = {}
        for w in np.unique(words[words >= 0]):
            for kf in self.inverted.get(int(w), ()):
                if kf not in exclude:
                    counts[kf] = counts.get(kf, 0) + 1
        return counts

    @staticmethod
    def _l1_score(v1: np.ndarray, v2: np.ndarray) -> float:
        return float(1.0 - 0.5 * np.abs(v1 - v2).sum())

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
        self, words: np.ndarray, bow: np.ndarray, slam_map: SlamMap
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
