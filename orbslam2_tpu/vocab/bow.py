"""Bag-of-binary-words vocabulary as dense arrays.

TPU-native replacement for DBoW2's TemplatedVocabulary (reference
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h): the k^L tree of 256-bit
descriptors becomes three arrays —

    children_desc [n_internal, k, 8] uint32 — child descriptors per node
    children_idx  [n_internal, k] int32 — child node ids (-1 pad)
    word_id       [n_nodes] int32 — leaf word index (-1 for internal)
    word_weight   [n_words] float32 — idf weights

transform() descends the tree for all N descriptors of a frame in one
vmapped program (L gather+popcount-argmin steps) and returns the word id
per descriptor plus a normalized sparse tf-idf BoW vector. Scoring is the
L1 metric DBoW2 selects for ORB (ScoringObject.cpp L1Scoring):
s(v, w) = 1 - 0.5*|v - w|_1 on L1-normalized vectors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    children_desc: jax.Array  # [n_internal, k, 8] uint32
    children_idx: jax.Array  # [n_internal, k] int32 (-1 = missing child)
    node_word: jax.Array  # [n_nodes] int32, word id for leaves else -1
    word_weight: jax.Array  # [n_words] float32 (idf)
    k: int
    depth: int

    @property
    def n_words(self) -> int:
        return self.word_weight.shape[0]


def transform_words(voc: Vocabulary, desc: jax.Array, valid: jax.Array):
    """desc [N,8] uint32 -> word ids [N] int32 (-1 for invalid slots)."""
    words, _ = transform_words_nodes(voc, desc, valid, node_level=1)
    return words


def feature_node_level(depth: int) -> int:
    """Tree level (steps from the root) of the FeatureVector grouping
    node. DBoW2 transforms with levelsup=4 — nodes 4 levels above the
    leaves (reference KeyFrame.cpp:51-53 `mpORBvocabulary->transform(...,
    4)`; TemplatedVocabulary.h transform(..., levelsup)). For ORBvoc
    (k=10, L=6) that is level 2 => ~100 buckets; shallower vocabularies
    clamp to level >= 1."""
    return max(1, depth - 4)


def transform_words_nodes(
    voc: Vocabulary, desc: jax.Array, valid: jax.Array, node_level: int | None = None
):
    """desc [N,8] uint32 -> (word ids [N] int32, FeatureVector node ids
    [N] int32), both -1 for invalid slots. The node id is the tree node
    reached after `node_level` descent steps — the DBoW2 FeatureVector
    grouping key used by the reference's SearchByBoW bucket walk
    (ORBmatcher.cpp:354-487)."""
    if node_level is None:
        node_level = feature_node_level(voc.depth)

    def descend(d):
        def step(node, _):
            cd = voc.children_desc[node]  # [k,8]
            ci = voc.children_idx[node]  # [k]
            dist = jnp.sum(
                jax.lax.population_count(jnp.bitwise_xor(cd, d[None, :])), axis=-1
            )
            dist = jnp.where(ci >= 0, dist, 1 << 30)
            # ragged trees: a node that is already a leaf has no children —
            # stay put for the remaining scan steps.
            nxt = jnp.where(jnp.all(ci < 0), node, ci[jnp.argmin(dist)])
            return nxt, nxt

        node, path = jax.lax.scan(step, jnp.int32(0), None, length=voc.depth)
        return voc.node_word[node], path[node_level - 1]

    words, nodes = jax.vmap(descend)(desc)
    return jnp.where(valid, words, -1), jnp.where(valid, nodes, -1)


def bow_sparse(words: np.ndarray, word_weight: np.ndarray):
    """Sparse tf-idf BoW vector from per-descriptor word ids (host side):
    (sorted unique word ids [M] int64, L1-normalized weights [M] f32).
    The DBoW2 BowVector equivalent (Thirdparty/DBoW2/DBoW2/BowVector.cpp:
    addWeight + normalize) — at ORBvoc scale (1M words) a frame touches
    <= n_features words, so the vector is ~14 KB instead of the 4 MB dense
    form. database.py scores these by merge-intersection."""
    uw, counts = np.unique(words[words >= 0], return_counts=True)
    w = word_weight[uw] * counts
    s = float(w.sum())
    if s > 0:
        w = w / s
    return uw.astype(np.int64), w.astype(np.float32)


def l1_score_sparse(a, b) -> float:
    """L1 score between two sparse BoW vectors in O(shared words):
    1 - 0.5*||v-w||_1 over L1-normalized vectors reduces to
    sum over shared words of min(v_i, w_i) (the identity behind DBoW2's
    intersection-only accumulation, ScoringObject.cpp L1Scoring)."""
    wid1, wv1 = a
    wid2, wv2 = b
    _, i1, i2 = np.intersect1d(
        wid1, wid2, assume_unique=True, return_indices=True
    )
    if i1.size == 0:
        return 0.0
    return float(np.minimum(wv1[i1], wv2[i2]).sum())


def bow_vector(voc: Vocabulary, words: jax.Array, norm: str | None = "l1") -> jax.Array:
    """Dense normalized tf-idf vector [n_words]. Fine for vocabularies up
    to ~64k words (tests use ~1k); the engine's place-recognition path
    stores the sparse form (`bow_sparse`) and scores by merge-intersection
    in database.py — the dense form remains for the full scorer suite and
    as the validation oracle (tests/test_vocab.py).

    norm: "l1" (DBoW2 default for the L1/chi2/KL/Bhattacharyya scorers),
    "l2" (the L2 scorer), or None (dot-product scorer — no normalization;
    ScoringObject.h:74-89 per-scorer LNorm declarations)."""
    w = voc.word_weight
    v = jnp.zeros(voc.n_words, jnp.float32).at[
        jnp.where(words >= 0, words, voc.n_words)
    ].add(jnp.where(words >= 0, w[jnp.clip(words, 0, voc.n_words - 1)], 0.0),
          mode="drop")
    if norm is None:
        return v
    if norm == "l2":
        n = jnp.sqrt(jnp.sum(v * v))
    else:
        n = jnp.sum(jnp.abs(v))
    return v / jnp.where(n > 0, n, 1.0)


# ---------------------------------------------------------------------------
# scoring — all six DBoW2 metrics (ScoringObject.cpp). The reference's ORB
# vocabulary selects L1 (TemplatedVocabulary.h:468-471); the rest are here
# for full vocabulary parity. Each expects vectors built with the norm in
# SCORING_NORM[method].
# ---------------------------------------------------------------------------

_LOG_EPS = float(np.log(np.finfo(np.float64).eps))

#: normalization each scorer expects (ScoringObject.h:74-89)
SCORING_NORM = {
    "l1": "l1",
    "l2": "l2",
    "chi_square": "l1",
    "kl": "l1",
    "bhattacharyya": "l1",
    "dot_product": None,
}


def l1_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 L1 score on L1-normalized vectors (ScoringObject.cpp:23-68):
    1 - 0.5*||v-w||_1, in [0, 1]."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2))


def l2_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 L2 score on L2-normalized vectors (ScoringObject.cpp:73-119):
    1 - sqrt(1 - <v, w>), in [0, 1]."""
    s = jnp.minimum(jnp.sum(v1 * v2), 1.0)
    return 1.0 - jnp.sqrt(1.0 - s)


def chi_square_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 chi-square score on L1-normalized vectors
    (ScoringObject.cpp:125-169): 2*sum(v*w/(v+w)), in [0, 1]."""
    denom = v1 + v2
    terms = jnp.where(denom > 0, v1 * v2 / jnp.where(denom > 0, denom, 1.0), 0.0)
    return 2.0 * jnp.sum(terms)


def kl_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 KL divergence of v1 from v2 on L1-normalized vectors
    (ScoringObject.cpp:174-221): sum over v_i>0 of v*log(v/w), with
    log(eps) standing in where w_i == 0. Unscaled; LOWER is better."""
    logw = jnp.where(v2 > 0, jnp.log(jnp.where(v2 > 0, v2, 1.0)), _LOG_EPS)
    logv = jnp.log(jnp.where(v1 > 0, v1, 1.0))
    return jnp.sum(jnp.where(v1 > 0, v1 * (logv - logw), 0.0))


def bhattacharyya_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 Bhattacharyya coefficient on L1-normalized vectors
    (ScoringObject.cpp:226-262): sum(sqrt(v*w)), in [0, 1]."""
    return jnp.sum(jnp.sqrt(v1 * v2))


def dot_product_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 dot-product score on unnormalized vectors
    (ScoringObject.cpp:267-303). Unscaled."""
    return jnp.sum(v1 * v2)


_SCORERS = {
    "l1": l1_score,
    "l2": l2_score,
    "chi_square": chi_square_score,
    "kl": kl_score,
    "bhattacharyya": bhattacharyya_score,
    "dot_product": dot_product_score,
}


def score(v1: jax.Array, v2: jax.Array, method: str = "l1") -> jax.Array:
    """Score two BoW vectors with any DBoW2 metric. Vectors must be built
    with bow_vector(..., norm=SCORING_NORM[method])."""
    return _SCORERS[method](v1, v2)


def transform_jit(voc: Vocabulary, desc, valid):
    words = transform_words(voc, desc, valid)
    return words, bow_vector(voc, words)


# ---------------------------------------------------------------------------
# construction from a node table (used by both trainer and DBoW2 converter)
# ---------------------------------------------------------------------------


def build_from_nodes(
    parents: np.ndarray,  # [n_nodes] int32 (-1 for root, node 0)
    descriptors: np.ndarray,  # [n_nodes, 32] uint8 (root row ignored)
    weights: np.ndarray,  # [n_nodes] float32 (leaf weights; internal 0)
    is_leaf: np.ndarray,  # [n_nodes] bool
    k: int,
    depth: int,
) -> Vocabulary:
    n_nodes = len(parents)
    desc_u32 = np.ascontiguousarray(descriptors).view(np.uint32).reshape(n_nodes, 8)
    node_word = np.full(n_nodes, -1, np.int32)
    leaf_ids = np.nonzero(is_leaf)[0]
    node_word[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
    word_weight = weights[leaf_ids].astype(np.float32)

    children_idx = np.full((n_nodes, k), -1, np.int32)
    children_desc = np.zeros((n_nodes, k, 8), np.uint32)
    if n_nodes > 1:
        # vectorized children-table build: stable-sort nodes by parent, then
        # the slot of each node is its rank within its parent group
        # (ORBvoc scale is ~1M nodes; a Python per-node loop would crawl)
        nodes = np.arange(1, n_nodes, dtype=np.int32)
        p = parents[1:]
        order = np.argsort(p, kind="stable")
        ps = p[order]
        group_start = np.concatenate([[0], np.nonzero(np.diff(ps))[0] + 1])
        starts = np.zeros(len(ps), np.int64)
        starts[group_start] = group_start
        starts = np.maximum.accumulate(starts)
        slot = np.arange(len(ps)) - starts
        keep = slot < k
        children_idx[ps[keep], slot[keep]] = nodes[order][keep]
        children_desc[ps[keep], slot[keep]] = desc_u32[nodes[order][keep]]
    return Vocabulary(
        children_desc=jnp.asarray(children_desc),
        children_idx=jnp.asarray(children_idx),
        node_word=jnp.asarray(node_word),
        word_weight=jnp.asarray(word_weight),
        k=k,
        depth=depth,
    )


def load_dbow2_text(path: str) -> Vocabulary:
    """Load a DBoW2 text vocabulary (the ORBvoc.txt format the reference
    expects at System.cpp:38-39; writer TemplatedVocabulary.h:1382-1416):
    header `k L scoring weighting`, then per node:
    `parent_id is_leaf d0..d31 weight`.

    Uses the native multi-threaded parser (native/src/vocab_parse.cc) when
    built — the reference's equivalent load is its slowest init step —
    with this Python parser as the fallback."""
    from .. import native

    if native.available():
        k, L, parents, leaves, descs, weights = native.parse_vocabulary_text(path)
        return build_from_nodes(parents, descs, weights, leaves, k, L)
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        parents, descs, weights, leaves = [-1], [np.zeros(32, np.uint8)], [0.0], [False]
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            leaves.append(bool(int(parts[1])))
            descs.append(np.array([int(x) for x in parts[2:34]], np.uint8))
            weights.append(float(parts[34]))
    return build_from_nodes(
        np.array(parents, np.int32),
        np.stack(descs),
        np.array(weights, np.float32),
        np.array(leaves, bool),
        k,
        L,
    )


def save_npz(voc: Vocabulary, path: str):
    np.savez_compressed(
        path,
        children_desc=np.asarray(voc.children_desc),
        children_idx=np.asarray(voc.children_idx),
        node_word=np.asarray(voc.node_word),
        word_weight=np.asarray(voc.word_weight),
        k=voc.k,
        depth=voc.depth,
    )


def load_npz(path: str) -> Vocabulary:
    z = np.load(path)
    return Vocabulary(
        children_desc=jnp.asarray(z["children_desc"]),
        children_idx=jnp.asarray(z["children_idx"]),
        node_word=jnp.asarray(z["node_word"]),
        word_weight=jnp.asarray(z["word_weight"]),
        k=int(z["k"]),
        depth=int(z["depth"]),
    )
