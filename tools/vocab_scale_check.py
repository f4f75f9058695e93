#!/usr/bin/env python
"""Vocabulary-at-scale check (VERDICT r1 item 7b).

Synthesizes a DBoW2-format text vocabulary at the real ORBvoc.txt scale
(k=10, L=6 → 1,111,110 nodes + root; the reference loads this file at
System.cpp:38-39 — its slowest init step), round-trips it through the
native multi-threaded parser (native/src/vocab_parse.cc) into the dense
array form (vocab/bow.py build_from_nodes), runs the batched tree
descent for a full frame of descriptors, and records parse time, array
memory layout and descent cost to VOCAB_SCALE.json.

Usage: python tools/vocab_scale_check.py [--levels 6] [--keep FILE]
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def synthesize_dbow2_text(path: str, k: int = 10, L: int = 6, seed: int = 0):
    """Write a complete k^L tree in the DBoW2 text format:
    header `k L scoring weighting`, then per node
    `parent_id is_leaf d0..d31 weight` (TemplatedVocabulary.h:1382-1416).
    Node ids are implicit line order (root = 0 is not written)."""
    rng = np.random.default_rng(seed)
    parents = []
    level_start = [0]  # id of first node at each level (root level 0)
    next_id = 1
    prev_level = np.array([0])
    for lvl in range(1, L + 1):
        level_start.append(next_id)
        n = len(prev_level) * k
        parents.append(np.repeat(prev_level, k))
        prev_level = np.arange(next_id, next_id + n)
        next_id += n
    parents = np.concatenate(parents)
    n_nodes = len(parents)  # excluding root
    is_leaf = np.zeros(n_nodes, np.int64)
    is_leaf[level_start[L] - 1 :] = 1  # deepest level (ids are 1-based rows)
    desc = rng.integers(0, 256, (n_nodes, 32), dtype=np.uint8)
    weights = np.where(is_leaf == 1, rng.uniform(0.1, 4.0, n_nodes), 0.0)

    t0 = time.perf_counter()
    cols = np.column_stack(
        [parents, is_leaf] + [desc[:, i] for i in range(32)] + [weights]
    )
    fmt = " ".join(["%d", "%d"] + ["%d"] * 32 + ["%.6f"])
    with open(path, "w") as f:
        f.write(f"{k} {L} 0 0\n")
        np.savetxt(f, cols, fmt=fmt)
    return n_nodes + 1, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--branch", type=int, default=10)
    ap.add_argument("--keep", type=str, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orbslam2_tpu import native
    from orbslam2_tpu.vocab import bow

    td = tempfile.mkdtemp()
    path = args.keep or os.path.join(td, "synth_voc.txt")
    print(f"synthesizing k={args.branch} L={args.levels} tree -> {path}")
    n_nodes, t_write = synthesize_dbow2_text(path, args.branch, args.levels)
    size_mb = os.path.getsize(path) / 1e6
    print(f"  {n_nodes:,} nodes, {size_mb:.1f} MB, written in {t_write:.1f}s")

    assert native.available(), "native parser not built (cmake -S native)"
    t0 = time.perf_counter()
    voc = bow.load_dbow2_text(path)
    t_parse = time.perf_counter() - t0
    mem_mb = sum(
        np.asarray(a).nbytes
        for a in (voc.children_desc, voc.children_idx, voc.node_word,
                  voc.word_weight)
    ) / 1e6
    n_words = voc.n_words
    print(
        f"  parsed+built in {t_parse:.2f}s -> {n_words:,} words, "
        f"array memory {mem_mb:.1f} MB"
    )
    assert n_words == args.branch ** args.levels

    # batched descent of one frame's descriptors (1200, EuRoC config) —
    # the engine path: device tree descent -> host sparse tf-idf vector
    rng = np.random.default_rng(1)
    desc = jnp.asarray(
        rng.integers(0, 2**32, (1200, 8), dtype=np.uint64).astype(np.uint32)
    )
    valid = jnp.ones(1200, bool)
    transform = jax.jit(lambda d, v: bow.transform_words(voc, d, v))
    ww = np.asarray(voc.word_weight)
    words = jax.block_until_ready(transform(desc, valid))  # compile
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        words = transform(desc, valid)
    w = np.asarray(words)
    t_descent = (time.perf_counter() - t0) / reps
    print(
        f"  descent: {t_descent*1e3:.1f} ms / 1200 descriptors "
        f"({w.min()}..{w.max()} word range)"
    )
    assert (w >= 0).all() and (w < n_words).all()

    # --- keyframe database at scale: sparse (word id, weight) vectors,
    # inverted-file candidate query (reference KeyFrameDatabase.cpp:51-172
    # is O(shared words); the dense-vector alternative would be 4 MB/KF
    # and a 1M-element pass per score at this vocabulary size)
    from orbslam2_tpu.slam.map import SlamMap
    from orbslam2_tpu.vocab.database import KeyFrameDatabase

    n_kfs = 500
    db = KeyFrameDatabase(n_words)
    m = SlamMap(n_kp=1200)
    kf_mem = []
    for kf in range(n_kfs):
        wkf = rng.integers(0, n_words, 1200)
        sp = bow.bow_sparse(wkf, ww)
        db.add(kf, wkf, sp)
        m.kf_valid.add(kf)
        m.covis[kf] = {}
        kf_mem.append(sp[0].nbytes + sp[1].nbytes + db.kf_words[kf].nbytes)
    q_words = np.asarray(w)
    q_sp = bow.bow_sparse(q_words, ww)
    t0 = time.perf_counter()
    reps_q = 20
    for _ in range(reps_q):
        cands = db.detect_relocalization_candidates(q_words, q_sp, m)
    t_query = (time.perf_counter() - t0) / reps_q
    kb_per_kf = float(np.mean(kf_mem)) / 1e3
    print(
        f"  database: {n_kfs} KFs, {kb_per_kf:.1f} KB/KF sparse, "
        f"query {t_query*1e3:.2f} ms"
    )
    assert kb_per_kf < 100, "sparse BoW storage must stay <100 KB/KF"
    assert t_query < 0.010, "database query must stay <10 ms"

    artifact = {
        "k": args.branch,
        "levels": args.levels,
        "n_nodes": int(n_nodes),
        "n_words": int(n_words),
        "file_mb": round(size_mb, 1),
        "parse_build_s": round(t_parse, 3),
        "array_memory_mb": round(mem_mb, 1),
        "descent_ms_per_1200_desc": round(t_descent * 1e3, 2),
        "db_n_keyframes": n_kfs,
        "db_kb_per_kf_sparse": round(kb_per_kf, 1),
        "db_query_ms": round(t_query * 1e3, 3),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(REPO, "VOCAB_SCALE.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print("artifact written to VOCAB_SCALE.json")
    if not args.keep:
        os.remove(path)


if __name__ == "__main__":
    main()
