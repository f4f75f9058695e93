"""Hamming distance kernels over 256-bit ORB descriptors.

Replaces the reference's scalar popcount loop
(ORBmatcher::DescriptorDistance, src/ORBmatcher.cpp:1490-1508) with
XLA `population_count` over uint32 words, batched to full distance
matrices — the TPU-idiomatic shape for every matcher in the system
(all-pairs + masks instead of per-feature candidate loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matching thresholds (reference src/ORBmatcher.cpp:8-9)
TH_LOW = 50
TH_HIGH = 100
MAX_DIST = 256  # sentinel > any achievable distance


def hamming_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """[...,8] uint32 x [...,8] uint32 -> [...] int32 Hamming distance."""
    x = jax.lax.population_count(jnp.bitwise_xor(a, b))
    return jnp.sum(x, axis=-1).astype(jnp.int32)


def hamming_matrix(A: jax.Array, B: jax.Array) -> jax.Array:
    """[N,8] x [M,8] -> [N,M] int32 all-pairs Hamming distances.

    Word-by-word accumulation keeps the live intermediate at [N,M] int32
    instead of materializing [N,M,8] (which XLA laid out poorly on TPU).
    """
    acc = jnp.zeros((A.shape[0], B.shape[0]), jnp.int32)
    for w in range(A.shape[-1]):
        acc = acc + jax.lax.population_count(
            jnp.bitwise_xor(A[:, w][:, None], B[:, w][None, :])
        ).astype(jnp.int32)
    return acc


def masked_argmin(dist: jax.Array, mask: jax.Array, axis: int = -1):
    """Argmin over `axis` considering only True mask entries.

    Returns (best_idx, best_val) with best_val = MAX_DIST where no candidate.
    """
    d = jnp.where(mask, dist, MAX_DIST)
    idx = jnp.argmin(d, axis=axis)
    val = jnp.min(d, axis=axis)
    return idx.astype(jnp.int32), val.astype(jnp.int32)


def masked_two_smallest(dist: jax.Array, mask: jax.Array):
    """(best_idx, best, second_best) along the last axis under mask.

    Used for the mutual-ratio (mfNNratio) tests of the reference matchers.
    """
    d = jnp.where(mask, dist, MAX_DIST)
    best = jnp.min(d, axis=-1)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    d2 = jnp.where(
        jax.nn.one_hot(idx, d.shape[-1], dtype=bool), MAX_DIST, d
    )
    second = jnp.min(d2, axis=-1)
    return idx, best.astype(jnp.int32), second.astype(jnp.int32)
