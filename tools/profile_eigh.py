#!/usr/bin/env python
"""Microbenchmark: is the batched 4x4 eigh the map-point-creation hot spot?

Times, on the real chip: (a) vmapped eigh of [K,N,4,4], (b) the
closed-form 3x3 normal-equation triangulation that could replace it,
(c) a 1200x1200x8 Hamming matcher pass for scale.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

K, N = 10, 1200
rng = np.random.default_rng(0)
A = rng.normal(size=(K, N, 4, 4)).astype(np.float32)


@jax.jit
def f_eigh(A):
    AtA = jnp.einsum("bnij,bnik->bnjk", A, A, precision="highest")
    _, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    return h[..., :3] / jnp.where(jnp.abs(h[..., 3:]) < 1e-12, 1.0, h[..., 3:])


@jax.jit
def f_normal3(A):
    # inhomogeneous DLT: B x = -b with B=A[..,:3], b=A[..,3]
    B = A[..., :3]
    b = A[..., 3]
    BtB = jnp.einsum("bnij,bnik->bnjk", B, B, precision="highest")
    Btb = jnp.einsum("bnij,bni->bnj", B, b, precision="highest")
    # Cramer 3x3 inverse
    m = BtB
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    det = (
        m[..., 0, 0] * c00 + m[..., 0, 1] * c10 + m[..., 0, 2] * c20
    )
    inv = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        -2,
    ) / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)[..., None, None]
    return -jnp.einsum("bnij,bnj->bni", inv, Btb, precision="highest")


D = rng.integers(0, 2**32, size=(N, 8), dtype=np.uint32)


@jax.jit
def f_ham(a, b):
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), -1
    ).astype(jnp.uint8)


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32)))  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms")
    return out


print("device:", jax.devices()[0].platform)
x1 = bench("eigh [10,1200,4,4]", f_eigh, jnp.asarray(A))
x2 = bench("normal3 [10,1200,4,4]", f_normal3, jnp.asarray(A))
bench("hamming 1200x1200x8 x10", lambda a, b: [f_ham(a, b) for _ in range(10)],
      jnp.asarray(D), jnp.asarray(D))
# agreement on well-conditioned systems (random A is fine for this)
d = np.linalg.norm(np.asarray(x1) - np.asarray(x2), axis=-1)
print("median |eigh - normal3|:", float(np.median(d)))
