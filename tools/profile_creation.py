#!/usr/bin/env python
"""Time the fused map-point-creation device program (epipolar match +
triangulation over the 10-neighbor walk) on the real chip, isolating the
device program from the host commit."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
from orbslam2_tpu.slam.frontend import Frontend
from orbslam2_tpu.slam.local_mapping import LocalMapper
from orbslam2_tpu.slam.map import SlamMap
from orbslam2_tpu.slam.shapes import ShapePolicy

cfg = SlamConfig(
    camera=CameraConfig(), orb=OrbConfig(n_features=1200),
    shapes=ShapePolicy(fixed=True),
)
fe = Frontend(cfg)
m = SlamMap(1200)
lm = LocalMapper(cfg, fe, m)

N, K = 1200, 10
rng = np.random.default_rng(0)
uv = rng.uniform(0, 400, (N, 2)).astype(np.float32)
desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
free = np.ones(N, bool)
ang = rng.uniform(0, 360, N).astype(np.float32)
st = rng.random(N) > 0.5
dep = rng.uniform(1, 20, N).astype(np.float32)
ur = np.where(st, uv[:, 0] - 5, -1).astype(np.float32)
oc = rng.integers(0, 8, N).astype(np.int32)
T1 = np.eye(4, dtype=np.float32)
F = rng.normal(size=(3, 3)).astype(np.float32)
ep = np.array([200.0, 200.0], np.float32)

args = (
    jnp.asarray(uv), jnp.asarray(desc), free, jnp.asarray(ang), st,
    jnp.asarray(dep), jnp.asarray(ur), jnp.asarray(oc),
    tuple(jnp.asarray(uv) for _ in range(K)),
    tuple(jnp.asarray(oc) for _ in range(K)),
    tuple(jnp.asarray(desc) for _ in range(K)),
    tuple(free for _ in range(K)),
    tuple(jnp.asarray(ang) for _ in range(K)),
    tuple(st for _ in range(K)),
    tuple(jnp.asarray(dep) for _ in range(K)),
    tuple(jnp.asarray(ur) for _ in range(K)),
    tuple(F for _ in range(K)),
    tuple(ep for _ in range(K)),
    T1, tuple(T1 for _ in range(K)),
    T1, tuple(T1 for _ in range(K)),
    np.zeros(3, np.float32), tuple(np.zeros(3, np.float32) for _ in range(K)),
)

out = lm._jit_epipolar_batch(*args)
jax.block_until_ready(out)
_ = jax.device_get(out)
t0 = time.perf_counter()
reps = 20
for _ in range(reps):
    out = lm._jit_epipolar_batch(*args)
_ = jax.device_get(out)
print(f"epipolar+triangulate batch [{K}x{N}]: "
      f"{(time.perf_counter()-t0)/reps*1e3:.1f} ms")
