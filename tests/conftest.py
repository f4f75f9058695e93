"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py and the driver's graft entry;
tests validate numerics and the multi-chip sharding paths on host CPU
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os
import sys

# single-threaded BLAS: threaded-OpenBLAS spin-waits pathologically slow
# small matmuls when the pipeline's worker threads are busy (see bench.py)
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's JAX plugin overrides JAX_PLATFORMS at import time, so the
# env var alone does not stick — force CPU through the config API instead.
jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat suite runs skip XLA compiles
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
