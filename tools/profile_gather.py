#!/usr/bin/env python
"""Pin down the BRIEF-gather cost with value-forced timing."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=50, name=""):
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = fn(*args)
    # force a VALUE (tunnel-safe sync)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    _ = float(np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0])
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return out


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.ops import orb

    K = 2400
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.uniform(0, 255, (K, 48, 48)), jnp.float32)

    @jax.jit
    def full_sum(P):
        ang, desc = orb._features_from_patches(P)
        return jnp.sum(desc, dtype=jnp.uint32), ang

    timeit(full_sum, (P,), name=f"patch math from P param (K={K})")

    # gather where blur is computed in-program from the parameter
    pat = jnp.asarray(orb._PATTERN, jnp.float32)

    @jax.jit
    def blur_then_gather(P, ang):
        row = jnp.zeros(P.shape[:1] + (48, 42), P.dtype)
        for k in range(7):
            row = row + orb._G7[k] * P[:, :, k : k + 42]
        blur = jnp.zeros(P.shape[:1] + (42, 42), P.dtype)
        for k in range(7):
            blur = blur + orb._G7[k] * row[:, k : k + 42, :]
        a = jnp.cos(ang)[:, None]
        b = jnp.sin(ang)[:, None]
        px = jnp.concatenate([pat[:, 0], pat[:, 2]])
        py = jnp.concatenate([pat[:, 1], pat[:, 3]])
        cols = jnp.round(px[None, :] * a - py[None, :] * b).astype(jnp.int32)
        rows = jnp.round(px[None, :] * b + py[None, :] * a).astype(jnp.int32)
        flat = (rows + orb._BLUR_C) * 42 + (cols + orb._BLUR_C)
        vals = jnp.take_along_axis(blur.reshape(K, -1), flat, axis=1)
        return jnp.sum(vals), vals

    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, K), jnp.float32)
    timeit(blur_then_gather, (P, ang), name="blur+gather in one program")

    # gather from a parameter
    blur = jax.block_until_ready(
        jax.jit(
            lambda P: sum(
                orb._G7[j]
                * sum(orb._G7[k] * P[:, j : j + 42, k : k + 42] for k in range(7))
                for j in range(7)
            )
        )(P)
    )

    @jax.jit
    def gather_param(blur, ang):
        a = jnp.cos(ang)[:, None]
        b = jnp.sin(ang)[:, None]
        px = jnp.concatenate([pat[:, 0], pat[:, 2]])
        py = jnp.concatenate([pat[:, 1], pat[:, 3]])
        cols = jnp.round(px[None, :] * a - py[None, :] * b).astype(jnp.int32)
        rows = jnp.round(px[None, :] * b + py[None, :] * a).astype(jnp.int32)
        flat = (rows + orb._BLUR_C) * 42 + (cols + orb._BLUR_C)
        vals = jnp.take_along_axis(blur.reshape(K, -1), flat, axis=1)
        return jnp.sum(vals), vals

    timeit(gather_param, (blur, ang), name="gather from param blur")

    # the alignment-undo gathers in extract_patches
    raw = jnp.asarray(rng.uniform(0, 255, (K, 56, 256)), jnp.float32)
    dy = jnp.asarray(rng.integers(0, 8, K), jnp.int32)
    dx = jnp.asarray(rng.integers(0, 128, K), jnp.int32)

    @jax.jit
    def undo_align(raw, dy, dx):
        rows = dy[:, None] + jnp.arange(48, dtype=jnp.int32)[None, :]
        shifted = jnp.take_along_axis(raw, rows[:, :, None], axis=1)
        cols = dx[:, None] + jnp.arange(48, dtype=jnp.int32)[None, :]
        out = jnp.take_along_axis(shifted, cols[:, None, :], axis=2)
        return jnp.sum(out), out

    timeit(undo_align, (raw, dy, dx), name="alignment-undo gathers [K,56,256]->[K,48,48]")

    # variant: dynamic_slice via vmap instead of take_along_axis
    @jax.jit
    def undo_align_ds(raw, dy, dx):
        def one(r, y, x):
            return jax.lax.dynamic_slice(r, (y, x), (48, 48))

        out = jax.vmap(one)(raw, dy, dx)
        return jnp.sum(out), out

    timeit(undo_align_ds, (raw, dy, dx), name="alignment-undo vmapped dynamic_slice")


if __name__ == "__main__":
    main()
