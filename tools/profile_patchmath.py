#!/usr/bin/env python
"""Sub-stage timing of _features_from_patches on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=100, name=""):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:8.3f} ms")
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

    K = 2400  # total keypoints per frame (1200 x 2 eyes)
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.uniform(0, 255, (K, 48, 48)), jnp.float32)

    timeit(jax.jit(orb._features_from_patches), (P,), name=f"full patch math (K={K})")

    @jax.jit
    def angle_only(P):
        m10 = jnp.einsum("kij,ij->k", P, jnp.asarray(orb._WX48))
        m01 = jnp.einsum("kij,ij->k", P, jnp.asarray(orb._WY48))
        return jnp.arctan2(m01, m10)

    ang = timeit(angle_only, (P,), name="angle einsum")

    @jax.jit
    def blur_only(P):
        row = jnp.zeros(P.shape[:1] + (48, 42), P.dtype)
        for k in range(7):
            row = row + orb._G7[k] * P[:, :, k : k + 42]
        blur = jnp.zeros(P.shape[:1] + (42, 42), P.dtype)
        for k in range(7):
            blur = blur + orb._G7[k] * row[:, k : k + 42, :]
        return blur

    blur = timeit(blur_only, (P,), name="blur")

    pat = jnp.asarray(orb._PATTERN, jnp.float32)

    @jax.jit
    def gather_pack(blur, ang):
        a = jnp.cos(ang)[:, None]
        b = jnp.sin(ang)[:, None]
        px = jnp.concatenate([pat[:, 0], pat[:, 2]])
        py = jnp.concatenate([pat[:, 1], pat[:, 3]])
        cols = jnp.round(px[None, :] * a - py[None, :] * b).astype(jnp.int32)
        rows = jnp.round(px[None, :] * b + py[None, :] * a).astype(jnp.int32)
        flat = (rows + orb._BLUR_C) * 42 + (cols + orb._BLUR_C)
        vals = jnp.take_along_axis(blur.reshape(K, -1), flat, axis=1)
        t0 = vals[:, :256]
        t1 = vals[:, 256:]
        bits = (t0 < t1).astype(jnp.uint32)
        return jnp.sum(bits.reshape(-1, 8, 32) * jnp.asarray(orb._BIT_W)[None, None, :], axis=-1)

    timeit(gather_pack, (blur, ang), name="BRIEF gather+pack")

    @jax.jit
    def gather_only(blur, ang):
        a = jnp.cos(ang)[:, None]
        b = jnp.sin(ang)[:, None]
        px = jnp.concatenate([pat[:, 0], pat[:, 2]])
        py = jnp.concatenate([pat[:, 1], pat[:, 3]])
        cols = jnp.round(px[None, :] * a - py[None, :] * b).astype(jnp.int32)
        rows = jnp.round(px[None, :] * b + py[None, :] * a).astype(jnp.int32)
        flat = (rows + orb._BLUR_C) * 42 + (cols + orb._BLUR_C)
        return jnp.take_along_axis(blur.reshape(K, -1), flat, axis=1)

    timeit(gather_only, (blur, ang), name="BRIEF gather only")

    # candidate replacement: quantize angle to 256 bins, gather via
    # per-bin STATIC column permutations + one-hot select
    NBINS = 32

    @jax.jit
    def binned_select(blur, ang):
        bins = jnp.round(ang / (2 * np.pi) * NBINS).astype(jnp.int32) % NBINS
        bf = blur.reshape(K, -1)
        px = jnp.concatenate([pat[:, 0], pat[:, 2]])
        py = jnp.concatenate([pat[:, 1], pat[:, 3]])
        out = jnp.zeros((K, 512), bf.dtype)
        for a_i in range(NBINS):
            th = 2 * np.pi * a_i / NBINS
            ca, sa = np.cos(th), np.sin(th)
            cols = np.round(px * ca - py * sa).astype(np.int32)
            rows = np.round(px * sa + py * ca).astype(np.int32)
            flat = jnp.asarray((rows + orb._BLUR_C) * 42 + (cols + orb._BLUR_C))
            vals_a = bf[:, flat]  # static gather
            out = jnp.where((bins == a_i)[:, None], vals_a, out)
        return out

    timeit(binned_select, (blur, ang), name=f"binned static gather ({NBINS} bins)")


if __name__ == "__main__":
    main()
