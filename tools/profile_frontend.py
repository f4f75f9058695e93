#!/usr/bin/env python
"""Stage-level timing of the stereo front-end on the real chip.

Times each stage of ops/orb.extract + stereo matching separately with the
pipelined enqueue-many/block-once method (see CLAUDE.md timing notes), so
we know where the per-frame milliseconds actually go before optimizing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=60, name=""):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return out, dt


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.datasets.synthetic import SyntheticWorld
    from orbslam2_tpu.ops import fast, matchers, orb
    from orbslam2_tpu.ops import patches as patches_mod

    params = orb.OrbParams(n_features=1200, n_levels=8)
    sf = jnp.asarray(orb.scale_factors(params), jnp.float32)
    world = SyntheticWorld(n_points=700, seed=2)
    imL, imR = world.render_stereo(world.trajectory(1, step=0.3)[0])
    images = jnp.asarray(np.stack([imL, imR]), jnp.float32)

    B, H, W = images.shape
    sizes = orb.level_sizes(H, W, params)
    budgets = orb.features_per_level(params)

    # full extract + match
    @jax.jit
    def full(images):
        f = orb.extract(images, params)
        sm = matchers.stereo_match(
            f.uv[0], f.octave[0], f.desc[0], f.valid[0],
            f.uv[1], f.octave[1], f.desc[1], f.valid[1],
            sf, bf=world.bf, min_z=world.baseline,
        )
        return f.uv, sm.valid

    timeit(full, (images,), name="full frontend")

    @jax.jit
    def extract_only(images):
        f = orb.extract(images, params)
        return f.uv, f.desc

    f_full = jax.jit(lambda im: orb.extract(im, params))
    feats = jax.block_until_ready(f_full(images))
    timeit(extract_only, (images,), name="extract only")

    @jax.jit
    def match_only(uv, octv, desc, valid):
        return matchers.stereo_match(
            uv[0], octv[0], desc[0], valid[0],
            uv[1], octv[1], desc[1], valid[1],
            sf, bf=world.bf, min_z=world.baseline,
        ).valid

    timeit(match_only, (feats.uv, feats.octave, feats.desc, feats.valid),
           name="stereo match only")

    # pyramid cascade alone
    @jax.jit
    def pyramid(images):
        outs = []
        img_l = images
        for lvl, (h, w) in enumerate(sizes):
            if lvl > 0:
                img_l = jax.image.resize(img_l, (B, h, w), method="linear", antialias=False)
            outs.append(jnp.sum(img_l))
        return jnp.stack(outs)

    timeit(pyramid, (images,), name="pyramid (resize cascade)")

    # FAST score over all levels
    @jax.jit
    def fast_all(images):
        outs = []
        img_l = images
        for lvl, (h, w) in enumerate(sizes):
            if lvl > 0:
                img_l = jax.image.resize(img_l, (B, h, w), method="linear", antialias=False)
            outs.append(jnp.sum(fast.fast_score(img_l)))
        return jnp.stack(outs)

    timeit(fast_all, (images,), name="pyramid + FAST score")

    # selection on top
    @jax.jit
    def select_all(images):
        outs = []
        img_l = images
        for lvl, (h, w) in enumerate(sizes):
            if lvl > 0:
                img_l = jax.image.resize(img_l, (B, h, w), method="linear", antialias=False)
            score = fast.fast_score(img_l)
            xs, ys, resp, valid = orb._select_level_keypoints(
                score, budgets[lvl], params.ini_th, params.min_th
            )
            outs.append(jnp.sum(xs) + jnp.sum(ys))
        return jnp.stack(outs)

    timeit(select_all, (images,), name="pyramid + FAST + selection")

    # patches + descriptor math for level 0 only (biggest budget)
    n0 = budgets[0]
    rng = np.random.default_rng(0)
    h, w = sizes[0]
    ppad = 24
    Hp = orb._round_up(h + 2 * ppad + 8, 8)
    Wp = orb._round_up(w + 2 * ppad + (patches_mod.PATCH_W - patches_mod.PATCH), 128)
    xs0 = jnp.asarray(rng.integers(0, w - 48, B * n0), jnp.int32)
    ys0 = jnp.asarray(
        rng.integers(0, h - 56, B * n0)
        + np.repeat(np.arange(B) * Hp, n0), jnp.int32)

    @jax.jit
    def patches_l0(images, xs, ys):
        imp = jnp.pad(images, [(0, 0), (ppad, ppad), (ppad, ppad)], mode="reflect")
        imp = jnp.pad(imp, [(0, 0), (0, Hp - h - 2 * ppad), (0, Wp - w - 2 * ppad)])
        P = patches_mod.extract_patches(imp.reshape(B * Hp, Wp), xs, ys)
        ang, desc = orb._features_from_patches(P)
        return ang, desc

    timeit(patches_l0, (images, xs0, ys0), name=f"patches+desc L0 ({B*n0} kps)")

    @jax.jit
    def patches_only_l0(images, xs, ys):
        imp = jnp.pad(images, [(0, 0), (ppad, ppad), (ppad, ppad)], mode="reflect")
        imp = jnp.pad(imp, [(0, 0), (0, Hp - h - 2 * ppad), (0, Wp - w - 2 * ppad)])
        return patches_mod.extract_patches(imp.reshape(B * Hp, Wp), xs, ys)

    timeit(patches_only_l0, (images, xs0, ys0), name=f"patch DMA only L0")


if __name__ == "__main__":
    main()
