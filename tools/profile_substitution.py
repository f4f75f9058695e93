#!/usr/bin/env python
"""In-context stage costing by substitution.

Reruns the REAL extract program with individual per-keypoint stages
replaced by shape-preserving stubs; the timing delta vs the full program
is that stage's cost in its fused context. Timing: enqueue N, fetch one
final scalar VALUE (tunnel-safe; validated by tools/profile_sync_check).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=30, name=""):
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.datasets.synthetic import SyntheticWorld
    from orbslam2_tpu.ops import fast, orb
    from orbslam2_tpu.ops import patches as patches_mod

    params = orb.OrbParams(n_features=1200, n_levels=8)
    world = SyntheticWorld(n_points=700, seed=2)
    imL, imR = world.render_stereo(world.trajectory(1, step=0.3)[0])
    images = jnp.asarray(np.stack([imL, imR]), jnp.float32)
    B, H, W = images.shape
    sizes = orb.level_sizes(H, W, params)
    budgets = orb.features_per_level(params)
    sf = orb.scale_factors(params)

    def extract_param(images, brief_mode, undo_mode, patch_mode, select_mode):
        """orb.extract with swappable stages."""
        pat = orb._PATTERN
        outs = []
        img_l = images
        for lvl, (h, w) in enumerate(sizes):
            if lvl > 0:
                img_l = jax.image.resize(img_l, (B, h, w), method="linear", antialias=False)
            n_t = budgets[lvl]
            score = fast.fast_score(img_l)
            if select_mode == "real":
                xs, ys, resp, valid = orb._select_level_keypoints(
                    score, n_t, params.ini_th, params.min_th
                )
            else:  # stub: fixed grid positions, keep score dependence
                base = jnp.arange(n_t, dtype=jnp.int32)
                xs = orb.KP_BORDER + (base * 7) % max(w - 2 * orb.KP_BORDER, 1)
                ys = orb.KP_BORDER + (base * 13) % max(h - 2 * orb.KP_BORDER, 1)
                xs = jnp.broadcast_to(xs, (B, n_t)) + (score[:, :1, :1].astype(jnp.int32) * 0).reshape(B, 1)
                ys = jnp.broadcast_to(ys, (B, n_t))
                resp = jnp.ones((B, n_t), jnp.float32)
                valid = jnp.ones((B, n_t), bool)
            xs_s = jnp.where(valid, xs, orb.KP_BORDER)
            ys_s = jnp.where(valid, ys, orb.KP_BORDER)

            ppad = 24
            Hp = orb._round_up(h + 2 * ppad + 8, 8)
            Wp = orb._round_up(w + 2 * ppad + (patches_mod.PATCH_W - patches_mod.PATCH), 128)
            imp = jnp.pad(img_l, [(0, 0), (ppad, ppad), (ppad, ppad)], mode="reflect")
            imp = jnp.pad(imp, [(0, 0), (0, Hp - h - 2 * ppad), (0, Wp - w - 2 * ppad)])
            imp_tall = imp.reshape(B * Hp, Wp)
            xs_all = (xs_s + ppad - orb._PATCH_C).reshape(-1)
            ys_all = (
                ys_s + ppad - orb._PATCH_C
                + (jnp.arange(B, dtype=jnp.int32) * Hp)[:, None]
            ).reshape(-1)

            K = xs_all.shape[0]
            if patch_mode == "real":
                # inline extract_patches with swappable undo stage
                GROUP = patches_mod.GROUP
                Kp = ((K + GROUP - 1) // GROUP) * GROUP
                xs_p, ys_p = xs_all, ys_all
                if Kp != K:
                    xs_p = jnp.concatenate([xs_p, jnp.zeros(Kp - K, xs_p.dtype)])
                    ys_p = jnp.concatenate([ys_p, jnp.zeros(Kp - K, ys_p.dtype)])
                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(Kp // GROUP,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec(
                        (GROUP, patches_mod.PATCH_H, patches_mod.PATCH_W),
                        lambda g, xs, ys: (g, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    scratch_shapes=[pltpu.SemaphoreType.DMA((GROUP,))],
                )
                raw = pl.pallas_call(
                    patches_mod._patch_kernel,
                    grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct(
                        (Kp, patches_mod.PATCH_H, patches_mod.PATCH_W), imp_tall.dtype
                    ),
                    compiler_params=pltpu.CompilerParams(has_side_effects=True),
                )(xs_p, ys_p, imp_tall)[:K]
                if undo_mode == "real":
                    dy = (ys_all % 8).astype(jnp.int32)
                    dx = (xs_all % 128).astype(jnp.int32)
                    rows = dy[:, None] + jnp.arange(48, dtype=jnp.int32)[None, :]
                    shifted = jnp.take_along_axis(raw, rows[:, :, None], axis=1)
                    cols = dx[:, None] + jnp.arange(48, dtype=jnp.int32)[None, :]
                    P = jnp.take_along_axis(shifted, cols[:, None, :], axis=2)
                else:  # stub: plain static slice
                    P = raw[:, :48, :48]
            else:  # stub: skip DMA entirely
                P = jnp.zeros((K, 48, 48), jnp.float32) + imp_tall[0, 0]

            # patch math with swappable BRIEF gather
            m10 = jnp.einsum("kij,ij->k", P, jnp.asarray(orb._WX48))
            m01 = jnp.einsum("kij,ij->k", P, jnp.asarray(orb._WY48))
            ang = jnp.arctan2(m01, m10)
            row = jnp.zeros(P.shape[:1] + (48, 42), P.dtype)
            for k in range(7):
                row = row + orb._G7[k] * P[:, :, k : k + 42]
            blur = jnp.zeros(P.shape[:1] + (42, 42), P.dtype)
            for k in range(7):
                blur = blur + orb._G7[k] * row[:, k : k + 42, :]
            a = jnp.cos(ang)[:, None]
            b = jnp.sin(ang)[:, None]
            px_np = np.concatenate([pat[:, 0], pat[:, 2]]).astype(np.float32)
            py_np = np.concatenate([pat[:, 1], pat[:, 3]]).astype(np.float32)
            if brief_mode == "real":
                px = jnp.asarray(px_np)
                py = jnp.asarray(py_np)
                cols2 = jnp.round(px[None, :] * a - py[None, :] * b).astype(jnp.int32)
                rows2 = jnp.round(px[None, :] * b + py[None, :] * a).astype(jnp.int32)
                flat = (rows2 + orb._BLUR_C) * 42 + (cols2 + orb._BLUR_C)
                vals = jnp.take_along_axis(blur.reshape(K, -1), flat, axis=1)
            elif brief_mode == "static":
                cols2 = np.round(px_np).astype(np.int32)
                rows2 = np.round(py_np).astype(np.int32)
                flat = jnp.asarray((rows2 + orb._BLUR_C) * 42 + (cols2 + orb._BLUR_C))
                vals = blur.reshape(K, -1)[:, flat] * (1.0 + 0.0 * a)
            else:  # none
                vals = blur.reshape(K, -1)[:, :512] * (1.0 + 0.0 * a)
            t0v = vals[:, :256]
            t1v = vals[:, 256:]
            bits = (t0v < t1v).astype(jnp.uint32)
            words = jnp.sum(
                bits.reshape(-1, 8, 32) * jnp.asarray(orb._BIT_W)[None, None, :], axis=-1
            )
            outs.append(jnp.sum(words, dtype=jnp.uint32) + jnp.sum(xs_s).astype(jnp.uint32))
        return functools.reduce(lambda x, y: x + y, outs)

    variants = [
        ("full (baseline)", dict(brief_mode="real", undo_mode="real", patch_mode="real", select_mode="real")),
        ("BRIEF gather -> static", dict(brief_mode="static", undo_mode="real", patch_mode="real", select_mode="real")),
        ("+ undo-align -> slice", dict(brief_mode="static", undo_mode="slice", patch_mode="real", select_mode="real")),
        ("+ no patch DMA", dict(brief_mode="static", undo_mode="slice", patch_mode="none", select_mode="real")),
        ("+ selection -> stub", dict(brief_mode="static", undo_mode="slice", patch_mode="none", select_mode="stub")),
    ]
    for name, kw in variants:
        fn = jax.jit(functools.partial(extract_param, **kw))
        timeit(fn, (images,), name=name)


if __name__ == "__main__":
    main()
