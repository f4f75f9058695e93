"""Pallas patch-extraction kernel: the gather that XLA can't.

Profiling showed the ORB extractor spending ~50 ms/frame moving 48 GB(!)
of HBM traffic: XLA lowers per-keypoint advanced-indexing gathers against
the full image into full-operand passes. This kernel replaces them with
what the hardware actually supports: one small async DMA per keypoint,
HBM -> VMEM, with the keypoint coordinates delivered through scalar
prefetch so the DMA addresses are known before the body runs.

All downstream per-keypoint math (IC angle, blur, rBRIEF) then operates
on [K, S, S] patch tensors whose gather domains are tiny (S*S = 2304),
which the VPU handles natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 48  # covers IC-angle r=15 and rotated BRIEF +-18 with blur margin
PATCH_H = PATCH + 8  # extra sublane rows: HBM row offsets must be 8-aligned
PATCH_W = 256  # lane width: HBM slices must be 128-aligned in offset+size


GROUP = 8  # DMAs in flight per grid step (amortizes per-DMA latency)

#: test/bench hook: route TPU through the dynamic-slice fallback too (the
#: parity oracle for the Mosaic kernel — see bench.py PARITY_TPU.json)
FORCE_FALLBACK = False


def _patch_kernel(xs_ref, ys_ref, img_ref, out_ref, scratch, sems):
    """Grid step g: launch GROUP concurrent DMAs for keypoints
    g*GROUP .. g*GROUP+GROUP-1, each fetching the tile-aligned
    PATCH_H x PATCH_W window below-left of its (y, x) into VMEM scratch.

    Mosaic requires HBM slices aligned to the (8, 128) tiling in both
    offset and size, so we fetch a generous aligned window per keypoint —
    57 KB each, far cheaper than XLA's full-image gather lowering. The
    LANE residue (x % 128) is undone right here with a dynamic-shift
    `pltpu.roll` before the block leaves VMEM, shrinking the kernel
    output (and the downstream shift math) from 256 to 48 lanes. The
    SUBLANE residue (y % 8) cannot be undone in-kernel: dynamic sublane
    rotates miscompile and dynamic sublane slices are rejected by Mosaic,
    so the caller finishes with a cheap [48,56]x[56,48] one-hot matmul."""
    g = pl.program_id(0)
    dmas = []
    for j in range(GROUP):
        i = g * GROUP + j
        y = (ys_ref[i] // 8) * 8
        x = (xs_ref[i] // 128) * 128
        dma = pltpu.make_async_copy(
            img_ref.at[pl.ds(y, PATCH_H), pl.ds(x, PATCH_W)],
            scratch.at[j],
            sems.at[j],
        )
        dma.start()
        dmas.append(dma)
    for j in range(GROUP):
        i = g * GROUP + j
        dmas[j].wait()
        dx = xs_ref[i] % 128
        out_ref[j] = pltpu.roll(scratch[j], shift=-dx, axis=1)[:, :PATCH]


def extract_patches(img_pad: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """img_pad [Hp, Wp] float32 — padded so every aligned window fits:
    Wp must be a multiple of 128 with 256 lanes of slack beyond max(xs),
    Hp a multiple of 8 with 56 rows beyond max(ys) (see orb.extract).
    xs, ys [K] int32 = top-left corners.
    Returns [K, PATCH, PATCH] windows starting exactly at (ys, xs).

    Off-TPU (tests on the CPU mesh) a vmapped dynamic-slice fallback is
    used — XLA:CPU lowers it fine, and it avoids the per-grid-step
    interpreter overhead of Pallas interpret mode. FORCE_FALLBACK routes
    TPU through the same dynamic-slice path — the parity oracle for the
    Mosaic kernel (bench.py writes PARITY_TPU.json from the comparison)."""
    if FORCE_FALLBACK or jax.default_backend() != "tpu":
        def one(x, y):
            return jax.lax.dynamic_slice(img_pad, (y, x), (PATCH, PATCH))

        return jax.vmap(one)(xs, ys)
    K = xs.shape[0]
    Kp = ((K + GROUP - 1) // GROUP) * GROUP
    if Kp != K:
        xs = jnp.concatenate([xs, jnp.zeros(Kp - K, xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros(Kp - K, ys.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Kp // GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (GROUP, PATCH_H, PATCH), lambda g, xs, ys: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((GROUP, PATCH_H, PATCH_W), img_pad.dtype),
            pltpu.SemaphoreType.DMA((GROUP,)),
        ],
    )
    raw = pl.pallas_call(
        _patch_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kp, PATCH_H, PATCH), img_pad.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(xs, ys, img_pad)[:K]
    # Undo the sublane alignment: per-patch row shift by y % 8, expressed
    # as a batched one-hot matmul (selection matrices from iota compares)
    # so the shift runs on the MXU — XLA lowers per-row dynamic gathers on
    # TPU to serialized slices, which profiled ~10x slower than this.
    # Lanes were already undone in-kernel, so this contraction is only
    # [48,56]x[56,48] per keypoint. precision='highest' keeps the
    # selection exact (one nonzero per output; no bf16 pixel rounding).
    dy = (ys[:K] % 8).astype(jnp.int32)
    i48 = jnp.arange(PATCH, dtype=jnp.int32)
    rows_oh = (
        dy[:, None, None] + i48[None, :, None]
        == jnp.arange(PATCH_H, dtype=jnp.int32)[None, None, :]
    ).astype(raw.dtype)  # [K,48,PATCH_H]
    return jnp.einsum(
        "kru,kuc->krc", rows_oh, raw, precision=jax.lax.Precision.HIGHEST
    )  # [K,48,48]
