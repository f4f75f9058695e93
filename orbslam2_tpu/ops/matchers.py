"""Data-association kernels: stereo matching, projection matching,
rotation-consistency filtering.

Each reference ORBmatcher entry point (src/ORBmatcher.cpp) that walks
per-feature candidate lists becomes a dense masked all-pairs problem:
build the [N, M] Hamming matrix once, AND together the geometric gates
as boolean masks, argmin. At N ≈ 1200 this is a few MFLOP-equivalent of
VPU work per frame — far below TPU roofline, and free of host loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hamming

HISTO_BINS = 30  # rotation histogram bins (reference ORBmatcher HISTO_LENGTH)
TWO_PI = 6.283185307179586


# ---------------------------------------------------------------------------
# scatter/gather-free building blocks. XLA lowers per-row dynamic gathers
# and scatters on TPU to serialized slices (profiled ~0.5 us/row); at
# N ~ 1200 rows that dwarfs the dense [N, M] math these matchers do. Every
# per-match fetch/collision-resolve below is therefore expressed as a
# one-hot masked reduction, which fuses into the existing dense passes.
# ---------------------------------------------------------------------------


def _choice_matrix(best_idx: jax.Array, n: int) -> jax.Array:
    """[S, n] bool: row s selects column best_idx[s] (exactly one True)."""
    return best_idx[:, None] == jnp.arange(n, dtype=best_idx.dtype)[None, :]


def _fetch(choice: jax.Array, values: jax.Array) -> jax.Array:
    """values[best_idx] without a dynamic gather: one-hot masked sum."""
    zero = jnp.zeros((), values.dtype)
    return jnp.sum(jnp.where(choice, values[None, :], zero), axis=1)


def _resolve_collisions(best_idx: jax.Array, d_eff: jax.Array, n: int):
    """Many sources chose target best_idx[s] with score d_eff[s] (INF =
    no claim); keep the best claim per target. Returns (src_for_target
    [n] int32, -1 where unclaimed; best_d [n]). Replaces the reference's
    sequential overwrite-if-better loop and the scatter-min formulation."""
    INF = hamming.MAX_DIST
    C = _choice_matrix(best_idx, n)
    dmat = jnp.where(C, d_eff[:, None], INF)  # [S, n]
    best_d = jnp.min(dmat, axis=0)
    src = jnp.argmin(dmat, axis=0).astype(jnp.int32)
    return jnp.where(best_d < INF, src, -1), best_d


def lookup_level(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[idx] for a small per-octave table (len = n_levels) as a
    select chain instead of a gather."""
    out = jnp.full(idx.shape, table[0], table.dtype)
    for k in range(1, table.shape[0]):
        out = jnp.where(idx == k, table[k], out)
    return out


# ---------------------------------------------------------------------------
# rotation consistency (reference ComputeThreeMaxima, ORBmatcher.cpp:1446-1487)
# ---------------------------------------------------------------------------


def rotation_consistency_mask(
    angle_a: jax.Array, angle_b: jax.Array, match_valid: jax.Array
) -> jax.Array:
    """Keep only matches whose angle difference falls in the 3 dominant
    histogram bins (with the reference's 0.1-ratio pruning of bins 2/3).

    angle_a/angle_b: [N] radians for the two matched feature sets
    match_valid: [N] bool.
    Returns a refined [N] bool mask.
    """
    rot = jnp.mod(angle_a - angle_b, TWO_PI)
    binf = jnp.round(rot * (HISTO_BINS / TWO_PI))
    bins = jnp.mod(binf.astype(jnp.int32), HISTO_BINS)
    hist = jnp.sum(
        (bins[:, None] == jnp.arange(HISTO_BINS)[None, :])
        & match_valid[:, None],
        axis=0,
        dtype=jnp.int32,
    )
    top_v, top_i = jax.lax.top_k(hist, 3)
    keep1 = top_i[0]
    keep2 = jnp.where(top_v[1] > 0.1 * top_v[0], top_i[1], -1)
    keep3 = jnp.where(top_v[2] > 0.1 * top_v[0], top_i[2], -1)
    ok = (bins == keep1) | (bins == keep2) | (bins == keep3)
    return match_valid & ok


# ---------------------------------------------------------------------------
# stereo matching (reference Frame::ComputeStereoMatches, src/Frame.cpp:538-673)
# ---------------------------------------------------------------------------


def search_by_bow(
    desc_a: jax.Array,  # [A,8] uint32 (keyframe / reference features)
    valid_a: jax.Array,  # [A] bool
    angle_a: jax.Array,  # [A]
    desc_b: jax.Array,  # [B,8] uint32 (frame features)
    valid_b: jax.Array,  # [B] bool
    angle_b: jax.Array,  # [B]
    ratio: jax.Array | float,
):
    """SearchByBoW core (reference ORBmatcher.cpp:110-239) as ONE device
    program: Hamming matrix + mutual-ratio + rotation-consistency. The
    reference walks BoW buckets to prune candidates; dense masked matching
    subsumes that on TPU. Returns (idx [A] into B, best [A] distance,
    keep [A] bool) — fetch with one jax.device_get. Host resolves B-side
    collisions (best distance wins) since that ordering is inherently
    sequential and tiny."""
    d = hamming.hamming_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    idx, best, second = hamming.masked_two_smallest(d, mask)
    ok = (best < hamming.TH_LOW) & (best < ratio * second)
    keep = rotation_consistency_mask(angle_a, angle_b[idx], ok)
    return idx, best, keep


def search_by_bow_nodes(
    desc_a: jax.Array,  # [A,8] uint32
    valid_a: jax.Array,  # [A] bool
    angle_a: jax.Array,  # [A]
    node_a: jax.Array,  # [A] int32 FeatureVector node ids (-1 invalid)
    desc_b: jax.Array,  # [B,8] uint32
    valid_b: jax.Array,  # [B] bool
    angle_b: jax.Array,  # [B]
    node_b: jax.Array,  # [B] int32
    ratio: jax.Array | float,
):
    """SearchByBoW with the reference's FeatureVector-node bucketing
    (ORBmatcher.cpp:354-487): candidate pairs are restricted to features
    whose descriptors descend to the SAME vocabulary node, and the
    mutual-ratio test runs WITHIN the bucket — exactly the reference's
    semantics, where the second-best competitor comes from the node
    bucket rather than the whole frame. On repetitive scenes this admits
    matches the dense all-pairs ratio test rejects (its global
    second-best is near-tied), which is what the loop-closure BoW gate
    (>=20, LoopClosing.cpp:271) needs at revisits."""
    d = hamming.hamming_matrix(desc_a, desc_b)
    mask = (
        valid_a[:, None]
        & valid_b[None, :]
        & (node_a[:, None] == node_b[None, :])
        & (node_a >= 0)[:, None]
    )
    idx, best, second = hamming.masked_two_smallest(d, mask)
    ok = (best < hamming.TH_LOW) & (best < ratio * second)
    keep = rotation_consistency_mask(angle_a, angle_b[idx], ok)
    return idx, best, keep


class StereoMatches(NamedTuple):
    u_right: jax.Array  # [N] float32, -1 where unmatched
    depth: jax.Array  # [N] float32, -1 where unmatched
    valid: jax.Array  # [N] bool


def stereo_match(
    uvL: jax.Array,
    octL: jax.Array,
    descL: jax.Array,
    validL: jax.Array,
    uvR: jax.Array,
    octR: jax.Array,
    descR: jax.Array,
    validR: jax.Array,
    scale_factors: jax.Array,
    bf: float,
    min_z: float,
) -> StereoMatches:
    """Left-right ORB matching for a rectified pair.

    Gates replicated from the reference: row band +-2*sigma(octave of L),
    octave gate +-1, disparity in (0, bf/min_z], Hamming <
    (TH_HIGH+TH_LOW)/2, and the global median-distance outlier cut at
    1.5*1.4*median.
    """
    th_orb = (hamming.TH_HIGH + hamming.TH_LOW) // 2
    max_d = bf / min_z

    dist = hamming.hamming_matrix(descL, descR)  # [N,M]

    vL = uvL[:, 1][:, None]
    vR = uvR[:, 1][None, :]
    band = jnp.abs(vR - vL) <= 2.0 * lookup_level(scale_factors, octL)[:, None]

    octave_ok = jnp.abs(octR[None, :] - octL[:, None]) <= 1

    uL = uvL[:, 0][:, None]
    uR = uvR[:, 0][None, :]
    disp_ok = (uR >= uL - max_d) & (uR <= uL)

    mask = band & octave_ok & disp_ok & validL[:, None] & validR[None, :]
    best_idx, best_dist = hamming.masked_argmin(dist, mask)

    u_right = _fetch(_choice_matrix(best_idx, uvR.shape[0]), uvR[:, 0])
    disparity = uvL[:, 0] - u_right
    matched = (best_dist < th_orb) & (disparity >= 0.0) & (disparity < max_d)
    # clamp near-zero disparity exactly like the reference (Frame.cpp:652-656)
    disparity = jnp.where(disparity <= 0.0, 0.01, disparity)
    u_right = jnp.where(disparity <= 0.01, uvL[:, 0] - 0.01, u_right)

    # median-distance cut over accepted matches
    d_acc = jnp.where(matched, best_dist, hamming.MAX_DIST)
    n_acc = jnp.sum(matched)
    sorted_d = jnp.sort(d_acc)
    median = sorted_d[jnp.clip(n_acc // 2, 0, d_acc.shape[0] - 1)]
    th_dist = 1.5 * 1.4 * median.astype(jnp.float32)
    keep = matched & (best_dist < th_dist)

    depth = jnp.where(keep, bf / disparity, -1.0)
    return StereoMatches(
        u_right=jnp.where(keep, u_right, -1.0),
        depth=depth,
        valid=keep,
    )


# ---------------------------------------------------------------------------
# frame-to-frame projection matching
# (reference SearchByProjection(Frame&, Frame&, th), ORBmatcher.cpp:1173-1315)
# ---------------------------------------------------------------------------


def search_by_projection_frame(
    uv_cur: jax.Array,  # [N,2] current-frame keypoints (level-0 coords)
    oct_cur: jax.Array,  # [N]
    desc_cur: jax.Array,  # [N,8]
    valid_cur: jax.Array,  # [N]
    angle_cur: jax.Array,  # [N]
    uv_proj: jax.Array,  # [M,2] last-frame points projected into current
    oct_last: jax.Array,  # [M] octave of the source keypoint
    desc_last: jax.Array,  # [M,8] (distinctive descriptor of the point)
    valid_proj: jax.Array,  # [M] projection valid (in image, z>0, has depth)
    angle_last: jax.Array,  # [M]
    scale_factors: jax.Array,
    th: float,
    forward: jax.Array,  # scalar bool: tz > baseline
    backward: jax.Array,  # scalar bool: -tz > baseline
    check_rotation: bool = True,
):
    """For each projected last-frame map point, find the best current-frame
    keypoint in a radius th*sigma(oct_last) window with the reference's
    forward/backward octave gating. Returns per-current-keypoint point index
    ([-1 if none]) — mirroring how the reference writes matches into
    mCurrentFrame.mvpMapPoints — plus the match distance.
    """
    radius = th * lookup_level(scale_factors, oct_last)  # [M]

    du = uv_cur[:, 0][None, :] - uv_proj[:, 0][:, None]  # [M,N]
    dv = uv_cur[:, 1][None, :] - uv_proj[:, 1][:, None]
    window = (jnp.abs(du) <= radius[:, None]) & (jnp.abs(dv) <= radius[:, None])

    oc = oct_cur[None, :]
    ol = oct_last[:, None]
    oct_gate = jnp.where(
        forward,
        oc >= ol,
        jnp.where(
            backward,
            oc <= ol,
            (oc >= ol - 1) & (oc <= ol + 1),
        ),
    )

    dist = hamming.hamming_matrix(desc_last, desc_cur)  # [M,N]
    mask = window & oct_gate & valid_proj[:, None] & valid_cur[None, :]
    best_idx, best_dist = hamming.masked_argmin(dist, mask)  # per point: [M]
    ok = best_dist <= hamming.TH_HIGH

    N = uv_cur.shape[0]
    choice = _choice_matrix(best_idx, N)
    if check_rotation:
        ok = rotation_consistency_mask(
            angle_last, _fetch(choice, angle_cur), ok
        )

    # current keypoint -> point index; resolve collisions by distance
    d_eff = jnp.where(ok, best_dist, hamming.MAX_DIST)
    point_for_kp, per_kp_best = _resolve_collisions(best_idx, d_eff, N)
    return point_for_kp, per_kp_best


# ---------------------------------------------------------------------------
# epipolar-constrained matching for triangulation
# (reference SearchForTriangulation, ORBmatcher.cpp:489-669)
# ---------------------------------------------------------------------------


def epipolar_match(
    uv1: jax.Array,  # [N,2] kf1 keypoints
    desc1: jax.Array,  # [N,8]
    free1: jax.Array,  # [N] bool — no map point bound
    angle1: jax.Array,  # [N]
    stereo1: jax.Array,  # [N] bool — has stereo depth
    uv2: jax.Array,  # [M,2] kf2 keypoints
    oct2: jax.Array,  # [M]
    desc2: jax.Array,  # [M,8]
    free2: jax.Array,  # [M]
    angle2: jax.Array,  # [M]
    stereo2: jax.Array,  # [M]
    F12: jax.Array,  # [3,3] fundamental kf1->kf2 (x1^T F12 = line in 2)
    epipole2: jax.Array,  # [2] projection of O1 in kf2
    scale_factors: jax.Array,
    level_sigma2: jax.Array,
):
    """Best epipolar-consistent match in kf2 for each free kf1 feature.

    Gates replicated: Hamming < TH_LOW, epipolar distance^2 <
    3.84*sigma2(oct2), mono-mono pairs must be > 10*sqrt(sf(oct2)) px from
    the epipole, rotation consistency. Returns match index per kf1 feature
    (-1 none).
    """
    # line in image 2: l = F12^T x1  (reference computes a,b,c this way)
    ones = jnp.ones((uv1.shape[0], 1), uv1.dtype)
    x1h = jnp.concatenate([uv1, ones], axis=-1)  # [N,3]
    line = x1h @ F12  # [N,3] (a, b, c)
    a, b, c = line[:, 0:1], line[:, 1:2], line[:, 2:3]
    num = a * uv2[None, :, 0] + b * uv2[None, :, 1] + c  # broadcasting [N,M]
    den = a * a + b * b
    dsq = num * num / jnp.where(den < 1e-12, 1e-12, den)
    epi_ok = dsq < 3.84 * lookup_level(level_sigma2, oct2)[None, :]

    de = uv2 - epipole2[None, :]
    epipole_dist2 = jnp.sum(de * de, axis=-1)  # [M]
    both_mono = (~stereo1[:, None]) & (~stereo2[None, :])
    epipole_ok = jnp.where(
        both_mono,
        epipole_dist2[None, :]
        >= 100.0 * lookup_level(scale_factors, oct2)[None, :],
        True,
    )

    mask = epi_ok & epipole_ok & free1[:, None] & free2[None, :]
    dist = hamming.hamming_matrix(desc1, desc2)
    best_idx, best = hamming.masked_argmin(dist, mask)
    ok = best < hamming.TH_LOW
    M = uv2.shape[0]
    choice = _choice_matrix(best_idx, M)
    ok = rotation_consistency_mask(angle1, _fetch(choice, angle2), ok)

    # enforce uniqueness on kf2 side (vbMatched2): best distance wins
    INF = hamming.MAX_DIST
    d_eff = jnp.where(ok, best, INF)
    dmat = jnp.where(choice, d_eff[:, None], INF)
    per2_best = jnp.min(dmat, axis=0)  # [M]
    win = ok & jnp.any(choice & (d_eff[:, None] == per2_best[None, :]), axis=1)
    return jnp.where(win, best_idx, -1), best


# ---------------------------------------------------------------------------
# map-point fusion into a keyframe (reference ORBmatcher::Fuse,
#  ORBmatcher.cpp:671-821)
# ---------------------------------------------------------------------------


def fuse_match(
    uv_kp: jax.Array,  # [N,2] keyframe keypoints
    oct_kp: jax.Array,  # [N]
    ur_kp: jax.Array,  # [N]
    desc_kp: jax.Array,  # [N,8]
    valid_kp: jax.Array,  # [N]
    uv_pt: jax.Array,  # [P,2] projected map points
    ur_pt: jax.Array,  # [P]
    level_pt: jax.Array,  # [P] predicted level
    desc_pt: jax.Array,  # [P,8]
    valid_pt: jax.Array,  # [P] passed frustum/scale/view gates
    scale_factors: jax.Array,
    inv_level_sigma2: jax.Array,
    th: float = 3.0,
):
    """For each candidate point, the best keyframe feature within the fuse
    gates: radius th*sf(pred), octave in [pred-1, pred], reprojection chi2
    < 5.99 (mono feature) / 7.8 (stereo feature), Hamming <= TH_LOW.
    Returns per-point best feature index (-1 none) and distance."""
    radius = th * lookup_level(scale_factors, level_pt)  # [P]
    du = uv_kp[None, :, 0] - uv_pt[:, 0:1]
    dv = uv_kp[None, :, 1] - uv_pt[:, 1:2]
    window = (jnp.abs(du) <= radius[:, None]) & (jnp.abs(dv) <= radius[:, None])

    oc = oct_kp[None, :]
    pl = level_pt[:, None]
    oct_gate = (oc >= pl - 1) & (oc <= pl)

    er = ur_pt[:, None] - ur_kp[None, :]
    e2_stereo = du * du + dv * dv + er * er
    e2_mono = du * du + dv * dv
    isig = lookup_level(inv_level_sigma2, oct_kp)[None, :]
    chi_ok = jnp.where(
        ur_kp[None, :] >= 0, e2_stereo * isig <= 7.8, e2_mono * isig <= 5.99
    )

    mask = window & oct_gate & chi_ok & valid_pt[:, None] & valid_kp[None, :]
    dist = hamming.hamming_matrix(desc_pt, desc_kp)
    best_idx, best = hamming.masked_argmin(dist, mask)
    ok = best <= hamming.TH_LOW
    return jnp.where(ok, best_idx, -1), best


# ---------------------------------------------------------------------------
# local-map projection matching
# (reference SearchByProjection(Frame&, vector<MapPoint*>&, th),
#  ORBmatcher.cpp:16-100)
# ---------------------------------------------------------------------------


def search_by_projection_points(
    uv_cur: jax.Array,  # [N,2]
    oct_cur: jax.Array,  # [N]
    ur_cur: jax.Array,  # [N] stereo u_right of current kps (-1 if mono)
    desc_cur: jax.Array,  # [N,8]
    valid_cur: jax.Array,  # [N]
    uv_pt: jax.Array,  # [P,2] projected map points
    ur_pt: jax.Array,  # [P] projected right-eye u
    level_pt: jax.Array,  # [P] predicted scale level
    view_cos: jax.Array,  # [P]
    desc_pt: jax.Array,  # [P,8] distinctive descriptors
    valid_pt: jax.Array,  # [P] in-frustum & to-be-searched
    scale_factors: jax.Array,
    th: float,
    nn_ratio: float = 0.8,
):
    """Best-in-window match of local map points into the current frame with
    the reference's gates: radius 2.5/4.0 by viewing angle, scaled by
    sigma(predicted level), candidate octave in [pred-1, pred], ratio test
    between best and second-best when they sit on the same pyramid level...
    (the reference applies the ratio whenever bestLevel==bestLevel2; we do
    the same), TH_HIGH cut, plus stereo right-coordinate agreement.

    Returns per-keypoint point index [-1 none] and distances.
    """
    r_base = jnp.where(view_cos > 0.998, 2.5, 4.0)  # [P]
    radius = th * r_base * lookup_level(scale_factors, level_pt)

    du = uv_cur[:, 0][None, :] - uv_pt[:, 0][:, None]  # [P,N]
    dv = uv_cur[:, 1][None, :] - uv_pt[:, 1][:, None]
    window = (jnp.abs(du) <= radius[:, None]) & (jnp.abs(dv) <= radius[:, None])

    oc = oct_cur[None, :]
    pl = level_pt[:, None]
    oct_gate = (oc >= pl - 1) & (oc <= pl)

    # stereo agreement: |ur_cur - ur_pt| <= radius when both defined
    has_stereo = ur_cur[None, :] >= 0
    er = jnp.abs(ur_cur[None, :] - ur_pt[:, None])
    stereo_gate = jnp.where(has_stereo, er <= radius[:, None], True)

    mask = window & oct_gate & stereo_gate & valid_pt[:, None] & valid_cur[None, :]
    dist = hamming.hamming_matrix(desc_pt, desc_cur)
    best_idx, best, second = hamming.masked_two_smallest(dist, mask)

    N = uv_cur.shape[0]
    choice_best = _choice_matrix(best_idx, N)
    best_oct = _fetch(choice_best, oct_cur)
    # second-best octave: recompute with best masked out
    d2 = jnp.where(mask & ~choice_best, dist, hamming.MAX_DIST)
    second_idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    second_oct = _fetch(_choice_matrix(second_idx, N), oct_cur)

    ratio_applies = (best_oct == second_oct) & (second < hamming.MAX_DIST)
    ratio_ok = jnp.where(
        ratio_applies, best.astype(jnp.float32) <= nn_ratio * second, True
    )
    ok = (best <= hamming.TH_HIGH) & ratio_ok & valid_pt

    d_eff = jnp.where(ok, best, hamming.MAX_DIST)
    point_for_kp, per_kp_best = _resolve_collisions(best_idx, d_eff, N)
    return point_for_kp, per_kp_best
