"""Local mapping: new-landmark creation between keyframes.

TPU-native equivalent of ORB-SLAM3 LocalMapping::CreateNewMapPoints
(slam_backends/orb_slam_3/CMakeLists.txt:50): epipolar-guided matching
of unassociated keypoints between the new keyframe and a reference
keyframe, batched triangulation, and cheirality/reprojection gating —
all dense masked ops. The local bundle adjustment lives in
models/local_ba.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from send_slam_tpu.config import MapConfig, TrackingConfig
from send_slam_tpu.geometry.se3 import hat
from send_slam_tpu.geometry.triangulate import triangulate_batch
from send_slam_tpu.models.map_state import (
    MapState, add_landmarks, cull_landmarks, insert_keyframe,
    refresh_landmarks,
)
from send_slam_tpu.ops.hamming import (
    match_descriptors, projection_window_mask,
)


def fundamental_from_poses(Ra, ta, Rb, tb, K):
    """F such that x_b^T F x_a = 0 for cameras (R*, t*) camera-from-world."""
    R_ba = Rb @ Ra.T
    t_ba = tb - (R_ba @ ta[..., None])[..., 0]
    E = hat(t_ba) @ R_ba
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


def epipolar_distance_matrix(F, uv_a, uv_b):
    """(N,2),(M,2) -> (N,M): distance of each b-point to the epiline of
    each a-point (rows = a, cols = b)."""
    ones = jnp.ones_like(uv_a[:, :1])
    pa = jnp.concatenate([uv_a, ones], -1)          # (N,3)
    lines = pa @ F.T                                 # (N,3) epilines in B
    pb = jnp.concatenate([uv_b, jnp.ones_like(uv_b[:, :1])], -1)
    num = jnp.abs(lines @ pb.T)                      # (N,M)
    den = jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2)[:, None]
    return num / jnp.maximum(den, 1e-9)


def create_new_landmarks(
    m: MapState,
    kf_new: jnp.ndarray,     # () int32 — id of the just-inserted KF
    kf_ref: jnp.ndarray,     # () int32 — reference KF to triangulate with
    K: jnp.ndarray,
    cfg: TrackingConfig,
    epi_th_px: float = 2.0,
    reproj_th2: float = 5.991,
    min_parallax_cos: float = None,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> Tuple[MapState, jnp.ndarray]:
    """Triangulate unassociated keypoint pairs between kf_new and kf_ref
    and append them as landmarks. Returns (map, n_created).

    ``min_parallax_cos`` defaults from cfg.tri_min_parallax_cos — the
    triangulation baseline floor: rays closer to parallel than this
    produce landmarks whose depth error grows as 1/parallax, and those
    badly-conditioned points steer the next frames' pose GN (the
    low-parallax divergence spiral, CLAUDE.md)."""
    if min_parallax_cos is None:
        min_parallax_cos = cfg.tri_min_parallax_cos
    Ra, ta = m.kf_R[kf_ref], m.kf_t[kf_ref]
    Rb, tb = m.kf_R[kf_new], m.kf_t[kf_new]
    uva, uvb = m.kf_uv[kf_ref], m.kf_uv[kf_new]
    desca, descb = m.kf_desc[kf_ref], m.kf_desc[kf_new]

    unassoc_a = (m.kf_obs_lm[kf_ref] < 0) & m.kf_kp_valid[kf_ref]
    unassoc_b = (m.kf_obs_lm[kf_new] < 0) & m.kf_kp_valid[kf_new]

    # Per-keypoint measurement sigma from the detection octave. Every
    # acceptance gate below scales with it (ORB-SLAM3 LocalMapping
    # gates epipolar distance by 3.84*sigma2 of the kp2 octave and
    # reprojection by 5.991*sigma2 — CheckDistEpipolarLine /
    # CreateNewMapPoints): a FIXED pixel gate under-admits high-octave
    # keypoints whose detector noise is sigma ~ 1.2^octave px, and the
    # yield collapse compounds whenever the pose estimate carries any
    # noise at all (the round-4 TPU forensics: 106 vs 256 new landmarks
    # at the same keyframe from a sub-1e-4 pose difference).
    sigma2_a = scale_factor ** (
        2.0 * m.kf_octave[kf_ref].astype(jnp.float32))     # (N,)
    sigma2_b = scale_factor ** (
        2.0 * m.kf_octave[kf_new].astype(jnp.float32))     # (N,)

    F = fundamental_from_poses(Ra, ta, Rb, tb, K)
    epi = epipolar_distance_matrix(F, uva, uvb)
    epi_mask = epi * epi < (epi_th_px * epi_th_px) * sigma2_b[None, :]

    match = match_descriptors(
        desca, descb, unassoc_a, unassoc_b,
        max_dist=float(cfg.hamming_th_low), ratio=0.7, mutual=True,
        extra_mask=epi_mask)

    N = uva.shape[0]
    idx_b = jnp.clip(match.idx, 0, N - 1)
    x1 = uva                                         # (N,2) obs in ref
    x2 = uvb[idx_b]

    P1 = K @ jnp.concatenate([Ra, ta[:, None]], 1)
    P2 = K @ jnp.concatenate([Rb, tb[:, None]], 1)
    X = triangulate_batch(P1, P2, x1, x2)            # world points

    # Gates: positive depth both views, low reprojection error, parallax.
    pa = X @ Ra.T + ta
    pb = X @ Rb.T + tb

    def reproj_err2(p, x, K):
        uv = jnp.stack([
            K[0, 0] * p[:, 0] / jnp.maximum(p[:, 2], 1e-6) + K[0, 2],
            K[1, 1] * p[:, 1] / jnp.maximum(p[:, 2], 1e-6) + K[1, 2],
        ], -1)
        return jnp.sum((uv - x) ** 2, -1)

    Ca = -(Ra.T @ ta[:, None])[:, 0]
    Cb = -(Rb.T @ tb[:, None])[:, 0]
    ra = X - Ca[None]
    rb = X - Cb[None]
    cos_par = jnp.sum(ra * rb, -1) / jnp.maximum(
        jnp.linalg.norm(ra, axis=-1) * jnp.linalg.norm(rb, axis=-1), 1e-9)

    finite = jnp.all(jnp.isfinite(X), -1)
    good = (match.valid & finite & (pa[:, 2] > 1e-3) & (pb[:, 2] > 1e-3)
            & (reproj_err2(pa, x1, K) < reproj_th2 * sigma2_a)
            & (reproj_err2(pb, x2, K) < reproj_th2 * sigma2_b[idx_b])
            & (cos_par < min_parallax_cos))

    # Viewing statistics at creation (MapPoint ctor + UpdateNormalAnd-
    # Depth): direction/distance from the REFERENCE observation, scale
    # band from its keypoint octave.
    dist_a = jnp.maximum(jnp.linalg.norm(ra, axis=-1), 1e-6)
    normal = ra / dist_a[:, None]
    oct_ref = m.kf_octave[kf_ref].astype(jnp.float32)      # (N,)
    dmax = dist_a * (scale_factor ** oct_ref)
    dmin = dmax / (scale_factor ** (n_levels - 1))

    m, lm_id = add_landmarks(
        m, X, desca, good, kf_new,
        kf_ref, jnp.arange(N, dtype=jnp.int32),
        kf_new, idx_b,
        normal=normal, dist_min=dmin, dist_max=dmax)
    return m, jnp.sum((lm_id >= 0).astype(jnp.int32))


def fuse_duplicate_landmarks(
    m: MapState,
    kf_id: jnp.ndarray,
    K: jnp.ndarray,
    cfg: TrackingConfig,
    radius_px: float = 4.0,
) -> Tuple[MapState, jnp.ndarray]:
    """Merge duplicate landmarks via the new keyframe
    (LocalMapping::SearchInNeighbors' Fuse): re-triangulation creates a
    twin of an existing landmark whenever tracking missed the original;
    twins have near-identical descriptors and poison every later
    ratio test. Any landmark that projects onto a keyframe keypoint
    already associated with a DIFFERENT landmark (tight window + tight
    descriptor gate, no ratio test — twins tie by construction) is
    merged into the older of the two. Returns (map, n_fused)."""
    ML = m.max_landmarks
    R, t = m.kf_R[kf_id], m.kf_t[kf_id]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    p = m.lm_pos @ R.T + t
    z = jnp.maximum(p[:, 2], 1e-6)
    uv_pred = jnp.stack([fx * p[:, 0] / z + cx, fy * p[:, 1] / z + cy], -1)
    in_view = m.lm_valid & (p[:, 2] > 0.01)

    kp_uv = m.kf_uv[kf_id]
    kp_desc = m.kf_desc[kf_id]
    kp_valid = m.kf_kp_valid[kf_id]
    window = projection_window_mask(uv_pred, kp_uv, radius_px)
    match = match_descriptors(
        m.lm_desc, kp_desc, in_view, kp_valid,
        max_dist=float(cfg.hamming_th_low), ratio=1.01, mutual=False,
        extra_mask=window)

    N = kp_uv.shape[0]
    kp_obs = m.kf_obs_lm[kf_id]                        # kp -> lm id
    other = kp_obs[jnp.clip(match.idx, 0, N - 1)]      # (ML,)
    ids = jnp.arange(ML, dtype=jnp.int32)
    dup = match.valid & (other >= 0) & (other != ids) \
        & m.lm_valid[jnp.clip(other, 0, ML - 1)]

    keep = jnp.minimum(ids, other)
    drop = jnp.maximum(ids, other)
    # Remap vector: drop -> keep (single pass; chains resolve over
    # successive keyframes).
    remap = ids
    remap = remap.at[jnp.where(dup, drop, ML)].set(
        jnp.where(dup, keep, 0), mode="drop")
    obs = m.kf_obs_lm
    obs = jnp.where(obs >= 0, remap[jnp.clip(obs, 0, ML - 1)], obs)

    dropped = jnp.zeros((ML,), bool).at[
        jnp.where(dup, drop, ML)].set(True, mode="drop")
    lm_valid = m.lm_valid & ~dropped
    # Merge tracking statistics + descriptor votes into the survivor.
    keep_safe = jnp.where(dup, keep, ML)
    drop_c = jnp.clip(drop, 0, ML - 1)
    add_vis = jnp.zeros((ML,), jnp.int32).at[keep_safe].add(
        m.lm_visible[drop_c], mode="drop")
    add_fnd = jnp.zeros((ML,), jnp.int32).at[keep_safe].add(
        m.lm_found[drop_c], mode="drop")
    add_votes = jnp.zeros_like(m.lm_bit_votes).at[keep_safe].add(
        m.lm_bit_votes[drop_c], mode="drop")
    add_vcnt = jnp.zeros((ML,), jnp.int32).at[keep_safe].add(
        m.lm_vote_count[drop_c], mode="drop")

    m = m._replace(kf_obs_lm=obs, lm_valid=lm_valid,
                   lm_visible=m.lm_visible + add_vis,
                   lm_found=m.lm_found + add_fnd,
                   lm_bit_votes=m.lm_bit_votes + add_votes,
                   lm_vote_count=m.lm_vote_count + add_vcnt)
    return m, jnp.sum(dropped.astype(jnp.int32))


def insert_keyframe_with_triangulation(
    m: MapState,
    R: jnp.ndarray, t: jnp.ndarray,
    frame,                       # models.frame.Frame
    match_idx: jnp.ndarray,      # (ML,) lm-row -> kp index from tracking
    match_inlier: jnp.ndarray,   # (ML,) bool
    K: jnp.ndarray,
    cfg: TrackingConfig,
    n_triangulate_refs: int = 3,
    chain_break=False,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    triangulate_backs=None,
):
    """The full keyframe-insertion step (jittable): cull unreliable
    landmarks, invert the tracked lm->kp matches into the keypoint
    observation row, append the keyframe, and triangulate new landmarks
    against reference keyframes ``triangulate_backs`` slots back
    (default the ``n_triangulate_refs`` most recent — LocalMapping's
    covisible-KF sweep; on forward-marching scenes the most recent
    refs have the SMALLEST baselines, so a spread like (1, 2, 4)
    widens triangulation parallax). Returns (map, kf_id,
    n_new_landmarks)."""
    N = frame.feat.capacity
    ML = m.max_landmarks
    m, _ = cull_landmarks(m)
    lm_rows = jnp.arange(ML, dtype=jnp.int32)
    kp_of_lm = jnp.where(match_inlier & m.lm_valid, match_idx, N)
    obs = jnp.full((N,), -1, jnp.int32)
    obs = obs.at[kp_of_lm].set(lm_rows, mode="drop")
    m, kf_id = insert_keyframe(
        m, R, t, frame.timestamp, frame.uv_und, frame.feat.desc,
        frame.feat.octave, frame.feat.valid, obs, chain_break=chain_break)
    # Fold the new observations into landmark viewing normals and
    # representative descriptors (MapPoint::UpdateNormalAndDepth +
    # ComputeDistinctiveDescriptors at keyframe rate).
    m = refresh_landmarks(m, kf_id, scale_factor=scale_factor,
                          n_levels=n_levels)
    backs = (tuple(range(1, n_triangulate_refs + 1))
             if triangulate_backs is None else tuple(triangulate_backs))

    # lax.scan over the reference spread: the triangulation body (an
    # (N,N) descriptor matmul + epipolar mask + batched triangulation +
    # masked landmark scatter) traces and compiles ONCE instead of
    # len(backs) times — it is the largest repeated block in the fused
    # frame step, and the warmup-compile regression (VERDICT r3 weak
    # item 1) is HLO-size-bound. Execution order and results are
    # identical to the unrolled loop (the scan is sequential).
    def tri_body(m, back):
        kf_ref = jnp.maximum(kf_id - back, 0)
        m, n = create_new_landmarks(m, kf_id, kf_ref, K, cfg,
                                    scale_factor=scale_factor,
                                    n_levels=n_levels)
        return m, n

    m, ns = jax.lax.scan(tri_body, m, jnp.asarray(backs, jnp.int32))
    n_new = jnp.sum(ns)
    # Merge any twins the triangulation just created (or that drift
    # revealed) through this keyframe's viewpoint.
    m, _ = fuse_duplicate_landmarks(m, kf_id, K, cfg)
    return m, kf_id, n_new
