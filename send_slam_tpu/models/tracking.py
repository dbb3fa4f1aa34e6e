"""Per-frame tracking: projection-guided matching + pose-only robust
Gauss-Newton.

TPU-native re-design of ORB-SLAM3's Tracking front end + g2o
PoseOptimization (CMakeLists.txt:49,61). The C++ pipeline is a chain of
data-dependent searches and a sparse graph solve; here it is one fused
jitted step over fixed-capacity arrays:

1. predict pose with the constant-velocity motion model,
2. project map landmarks, mask a search window, Hamming-match on the
   MXU (ops/hamming.py),
3. rounds of Huber-weighted Gauss-Newton on the 6-DoF pose with
   chi-squared outlier reclassification between rounds (the structure
   of g2o's PoseOptimization: 2x5 wide + 4x5 tight across the two
   passes, chi2 5.991).

The normal equations are a single (N,2,6) batched Jacobian contraction
into a 6x6 solve — dense, tiny, and entirely on-device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from send_slam_tpu.config import TrackingConfig
from send_slam_tpu.geometry.se3 import se3_compose, se3_exp
from send_slam_tpu.ops.hamming import (
    Matches, match_descriptors, projection_window_mask,
)

CHI2_2DOF = 5.991  # 95% for 2-dof reprojection residuals


class PoseOptResult(NamedTuple):
    R: jnp.ndarray          # (3,3) camera-from-world
    t: jnp.ndarray          # (3,)
    inlier: jnp.ndarray     # (N,) bool
    chi2: jnp.ndarray       # () total robust energy
    n_inliers: jnp.ndarray  # () int32


def _project_and_jacobian(R, t, X, fx, fy, cx, cy):
    """Project world points and return residual Jacobian wrt a LEFT
    increment T <- exp(delta) T, delta = (rho, phi).

    Returns (uv (N,2), p_cam (N,3), J (N,2,6))."""
    p = X @ R.T + t[None]
    z = jnp.maximum(p[:, 2], 1e-6)
    inv_z = 1.0 / z
    u = fx * p[:, 0] * inv_z + cx
    v = fy * p[:, 1] * inv_z + cy
    uv = jnp.stack([u, v], -1)

    # d(proj)/dp
    zeros = jnp.zeros_like(z)
    J_proj = jnp.stack([
        jnp.stack([fx * inv_z, zeros, -fx * p[:, 0] * inv_z * inv_z], -1),
        jnp.stack([zeros, fy * inv_z, -fy * p[:, 1] * inv_z * inv_z], -1),
    ], -2)                                           # (N,2,3)

    # dp/ddelta = [ I | -hat(p) ]
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    zero = jnp.zeros_like(px)
    neg_hat = jnp.stack([
        jnp.stack([zero, pz, -py], -1),
        jnp.stack([-pz, zero, px], -1),
        jnp.stack([py, -px, zero], -1),
    ], -2)                                           # (N,3,3) = -hat(p)
    J_pose = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), neg_hat.shape), neg_hat,
    ], -1)                                           # (N,3,6)
    J = J_proj @ J_pose                              # (N,2,6)
    return uv, p, J


def pose_only_gn(
    R0: jnp.ndarray, t0: jnp.ndarray,
    X: jnp.ndarray, uv_obs: jnp.ndarray, w_valid: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    sigma2: jnp.ndarray = None,
    rounds: int = 4, iters: int = 10,
    huber_delta: float = 2.447,
) -> PoseOptResult:
    """Robust pose-only Gauss-Newton.

    X: (N,3) world points; uv_obs: (N,2) undistorted observations;
    w_valid: (N,) bool — which rows participate at all.
    sigma2: (N,) per-observation variance (octave-scaled like ORB-SLAM's
    invSigma2); defaults to 1.
    """
    if sigma2 is None:
        sigma2 = jnp.ones(X.shape[0], X.dtype)
    inv_sigma2 = 1.0 / sigma2

    def gn_iter(carry, _):
        R, t, inlier = carry

        def one_step(Rt):
            R, t = Rt
            uv, p, J = _project_and_jacobian(R, t, X, fx, fy, cx, cy)
            r = uv - uv_obs                          # (N,2)
            chi2 = jnp.sum(r * r, -1) * inv_sigma2
            # Huber: w = 1 for |r| <= delta, delta/|r| beyond.
            nrm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w_huber = jnp.minimum(1.0, huber_delta / nrm)
            w = (w_valid & inlier & (p[:, 2] > 1e-3)).astype(X.dtype) \
                * w_huber * inv_sigma2
            H = jnp.einsum('nia,n,nib->ab', J, w, J)
            b = jnp.einsum('nia,n,ni->a', J, w, r)
            H = H + 1e-6 * jnp.eye(6, dtype=X.dtype)
            delta = -jnp.linalg.solve(H, b[:, None])[:, 0]
            dR, dt = se3_exp(delta)
            return se3_compose(dR, dt, R, t)

        Rt = (R, t)
        for _ in range(iters):
            Rt = one_step(Rt)
        R, t = Rt
        # Reclassify outliers at chi2 threshold for the next round.
        uv, p, _ = _project_and_jacobian(R, t, X, fx, fy, cx, cy)
        chi2 = jnp.sum((uv - uv_obs) ** 2, -1) * inv_sigma2
        inlier = w_valid & (chi2 < CHI2_2DOF) & (p[:, 2] > 1e-3)
        return (R, t, inlier), None

    init = (R0, t0, w_valid)
    (R, t, inlier), _ = jax.lax.scan(gn_iter, init, None, length=rounds)

    uv, p, _ = _project_and_jacobian(R, t, X, fx, fy, cx, cy)
    chi2_all = jnp.sum((uv - uv_obs) ** 2, -1) * inv_sigma2
    chi2 = jnp.sum(jnp.where(inlier, jnp.minimum(chi2_all, CHI2_2DOF), 0.0))
    return PoseOptResult(R=R, t=t, inlier=inlier, chi2=chi2,
                         n_inliers=jnp.sum(inlier.astype(jnp.int32)))


class TrackResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    matches: Matches        # landmark-row -> keypoint-column matches
    inlier: jnp.ndarray     # (L,) bool over landmark rows
    in_view: jnp.ndarray    # (L,) bool — predicted visible this frame
    n_inliers: jnp.ndarray  # () int32


def track_frame(
    # Predicted pose (camera-from-world).
    R_pred: jnp.ndarray, t_pred: jnp.ndarray,
    # Landmark window: positions, descriptors, validity.
    lm_pos: jnp.ndarray, lm_desc: jnp.ndarray, lm_valid: jnp.ndarray,
    # Current frame keypoints (undistorted), descriptors, validity.
    kp_uv: jnp.ndarray, kp_desc: jnp.ndarray, kp_valid: jnp.ndarray,
    kp_octave: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int,
    cfg: TrackingConfig,
    scale_factor: float = 1.2,
    search_radius: float = None,
    R_rescue: jnp.ndarray = None,
    t_rescue: jnp.ndarray = None,
    enable_rescue: bool = True,
    lm_normal: jnp.ndarray = None,      # (L,3) mean viewing direction
    lm_dist_min: jnp.ndarray = None,    # (L,) scale-invariance band
    lm_dist_max: jnp.ndarray = None,    # (L,); 0 = no stats, ungated
    n_levels: int = 8,
) -> TrackResult:
    """One tracking step: two-pass search-by-projection + robust pose GN
    (the TrackWithMotionModel -> TrackLocalMap sequence of ORB-SLAM3's
    Tracking, fused into one dispatch: match at the predicted pose,
    optimize, re-match at the refined pose with a tighter window,
    re-optimize)."""
    radius = cfg.search_radius_px if search_radius is None else search_radius
    gated = lm_normal is not None and lm_dist_max is not None

    def project(R, t):
        """Frustum test + ORB-SLAM's isInFrustum gates: viewing-angle
        vs the landmark's mean viewing direction, distance inside the
        scale-invariance band, and the predicted pyramid octave
        (PredictScale) for the matcher's octave window. Landmarks with
        dist_max == 0 (no stats, e.g. merge imports) pass ungated."""
        p = lm_pos @ R.T + t[None]
        z = p[:, 2]
        uv = jnp.stack([
            fx * p[:, 0] / jnp.maximum(z, 1e-6) + cx,
            fy * p[:, 1] / jnp.maximum(z, 1e-6) + cy,
        ], -1)
        in_view = (lm_valid & (z > 0.01)
                   & (uv[:, 0] >= 0) & (uv[:, 0] < width)
                   & (uv[:, 1] >= 0) & (uv[:, 1] < height))
        if not gated:
            L = lm_pos.shape[0]
            return uv, in_view, jnp.zeros((L,), jnp.int32), \
                jnp.zeros((L,), bool)
        C = -(R.T @ t[:, None])[:, 0]
        d = lm_pos - C[None]
        dist = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-6)
        view_cos = jnp.sum(d * lm_normal, -1) / dist
        has = lm_dist_max > 0
        # The stored band spans the pyramid's scale range
        # (scale_factor^(n_levels-1)); with few pyramid levels that is
        # a sliver (1.2^2 = 1.44x at n_levels=3) and a marching camera
        # exits it between keyframe-rate refreshes — measured: the
        # 8-lane merge scenario (n_levels=3) lost a lane at step 9
        # with the raw band, all lanes survive without it, and the
        # inlier decay it was blamed for is scene turnover (identical
        # with the gate ablated). Floor the GATED width at 6 octaves
        # equivalent (n_levels >= 7 configs unchanged); descriptor
        # matching tolerates moderate scale change, the pyramid range
        # is a lower bound on validity, not an upper.
        # (cfg.lm_band_floor_octaves; 0 restores the raw band.)
        floor_ratio = scale_factor ** max(n_levels - 1,
                                          cfg.lm_band_floor_octaves)
        g = jnp.sqrt(jnp.maximum(lm_dist_min, 1e-9)
                     * jnp.maximum(lm_dist_max, 1e-9))
        half = float(floor_ratio) ** 0.5
        dmin_eff = jnp.minimum(lm_dist_min, g / half)
        dmax_eff = jnp.maximum(lm_dist_max, g * half)
        ok = (view_cos > 0.5) & (dist >= 0.8 * dmin_eff) \
            & (dist <= 1.3 * dmax_eff)
        in_view = in_view & (ok | ~has)
        # PredictScale: level = ceil(log(dmax / dist) / log(s)).
        ratio = jnp.maximum(lm_dist_max, 1e-6) / dist
        lvl = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-6))
                       / jnp.log(scale_factor))
        lvl = jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)
        return uv, in_view, lvl, has

    def match_and_optimize(R, t, rad, gn_rounds):
        uv_pred, in_view, lvl, has = project(R, t)
        # Window radius scales with the predicted octave (ORBmatcher
        # SearchByProjection widens by scaleFactors[nPredictedLevel]).
        rad_row = rad * jnp.where(
            has, scale_factor ** lvl.astype(jnp.float32), 1.0)
        # Octave window: ORB-SLAM gates SearchByProjection to +-1 level
        # of the predicted scale. On our synthetic worlds the detector's
        # octave assignment is NOISY (dot features redetect 2-3 levels
        # off: measured 8-14% of TRUE keyframe associations at
        # |dlvl|>=2), and with no ratio test the suppressed true match
        # mis-binds to a similar-texture neighbour — an 8 m march into
        # new territory rotted to 0.465 m KF RMS at slack 1 and healed
        # to 0.039 m at slack 2 (weld scenario A/B, round 4). Slack 2
        # keeps the protective band while tolerating the octave noise.
        window = projection_window_mask(
            uv_pred, kp_uv, rad_row,
            octave_pred=lvl, octave_kp=kp_octave,
            octave_slack=cfg.octave_slack, octave_gate=has)
        # NO ratio test here: the projection window is the
        # discriminator (ORBmatcher::SearchByProjection does the same);
        # a ratio test against a map full of similar-texture landmarks
        # kills true matches wholesale. Mutuality still enforces 1-1.
        m, mc = match_descriptors(lm_desc, kp_desc, in_view, kp_valid,
                                  max_dist=float(cfg.hamming_th_high),
                                  ratio=1e9, mutual=True,
                                  extra_mask=window, return_col=True)
        # Pose GN runs in COLUMN (keypoint) space: M rows instead of
        # the landmark capacity L. The GN chain is ~60 batched small-
        # matmul Jacobian iterations; at flagship capacity (L=16384,
        # M=256) the row-space form wasted 64x of every one of them —
        # measured 13.7 ms/track_frame on v5e, dominated exactly here.
        # Observations (kp_uv) and octaves are already per-keypoint (no
        # gather at all); the matched landmark positions are an M-row
        # exact f32 take (M is small — this is NOT an L-sized gather).
        L = lm_pos.shape[0]
        X_col = jnp.take(lm_pos, jnp.clip(mc.idx, 0, L - 1), axis=0)
        sigma2 = (scale_factor ** kp_octave.astype(jnp.float32)) ** 2
        opt = pose_only_gn(R, t, X_col, kp_uv, mc.valid,
                           fx, fy, cx, cy, sigma2=sigma2,
                           huber_delta=cfg.huber_delta,
                           iters=cfg.pose_gn_inner, rounds=gn_rounds)
        # Map the per-keypoint inlier verdicts back onto landmark rows
        # (consumers index by row: landmark stats, keyframe insertion).
        # {0,1} one-hot matvec, not an L-sized gather (near-serial on
        # TPU); 0/1 values are exact in bf16.
        cols = jnp.arange(kp_uv.shape[0], dtype=jnp.int32)
        onehot = (m.idx[:, None] == cols[None, :]).astype(jnp.bfloat16)
        inl_rows = m.valid & (
            onehot @ opt.inlier.astype(jnp.bfloat16) > 0.5)
        opt = opt._replace(inlier=inl_rows)
        return m, opt, in_view

    # Pass 1: wide window at the motion-model prediction.
    _, opt1, _ = match_and_optimize(R_pred, t_pred, radius, 2)
    # Pass 2: tight window at the refined pose (recovers landmarks the
    # prediction error pushed outside the first window).
    m, opt, in_view = match_and_optimize(
        opt1.R, opt1.t, jnp.minimum(radius, 9.0), 4)

    # In-graph rescue: if the two-pass track starved, retry once with a
    # very wide window from the rescue base (the last accepted pose —
    # the motion-model extrapolation is the usual culprit when matching
    # starves). Folded into the dispatch so no host sync sits in the
    # tracking loop.
    Rb = R_pred if R_rescue is None else R_rescue
    tb = t_pred if t_rescue is None else t_rescue

    def rescue(_):
        full = float(max(width, height))
        _, o1, _ = match_and_optimize(Rb, tb, full, 2)
        return match_and_optimize(o1.R, o1.t, 9.0, 4)

    def keep(_):
        return m, opt, in_view

    if enable_rescue:
        m, opt, in_view = jax.lax.cond(
            opt.n_inliers < cfg.min_track_matches, rescue, keep, None)

    return TrackResult(R=opt.R, t=opt.t, matches=m, inlier=opt.inlier,
                       in_view=in_view, n_inliers=opt.n_inliers)
