"""Monocular two-view initialization: batched-hypothesis RANSAC.

TPU-native re-design of ORB-SLAM3's TwoViewReconstruction
(slam_backends/orb_slam_3/CMakeLists.txt:73). The C++ code runs
sequential RANSAC loops over 200 iterations; here every hypothesis is
a lane of a vmap — 8-point fundamental estimation, Sampson scoring,
essential-matrix decomposition and cheirality counting all run as
batched dense linear algebra, and the data-dependent "how many inliers"
questions become masked reductions.

Round-1 scope: fundamental-matrix path (general scenes). The planar
homography path (ORB-SLAM3's parallel H RANSAC + RH model selection)
uses the same machinery via geometry/epipolar.homography_dlt and is
wired in models/system.py when needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from send_slam_tpu.config import TrackingConfig
from send_slam_tpu.geometry.epipolar import (
    eight_point_essential, homography_dlt, homography_error,
    refine_rt_sampson, sampson_error,
)
from send_slam_tpu.geometry.se3 import hat
from send_slam_tpu.geometry.homography import decompose_homography
from send_slam_tpu.geometry.triangulate import triangulate_batch
from send_slam_tpu.ops.hamming import Matches, match_descriptors


class InitResult(NamedTuple):
    ok: jnp.ndarray            # () bool — initialization accepted
    R: jnp.ndarray             # (3,3) — camera2-from-camera1 rotation
    t: jnp.ndarray             # (3,) — unit-scale translation
    points: jnp.ndarray        # (N,3) — triangulated points (world=cam1)
    point_ok: jnp.ndarray      # (N,) bool — survived cheirality/reproj
    matches: Matches           # A->B descriptor matches used
    n_good: jnp.ndarray        # () int32
    # Quality score for multi-pair selection (System._try_initialize):
    # support x parallax discount x symmetric-error discount. Support
    # is the dominant downstream-quality signal (the E-matrix accuracy
    # that epipolar-gated triangulation depends on tracks n_good; a
    # 94-point pair beat a 72-point wider-baseline pair by 6x e2e ATE
    # — rewarding EXCESS baseline picks pairs whose matching already
    # degraded). The parallax discount saturates at
    # cfg.init_par_saturation x the acceptance minimum: wide enough
    # that the rotation-ambiguous ~1-deg pairs (the round-4 sweep's
    # worst-tail mechanism) cannot strong-commit over a comparable-
    # support pair a few frames wider.
    score: jnp.ndarray         # () f32 = n_good * par_disc * err_disc


def _sample_minimal_sets(key, valid, n_hyp: int, k: int):
    """(n_hyp, k) DISTINCT indices drawn uniformly from valid entries
    via Gumbel-top-k: one (n_hyp, N) noise draw, one top_k — no
    sequential rejection loops, no duplicate-sample degeneracy."""
    g = jax.random.gumbel(key, (n_hyp, valid.shape[0]))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _decompose_essential(E):
    """E -> (4, 3, 3) R and (4, 3) t candidate pairs."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    del d
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _score_motion(R, t, K, x1, x2, valid, reproj_th2, min_parallax_cos):
    """Triangulate all matches under (R, t) and count good points.

    Good = finite, positive depth in both views, reprojection error
    under threshold in both views, parallax above threshold."""
    P1 = K @ jnp.concatenate([jnp.eye(3, dtype=K.dtype), jnp.zeros((3, 1), K.dtype)], 1)
    P2 = K @ jnp.concatenate([R, t[:, None]], 1)
    X = triangulate_batch(P1, P2, x1, x2)            # (N,3) in cam1
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]

    def reproj(P, X, x):
        h = jnp.concatenate([X, jnp.ones_like(X[:, :1])], 1) @ P.T
        uv = h[:, :2] / jnp.where(jnp.abs(h[:, 2:3]) < 1e-9, 1e-9, h[:, 2:3])
        return jnp.sum((uv - x) ** 2, -1)

    e1 = reproj(P1, X, x1)
    e2 = reproj(P2, X, x2)

    # Parallax: angle between rays from the two camera centers.
    C2 = -(R.T @ t)                                   # cam2 center in cam1
    r1 = X
    r2 = X - C2[None]
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)

    finite = jnp.all(jnp.isfinite(X), -1)
    good = (valid & finite & (z1 > 0) & (z2 > 0)
            & (e1 < reproj_th2) & (e2 < reproj_th2)
            & (cos_par < min_parallax_cos))
    # Symmetric transfer error per point (px^2, both views) — feeds
    # the multi-pair quality score: equal-support pairs are separated
    # by how tightly the reconstruction explains the measurements.
    return X, good, cos_par, e1 + e2


def two_view_init(
    uv_a: jnp.ndarray, desc_a: jnp.ndarray, valid_a: jnp.ndarray,
    angle_a: jnp.ndarray,
    uv_b: jnp.ndarray, desc_b: jnp.ndarray, valid_b: jnp.ndarray,
    angle_b: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    cfg: TrackingConfig,
    par_scale=None,
) -> InitResult:
    """Attempt monocular initialization between frames A (reference,
    becomes world origin) and B (current). All inputs fixed-capacity
    with validity masks; fully jittable.

    ``par_scale`` (traced scalar, default 1) multiplies the
    median-parallax acceptance floor: after a scale-collapse reset the
    host raises it (init_collapse_par_boost ** resets) so the retry
    waits for a better-conditioned pair instead of re-committing from
    the same starved-parallax gap distribution."""
    m = match_descriptors(desc_a, desc_b, valid_a, valid_b,
                          max_dist=float(cfg.hamming_th_low), ratio=0.9,
                          mutual=True, angles_a=angle_a, angles_b=angle_b)
    x1 = uv_a                                          # (N,2)
    x2 = uv_b[jnp.clip(m.idx, 0, uv_b.shape[0] - 1)]
    mvalid = m.valid

    # --- RANSAC over ESSENTIAL matrices (K is known) -------------------
    # Work in normalized camera coords; Sampson threshold scales by the
    # focal lengths (3.841 px^2 at sigma = 1 px).
    fx, fy = K[0, 0], K[1, 1]
    Kinv = jnp.linalg.inv(K)
    def norm_pts(x):
        h = jnp.concatenate([x, jnp.ones_like(x[:, :1])], -1) @ Kinv.T
        return h[:, :2]
    x1n = norm_pts(x1)
    x2n = norm_pts(x2)
    th2 = 3.841 / (fx * fy)

    idx = _sample_minimal_sets(key, mvalid, cfg.init_ransac_iters, 8)
    Es = jax.vmap(eight_point_essential)(x1n[idx], x2n[idx])
    errs = jax.vmap(lambda E: sampson_error(E, x1n, x2n))(Es)  # (n_hyp, N)
    inl = (errs < th2) & mvalid[None, :]
    scores = jnp.sum(inl, axis=1)

    # Repeated texture can give a *phantom* match-consensus with nearly
    # the Sampson support of the true one; only cheirality separates
    # them. And a refit on a Sampson-contaminated inlier set drags E off
    # the true geometry. So the selection is cheirality-first:
    # decompose each top-J MINIMAL-SAMPLE E (fit from 8 points only),
    # count triangulation-verified points, and only then refit E on the
    # cheirality-verified set of the winner (phantoms cannot pass the
    # true motion's triangulation gates).
    TOP_J = 16
    _, top_h = jax.lax.top_k(scores, TOP_J)

    reproj_th2 = 4.0 * 3.841                            # px^2 (pixel space)
    min_parallax_cos = 0.99998                          # ~0.36 deg per point

    def score_E(E, support):
        Rs, ts = _decompose_essential(E)
        Xs, goods, cps, errs = jax.vmap(
            lambda R, t: _score_motion(R, t, K, x1, x2, support,
                                       reproj_th2, min_parallax_cos))(Rs, ts)
        return Rs, ts, Xs, goods, cps, errs

    Rs_j, ts_j, Xs_j, goods_j, cps_j, _errs_j = jax.vmap(
        lambda h: score_E(Es[h], inl[h]))(top_h)         # (J,4,...)
    counts_j = jnp.sum(goods_j, axis=2)                  # (J,4)
    bi_flat = jnp.argmax(counts_j.reshape(-1))
    jH = bi_flat // 4

    # Refit on the winner's cheirality-verified set, then re-score over
    # the full match set.
    seed_good = goods_j.reshape(TOP_J * 4, -1)[bi_flat]
    E = eight_point_essential(x1n, x2n, weights=seed_good.astype(x1.dtype))
    f_inl = (sampson_error(E, x1n, x2n) < th2) & mvalid
    Rs4, ts4, Xs4, goods4, cps4, errs4 = score_E(E, f_inl)
    counts4 = jnp.sum(goods4, axis=1)                    # (4,)
    bi = jnp.argmax(counts4)
    n_good_E = counts4[bi]
    second_E = jnp.sort(counts4)[2]

    # --- Parallel HOMOGRAPHY path (planar / low-parallax scenes) -------
    # 4-point DLT hypotheses, symmetric-transfer scoring, Faugeras
    # decomposition into 8 motions, same cheirality gates
    # (TwoViewReconstruction's parallel H RANSAC, model chosen by which
    # reconstruction explains more points).
    key_h = jax.random.fold_in(key, 1)
    idx_h = _sample_minimal_sets(key_h, mvalid, cfg.init_ransac_iters, 4)
    Hs = jax.vmap(homography_dlt)(x1[idx_h], x2[idx_h])
    h_errs = jax.vmap(lambda Hm: homography_error(Hm, x1, x2))(Hs)
    h_th2 = 2.0 * 5.991                                   # both directions
    h_inl = (h_errs < h_th2) & mvalid[None, :]
    h_scores = jnp.sum(h_inl, axis=1)
    h_best = jnp.argmax(h_scores)
    Hbest = homography_dlt(x1, x2, weights=h_inl[h_best].astype(x1.dtype))
    h_inl_best = (homography_error(Hbest, x1, x2) < h_th2) & mvalid
    R8, t8 = decompose_homography(Hbest, K)
    Xs8, goods8, cps8, errs8 = jax.vmap(
        lambda R, t: _score_motion(R, t, K, x1, x2, h_inl_best,
                                   reproj_th2, min_parallax_cos))(R8, t8)
    counts8 = jnp.sum(goods8, axis=1)                     # (8,)
    bi_h = jnp.argmax(counts8)
    n_good_H = counts8[bi_h]
    second_H = jnp.sort(counts8)[6]

    # --- Model selection: the reconstruction explaining more points ----
    use_H = n_good_H > n_good_E
    n_good = jnp.where(use_H, n_good_H, n_good_E)
    second = jnp.where(use_H, second_H, second_E)
    f_inl = jnp.where(use_H, h_inl_best, f_inl)
    R = jnp.where(use_H, R8[bi_h], Rs4[bi])
    t = jnp.where(use_H, t8[bi_h], ts4[bi])
    X = jnp.where(use_H, Xs8[bi_h], Xs4[bi])
    point_ok = jnp.where(use_H, goods8[bi_h], goods4[bi])
    cos_par_best = jnp.where(use_H, cps8[bi_h], cps4[bi])  # (N,)
    sym_err_best = jnp.where(use_H, errs8[bi_h], errs4[bi])  # (N,) px^2

    # --- Sampson GN refinement of the selected motion -----------------
    # The algebraic refit above leaves t-direction a lottery at ~1 deg
    # parallax (round-4 tail forensics: draws 1.5/45/63/33 deg off on
    # one seed, identical observables); the geometric GN pins it to a
    # few degrees. Inliers are then RE-SELECTED under the refined E
    # (both model paths — an H-selected motion still satisfies the
    # epipolar constraint) and triangulation is re-scored so the
    # acceptance gates, parallax and quality score all describe the
    # structure tracking will actually consume.
    w_ref = (point_ok & mvalid).astype(x1n.dtype)
    R, t = refine_rt_sampson(R, t, x1n, x2n, w_ref)
    E_ref = hat(t) @ R
    f_inl = (sampson_error(E_ref, x1n, x2n) < th2) & mvalid
    X, point_ok, cos_par_best, sym_err_best = _score_motion(
        R, t, K, x1, x2, f_inl, reproj_th2, min_parallax_cos)
    n_good = jnp.sum(point_ok)

    # Median parallax of accepted points: initializing from a
    # too-small baseline bakes in garbage depths (ORB-SLAM's
    # CheckRT parallax acceptance plays the same role).
    cp = jnp.where(point_ok, cos_par_best, jnp.nan)
    med_parallax = jnp.arccos(jnp.clip(jnp.nanmedian(cp), -1.0, 1.0))
    min_par = cfg.init_min_parallax_deg * jnp.pi / 180.0
    if par_scale is not None:
        min_par = min_par * par_scale

    # Acceptance (TwoViewReconstruction-style): enough points, winner
    # clearly unique, minimum match count, adequate parallax.
    n_matches = jnp.sum(mvalid)
    # Capacity-relative support: a 50-point init is adequate at 512
    # features but WEAK at 1250 — the round-2 TPU/CPU ATE-parity audit
    # traced a 19x e2e ATE gap to one backend accepting a 54-good init
    # (t-dir error 5.5 deg) that the other rejected and retried. The
    # fraction gate scales the bar with the frame's actual feature
    # count so flagship configs demand flagship support.
    n_kp_a = jnp.sum(valid_a.astype(jnp.int32))
    min_good_rel = cfg.init_min_good_frac * n_kp_a.astype(jnp.float32)
    ok = ((n_good >= cfg.init_min_matches)
          & (n_good.astype(jnp.float32) >= min_good_rel)
          & (n_good > 0.75 * jnp.sum(f_inl))
          & (second < 0.7 * n_good)
          & (n_matches >= cfg.init_min_matches)
          & (med_parallax > min_par))

    # Normalize scale: median depth of good points -> 1 (the monocular
    # gauge fix; ORB-SLAM scales by inverse median depth too).
    z = jnp.where(point_ok, X[:, 2], jnp.nan)
    med_depth = jnp.nanmedian(z)
    scale = 1.0 / jnp.maximum(med_depth, 1e-6)
    X = X * scale
    t = t * scale

    par_factor = jnp.clip(
        jnp.nan_to_num(med_parallax)
        / jnp.maximum(cfg.init_par_saturation * min_par, 1e-6),
        0.0, 1.0)
    # Symmetric-transfer-error discount: among equal-support pairs,
    # prefer the reconstruction whose accepted points fit tightest.
    # DISABLED by default (init_err_floor=1.0): the knob shipped in
    # the same build as the regressive par-saturation A/B and has not
    # been measured in isolation; enable only with a fresh 10-seed
    # sweep. med err is px^2 over both views; a clean init sits well
    # under 2 px^2, a marginal one near the 4*3.841 threshold.
    med_err = jnp.nanmedian(jnp.where(point_ok, sym_err_best, jnp.nan))
    err_factor = jnp.clip(1.15 - jnp.nan_to_num(med_err) / (4.0 * 3.841),
                          cfg.init_err_floor, 1.0)
    score = n_good.astype(jnp.float32) * par_factor * err_factor
    return InitResult(ok=ok, R=R, t=t, points=X, point_ok=point_ok,
                      matches=m, n_good=n_good, score=score)
