"""Bundle adjustment: sparse Gauss-Newton with Schur-complement
landmark elimination, entirely in XLA.

TPU-native replacement for ORB-SLAM3's Optimizer::LocalBundleAdjustment
and RunGlobalBundleAdjustment on g2o (slam_backends/orb_slam_3/
CMakeLists.txt:51,61,107). g2o builds a heap graph and a CHOLMOD sparse
solve; here the problem is dense-blocked and fixed-shape:

- The window is either the ``ba_window`` covisibility/recency keyframes
  (local BA at keyframe rate), a wide recency window (periodic drift
  polish), or every valid keyframe (global BA after loop closure) —
  ONE engine, three window policies.
- Observations are the window's dense (W, N) keypoint->landmark table —
  no graph construction at all; invalid slots carry zero weight.
- Landmark (3x3) blocks are eliminated in closed form (batched inverse
  over the full landmark table), the reduced (W*6)^2 camera system is
  solved dense — at W=8 that is a 48x48 solve, microseconds on the MXU.
- The edge->vertex assembly (per-observation Hessian blocks summed per
  landmark) and the landmark-position reads run through ops/segsum
  ObsMap: {0,1} one-hot matmuls on the MXU — XLA's general
  scatter/gather lowers near-serially on TPU and dominated the round-1
  BA cost (46 ms local / 251 ms wide on v5e; the jnp.unique window
  compaction alone was ~21 ms).
- Robustness: Huber weights on the chi2 with per-octave sigma, a
  Levenberg damping term, and a fixed iteration count (data-independent
  control flow; jit-friendly).
- Memory: the ObsMap one-hot is (ML, W*N) bf16 — at flagship
  capacities (W=MK=256, ML=16384, N=1250) that is ~10.5 GB, an HBM
  OOM on a 16 GB chip. Windows wider than ``kf_chunk`` keyframes are
  therefore assembled by a lax.scan over keyframe chunks: one
  (ML, kf_chunk*N) one-hot lives at a time (~2.6 GB at flagship),
  while the Schur solve still runs jointly over the full window.

Landmarks observed fewer than 2 times inside the window get a zero
update (their information is rank-deficient in-window); out-of-window
observations are not included — the standard local-BA approximation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from send_slam_tpu.config import MapConfig
from send_slam_tpu.geometry.se3 import se3_compose, se3_exp
from send_slam_tpu.models.map_state import MapState
from send_slam_tpu.ops.segsum import ObsMap

CHI2_2DOF = 5.991


def wide_bundle_adjustment(m: MapState, K, cfg: MapConfig,
                           max_window: int = 64, iters: int = 5) -> MapState:
    """Periodic drift polish: wide-window BA (up to ``max_window``
    recent keyframes) at a fraction of the keyframe rate."""
    wide = dataclasses.replace(
        cfg, ba_window=min(cfg.max_keyframes, max_window))
    return local_bundle_adjustment(m, K, wide, iters=iters)


def global_bundle_adjustment(m: MapState, K, cfg: MapConfig,
                             iters: int = 8) -> MapState:
    """Whole-map BA over ALL valid keyframes and landmarks (ORB-SLAM3's
    RunGlobalBundleAdjustment after a loop closure). Same engine as the
    local window with W = max_keyframes; windows wider than kf_chunk
    assemble chunk-by-chunk so the observation one-hot stays bounded
    (see module docstring memory note)."""
    whole = dataclasses.replace(cfg, ba_window=cfg.max_keyframes)
    return local_bundle_adjustment(m, K, whole, iters=iters)


def _obs_terms(kf_R, kf_t, kf_uv, inv_sigma2, obs_valid,
               x, y, zw, fx, fy, cx, cy, huber_delta):
    """Residuals, robust weights and Jacobian planes for a window block.

    All per-observation tensors are COMPONENT-WISE (W, N) planes —
    keeping N (then ML) on the lane axis; the stacked (W, N, 2, 6)
    Jacobian form pads its trailing dims ~20x and dominated the BA
    iteration cost on TPU. Returns (ru, rv, wgt, Jp_u, Jp_v, Jt_u,
    Jt_v, pz) with the J* stacks shaped (W, 6|3, N)."""
    def Rc(i, j):
        return kf_R[:, i, j][:, None]                   # (W,1)

    px = Rc(0, 0) * x + Rc(0, 1) * y + Rc(0, 2) * zw + kf_t[:, 0:1]
    py = Rc(1, 0) * x + Rc(1, 1) * y + Rc(1, 2) * zw + kf_t[:, 1:2]
    pz = Rc(2, 0) * x + Rc(2, 1) * y + Rc(2, 2) * zw + kf_t[:, 2:3]
    z = jnp.maximum(pz, 1e-6)
    inv_z = 1.0 / z
    ru = fx * px * inv_z + cx - kf_uv[..., 0]           # (W,N)
    rv = fy * py * inv_z + cy - kf_uv[..., 1]

    chi2 = (ru * ru + rv * rv) * inv_sigma2
    nrm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.minimum(1.0, huber_delta / nrm)
    wgt = (obs_valid & (pz > 1e-3)).astype(jnp.float32) \
        * w_huber * inv_sigma2                          # (W,N)

    # Pose Jacobian rows (left-increment SE3 convention, same math
    # as the stacked J_proj @ [I | -hat(p)] form):
    xz = px * inv_z
    yz = py * inv_z
    Jp_u = jnp.stack([
        fx * inv_z, jnp.zeros_like(z), -fx * xz * inv_z,
        -fx * xz * yz, fx * (1.0 + xz * xz), -fx * yz,
    ], axis=1)                                          # (W,6,N)
    Jp_v = jnp.stack([
        jnp.zeros_like(z), fy * inv_z, -fy * yz * inv_z,
        -fy * (1.0 + yz * yz), fy * xz * yz, fy * xz,
    ], axis=1)                                          # (W,6,N)

    # Point Jacobian rows: J_pt = J_proj @ R.
    Jt_u = jnp.stack([
        fx * inv_z * Rc(0, b) - fx * xz * inv_z * Rc(2, b)
        for b in range(3)], axis=1)                     # (W,3,N)
    Jt_v = jnp.stack([
        fy * inv_z * Rc(1, b) - fy * yz * inv_z * Rc(2, b)
        for b in range(3)], axis=1)                     # (W,3,N)
    return ru, rv, wgt, Jp_u, Jp_v, Jt_u, Jt_v, pz


def _block_assembly(om_b: ObsMap, ru, rv, wgt, Jp_u, Jp_v, Jt_u, Jt_v):
    """Hessian/gradient blocks for one window block of Wb keyframes.

    Returns (H_pp (Wb,6,6), b_p (Wb,6), acc_t (12, ML) — the 3x3
    landmark blocks + 3-row landmark gradient in L-minor layout —
    and H_pl (Wb,18,ML))."""
    Wb, _, N = Jp_u.shape
    H_pp = jnp.einsum('wan,wn,wbn->wab', Jp_u, wgt, Jp_u) \
        + jnp.einsum('wan,wn,wbn->wab', Jp_v, wgt, Jp_v)
    b_p = jnp.einsum('wan,wn->wa', Jp_u, wgt * ru) \
        + jnp.einsum('wan,wn->wa', Jp_v, wgt * rv)      # (Wb,6)
    Hpl_obs = jnp.einsum('wan,wn,wcn->wacn', Jp_u, wgt, Jt_u) \
        + jnp.einsum('wan,wn,wcn->wacn', Jp_v, wgt, Jt_v)  # (Wb,6,3,N)
    Hll_obs = jnp.einsum('wbn,wn,wcn->wbcn', Jt_u, wgt, Jt_u) \
        + jnp.einsum('wbn,wn,wcn->wbcn', Jt_v, wgt, Jt_v)  # (Wb,3,3,N)
    bl_obs = Jt_u * (wgt * ru)[:, None, :] \
        + Jt_v * (wgt * rv)[:, None, :]                 # (Wb,3,N)

    # Landmark-side assembly: one fused (12, Wb*N) segment sum
    # straight into L-minor layout. EXACT (hi+lo two-pass) on TPU:
    # plain bf16 rounding (~0.4% relative) on the landmark Hessian/
    # gradient blocks and the cross blocks is NOT absorbed by the
    # Levenberg damping when the window's gauge is weakly anchored —
    # the monocular scale direction has near-zero true curvature, so
    # 0.4% noise on the large entries swamps it and the solve walks
    # the whole map along it. Measured (round 4, TPU bench scenario):
    # bf16 assembly inflated the map 6.7x over the last keyframes and
    # left stream ATE at 0.14-0.20; exact paths gave 0.019 with scale
    # parity to CPU. The extra MXU pass costs ~1 ms per BA dispatch.
    vals_t = jnp.concatenate([
        Hll_obs.reshape(Wb, 9, N), bl_obs], axis=1)     # (Wb,12,N)
    acc_t = om_b.seg_sum_t(
        vals_t.transpose(1, 0, 2).reshape(12, Wb * N),
        exact=True)                                     # (12, ML)
    # Pose-landmark cross blocks, L-minor: (Wb, 18, ML).
    H_pl = om_b.seg_sum_batched_t(Hpl_obs.reshape(Wb, 18, N),
                                  exact=True)
    return H_pp, b_p, acc_t, H_pl


def _lm_block_inverse(acc_t, lam_it, lm_free):
    """Damped closed-form 3x3 inverses by the adjugate, elementwise
    over ML lanes (batched linalg.inv on (ML,3,3) measures 4.4x slower
    on v5e). acc_t: (12, ML) from _block_assembly (summed over blocks).
    Returns (H_ll_inv (3,3,ML), b_l (3, ML))."""
    Hl = acc_t[:9].reshape(3, 3, -1)
    b_l = acc_t[9:]                                      # (3, ML)
    lam_l = lam_it * jnp.maximum(
        (Hl[0, 0] + Hl[1, 1] + Hl[2, 2]) / 3.0, 1e-6)    # (ML,)
    a_ = Hl[0, 0] + lam_l
    b_ = Hl[0, 1]
    c_ = Hl[0, 2]
    d_ = Hl[1, 0]
    e_ = Hl[1, 1] + lam_l
    f_ = Hl[1, 2]
    g_ = Hl[2, 0]
    h_ = Hl[2, 1]
    i_ = Hl[2, 2] + lam_l
    A_ = e_ * i_ - f_ * h_
    B_ = c_ * h_ - b_ * i_
    C_ = b_ * f_ - c_ * e_
    D_ = f_ * g_ - d_ * i_
    E_ = a_ * i_ - c_ * g_
    F_ = c_ * d_ - a_ * f_
    G_ = d_ * h_ - e_ * g_
    H_ = b_ * g_ - a_ * h_
    I_ = a_ * e_ - b_ * d_
    det = a_ * A_ + b_ * D_ + c_ * G_
    inv_det = jnp.where(lm_free & (jnp.abs(det) > 1e-12),
                        1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0),
                        0.0)                              # (ML,)
    H_ll_inv = jnp.stack([
        jnp.stack([A_, B_, C_]), jnp.stack([D_, E_, F_]),
        jnp.stack([G_, H_, I_]),
    ]) * inv_det                                          # (3,3,ML)
    return H_ll_inv, b_l


def _schur_solve(H_pp, b_p, acc_t, H_pl, lam_it, lm_free, pose_free):
    """Eliminate landmarks, solve the reduced camera system, back-
    substitute. Returns (delta_p (W,6), delta_lt (3,ML))."""
    W = H_pp.shape[0]
    H_ll_inv, b_l = _lm_block_inverse(acc_t, lam_it, lm_free)

    T = jnp.einsum('wabl,bcl->wacl', H_pl, H_ll_inv)      # (W,6,3,ML)
    A2 = T.reshape(W * 6, -1)
    B2 = H_pl.reshape(W * 6, -1)
    S = (A2 @ B2.T).reshape(W, 6, W, 6).transpose(0, 2, 1, 3)
    b_red = b_p - (A2 @ b_l.reshape(-1)).reshape(W, 6)    # (W,6)

    lam_p = lam_it * jnp.maximum(
        jnp.einsum('waa->w', H_pp)[:, None, None] / 6.0, 1e-6)
    S_full = -S
    S_full = S_full.at[jnp.arange(W), jnp.arange(W)].add(
        H_pp + lam_p * jnp.eye(6))

    # Fixed poses: identity rows/cols, zero rhs.
    free = pose_free.astype(jnp.float32)
    mask2 = free[:, None] * free[None, :]
    S_full = S_full * mask2[:, :, None, None]
    S_full = S_full.at[jnp.arange(W), jnp.arange(W)].add(
        (1.0 - free)[:, None, None] * jnp.eye(6))
    b_red = b_red * free[:, None]

    A = S_full.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
    delta_p = -jnp.linalg.solve(A, b_red.reshape(-1)[:, None])[:, 0]
    delta_p = delta_p.reshape(W, 6) * free[:, None]

    # Back-substitution for landmarks (H_pl is already per-landmark
    # — no scatter needed, and the position update is a plain add
    # into the full table).
    Hpl_dp = jnp.einsum('wacl,wa->cl', H_pl, delta_p)    # (3,ML)
    delta_lt = -jnp.einsum('bcl,cl->bl', H_ll_inv, b_l + Hpl_dp)
    delta_lt = delta_lt * lm_free[None, :]               # (3,ML)
    return delta_p, delta_lt


def _final_residuals(kf_R, kf_t, kf_uv, inv_sigma2, x, y, zw):
    """chi2 + depth of every window observation at the final state —
    the post-BA outlier-prune test. All (W, N) planes."""
    def Rc(R, i, j):
        return R[:, i, j][:, None]

    px = Rc(kf_R, 0, 0) * x + Rc(kf_R, 0, 1) * y \
        + Rc(kf_R, 0, 2) * zw + kf_t[:, 0:1]
    py = Rc(kf_R, 1, 0) * x + Rc(kf_R, 1, 1) * y \
        + Rc(kf_R, 1, 2) * zw + kf_t[:, 1:2]
    pz = Rc(kf_R, 2, 0) * x + Rc(kf_R, 2, 1) * y \
        + Rc(kf_R, 2, 2) * zw + kf_t[:, 2:3]
    return px, py, pz


def local_bundle_adjustment(
    m: MapState,
    K: jnp.ndarray,
    cfg: MapConfig,
    iters: int = 5,
    huber_delta: float = 2.447,
    damping: float = 1e-3,
    scale_factor: float = 1.2,
    n_fixed: int = 2,
    window_ids: jnp.ndarray = None,
    prune=True,
    chi2_prune_mult: float = 4.0,
    kf_chunk: int = 64,
) -> MapState:
    """Run BA over a keyframe window; returns the map with refined
    window poses and landmark positions.

    window_ids: optional (W,) int32 keyframe ids, sorted ascending and
    padded with MK for empty slots (covisibility windows —
    covisibility.covis_window_ids). Default: the most recent
    ``cfg.ba_window`` keyframes (pure recency).

    damping may be a traced scalar (the amortized per-frame BA slices
    pass an externally-decayed lambda); with iters > 1 it decays by
    halving per iteration, floored at 1% of the initial value —
    constant damping measurably stalls terminal convergence.

    prune (bool or traced bool) gates the post-BA observation pruning;
    chi2_prune_mult scales its threshold (ORB-SLAM erases at 1x chi2
    after full convergence; partially-converged windows need headroom).

    Windows wider than ``kf_chunk`` assemble via a lax.scan over
    keyframe chunks so the ObsMap one-hot stays (ML, kf_chunk*N)."""
    MK = m.max_keyframes
    ML = m.max_landmarks
    N = m.n_keypoints
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    if window_ids is None:
        W = cfg.ba_window
        start = jnp.maximum(m.n_kf - W, 0)
        win_ids = start + jnp.arange(W, dtype=jnp.int32)
    else:
        W = window_ids.shape[0]
        win_ids = window_ids
    chunked = W > kf_chunk
    if chunked and W % kf_chunk != 0:
        pad = kf_chunk - W % kf_chunk
        win_ids = jnp.concatenate(
            [win_ids, jnp.full((pad,), MK, jnp.int32)])
        W = W + pad
    win_ok = win_ids < jnp.minimum(m.n_kf, MK)
    gid = jnp.clip(win_ids, 0, MK - 1)

    kf_R = m.kf_R[gid]          # (W,3,3)
    kf_t = m.kf_t[gid]          # (W,3)
    kf_uv = m.kf_uv[gid]        # (W,N,2)
    kf_oct = m.kf_octave[gid]   # (W,N)
    kf_obs = m.kf_obs_lm[gid]   # (W,N)
    kf_kpv = m.kf_kp_valid[gid]
    kf_ok = m.kf_valid[gid] & win_ok  # (W,)

    lm_idx = jnp.clip(kf_obs, 0, ML - 1)          # (W,N) global ids
    obs_valid = (kf_obs >= 0) & kf_kpv & kf_ok[:, None] \
        & m.lm_valid[lm_idx]

    inv_sigma2 = 1.0 / (scale_factor ** (2.0 * kf_oct.astype(jnp.float32)))

    # The oldest n_fixed window slots are gauge anchors. Two by
    # default: one keyframe pins the 6-dof frame but NOT the monocular
    # scale — with a single anchor each marching-window BA can rescale
    # freely and the map detaches from its older landmarks. The
    # bootstrap BA passes n_fixed=1 (its scale is set by the median-
    # depth normalization immediately before). When the window holds
    # fewer than n_fixed + 1 valid keyframes (covisibility windows can
    # come back nearly empty), the anchor count shrinks so the NEWEST
    # keyframe — always the last valid slot, windows are sorted
    # ascending with pads at the end — is never silently frozen.
    n_valid_w = jnp.sum(kf_ok.astype(jnp.int32))
    n_anchor = jnp.minimum(n_fixed, jnp.maximum(n_valid_w - 1, 1))
    pose_free = kf_ok & (jnp.arange(W) >= n_anchor)

    def lam_at(it):
        return jnp.maximum(damping * (0.5 ** it.astype(jnp.float32)),
                           damping * 1e-2)

    if not chunked:
        m_out = _ba_small(
            m, kf_R, kf_t, kf_uv, kf_obs, obs_valid, lm_idx, inv_sigma2,
            pose_free, iters, lam_at, huber_delta, fx, fy, cx, cy,
            prune, chi2_prune_mult, W, N, ML, kf_ok, gid, MK)
    else:
        m_out = _ba_chunked(
            m, kf_R, kf_t, kf_uv, kf_obs, obs_valid, lm_idx, inv_sigma2,
            pose_free, iters, lam_at, huber_delta, fx, fy, cx, cy,
            prune, chi2_prune_mult, W, N, ML, kf_ok, gid, MK, kf_chunk)
    return m_out


def _write_back(m, kf_R, kf_t, kf_obs_pruned, lm_pos, kf_ok, gid, MK):
    # Write the window back (scatter by window id; padded slots drop).
    sid = jnp.where(kf_ok, gid, MK)

    def upd(arr, new):
        return arr.at[sid].set(new, mode="drop")

    return m._replace(kf_R=upd(m.kf_R, kf_R), kf_t=upd(m.kf_t, kf_t),
                      kf_obs_lm=upd(m.kf_obs_lm, kf_obs_pruned),
                      lm_pos=lm_pos)


def _prune_obs(kf_obs, obs_valid, chi2, pz, prune, chi2_prune_mult,
               max_prune_frac: float = 0.25):
    """Observation pruning (the post-BA outlier erase of ORB-SLAM's
    LocalBundleAdjustment): drop in-window observations whose final
    chi2 exceeds the threshold.

    HEALTH GUARD: pruning only runs when the violating observations are
    a bounded MINORITY (<= max_prune_frac of the window's live
    observations). Outlier erasure assumes the map is right and a few
    observations are wrong; when a majority violates chi2 the GEOMETRY
    is off (mid-run drift, an under-converged window, a half-applied
    correction) and erasing by threshold amputates the map instead of
    cleaning it — a positive feedback (fewer constraints -> more drift
    -> bigger residuals) that ended the round-4 TPU bench forensics
    with 19 live landmarks and six observation-less keyframes. A bad
    epoch's true outliers survive one pass and are erased by a later
    healthy pass."""
    bad_obs = obs_valid & ((chi2 > chi2_prune_mult * CHI2_2DOF)
                           | (pz <= 1e-3))
    # Per-KEYFRAME health (rows are keyframes, (W, N)): one mis-posed
    # keyframe in an otherwise-clean window must keep its observations
    # too — the window-mean fraction would hide it.
    n_bad = jnp.sum(bad_obs.astype(jnp.float32), axis=-1, keepdims=True)
    n_live = jnp.maximum(
        jnp.sum(obs_valid.astype(jnp.float32), axis=-1, keepdims=True), 1.0)
    healthy = n_bad <= max_prune_frac * n_live
    if isinstance(prune, bool):
        if not prune:
            return kf_obs
        return jnp.where(healthy & bad_obs, -1, kf_obs)
    return jnp.where(jnp.asarray(prune) & healthy & bad_obs, -1, kf_obs)


def _robust_cost(ru, rv, inv_sigma2, mask, pz, huber_delta):
    """Total Huber-robustified reprojection cost of a window state —
    the LM acceptance metric. (W, N) planes in, scalar out."""
    chi2 = (ru * ru + rv * rv) * inv_sigma2
    d2 = huber_delta * huber_delta
    rho = jnp.where(
        chi2 <= d2, chi2,
        2.0 * huber_delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2)
    return jnp.sum(jnp.where(mask & (pz > 1e-3), rho, 0.0))


def _ba_small(m, kf_R, kf_t, kf_uv, kf_obs, obs_valid, lm_idx, inv_sigma2,
              pose_free, iters, lam_at, huber_delta, fx, fy, cx, cy,
              prune, chi2_prune_mult, W, N, ML, kf_ok, gid, MK):
    """Single-block path: one ObsMap built once, reused every
    iteration; carried observation positions advance by exact
    delta gathers."""
    om = ObsMap(jnp.where(obs_valid, lm_idx, ML).reshape(-1), ML)

    # Landmarks need >= 2 in-window observations to be updated.
    n_obs = om.seg_sum(jnp.ones((W * N, 1), jnp.float32))[:, 0]
    lm_free = (n_obs >= 2.0) & m.lm_valid          # (ML,)

    def ba_iter(carry, it):
        lam_it = lam_at(it)
        kf_R, kf_t, lm_pos, X_t = carry
        x = X_t[0].reshape(W, N)
        y = X_t[1].reshape(W, N)
        zw = X_t[2].reshape(W, N)
        ru, rv, wgt, Jp_u, Jp_v, Jt_u, Jt_v, pz0 = _obs_terms(
            kf_R, kf_t, kf_uv, inv_sigma2, obs_valid,
            x, y, zw, fx, fy, cx, cy, huber_delta)
        H_pp, b_p, acc_t, H_pl = _block_assembly(
            om, ru, rv, wgt, Jp_u, Jp_v, Jt_u, Jt_v)
        H_pl = H_pl.reshape(W, 6, 3, ML)
        delta_p, delta_lt = _schur_solve(
            H_pp, b_p, acc_t, H_pl, lam_it, lm_free, pose_free)
        delta_l = delta_lt.T                            # (ML,3)

        dR, dt = jax.vmap(se3_exp)(delta_p)
        kf_R_new, kf_t_new = jax.vmap(se3_compose)(dR, dt, kf_R, kf_t)
        # Exact (hi+lo) delta gather: bf16 step rounding compounds
        # across iterations along the weakly-curved gauge directions.
        X_t_new = X_t + om.gather_t(delta_lt, exact=True)

        # Levenberg-Marquardt step ACCEPTANCE (g2o semantics): keep the
        # candidate only if the robust cost does not increase. A near-
        # singular reduced camera system (weakly-anchored monocular
        # scale, low-parallax window) can emit a divergent step that
        # throws the whole window — round-4 TPU forensics caught a
        # single insert-burst iteration inflating the map extent 29x
        # and losing the session. A rejected slice wastes one
        # iteration; an accepted divergence destroys the map.
        c0 = _robust_cost(ru, rv, inv_sigma2, obs_valid, pz0, huber_delta)
        x2 = X_t_new[0].reshape(W, N)
        y2 = X_t_new[1].reshape(W, N)
        zw2 = X_t_new[2].reshape(W, N)
        px2, py2, pz2 = _final_residuals(
            kf_R_new, kf_t_new, kf_uv, inv_sigma2, x2, y2, zw2)
        z2 = jnp.maximum(pz2, 1e-6)
        ru2 = fx * px2 / z2 + cx - kf_uv[..., 0]
        rv2 = fy * py2 / z2 + cy - kf_uv[..., 1]
        c1 = _robust_cost(ru2, rv2, inv_sigma2, obs_valid, pz2,
                          huber_delta)
        ok = c1 <= c0

        def sel(new, old):
            return jnp.where(ok, new, old)

        return (sel(kf_R_new, kf_R), sel(kf_t_new, kf_t),
                sel(lm_pos + delta_l, lm_pos), sel(X_t_new, X_t)), None

    X_t0 = om.gather_t(m.lm_pos.T, full=True)    # f32-faithful; (3, R)
    (kf_R, kf_t, lm_pos, X_t), _ = jax.lax.scan(
        ba_iter, (kf_R, kf_t, m.lm_pos, X_t0), jnp.arange(iters))

    # The carried X_t is within one cheap delta-gather rounding (~0.4%
    # of the LAST step) of exact — far inside the chi2 prune margin.
    x = X_t[0].reshape(W, N)
    y = X_t[1].reshape(W, N)
    zw = X_t[2].reshape(W, N)
    px, py, pz = _final_residuals(kf_R, kf_t, kf_uv, inv_sigma2, x, y, zw)
    z = jnp.maximum(pz, 1e-6)
    ru = fx * px / z + cx - kf_uv[..., 0]
    rv = fy * py / z + cy - kf_uv[..., 1]
    chi2 = (ru * ru + rv * rv) * inv_sigma2
    kf_obs_pruned = _prune_obs(kf_obs, obs_valid, chi2, pz,
                               prune, chi2_prune_mult)
    return _write_back(m, kf_R, kf_t, kf_obs_pruned, lm_pos,
                       kf_ok, gid, MK)


def _ba_chunked(m, kf_R, kf_t, kf_uv, kf_obs, obs_valid, lm_idx,
                inv_sigma2, pose_free, iters, lam_at, huber_delta,
                fx, fy, cx, cy, prune, chi2_prune_mult,
                W, N, ML, kf_ok, gid, MK, kf_chunk):
    """Chunked path for wide/global windows: assembly runs as a
    lax.scan over blocks of ``kf_chunk`` keyframes, each building its
    own (ML, kf_chunk*N) one-hot — peak HBM stays bounded while the
    Schur solve still couples the FULL window. Observation positions
    are re-gathered exactly from lm_pos each iteration (no carried
    X_t: caching it across iterations would need the full one-hot)."""
    C = W // kf_chunk
    Wc = kf_chunk

    def chunk_arrays(a):
        return a.reshape((C, Wc) + a.shape[1:])

    ch = dict(
        kf_uv=chunk_arrays(kf_uv), inv_sigma2=chunk_arrays(inv_sigma2),
        obs_valid=chunk_arrays(obs_valid), lm_idx=chunk_arrays(lm_idx),
        kf_obs=chunk_arrays(kf_obs),
    )

    # Per-landmark in-window observation counts (iteration-independent):
    # one pre-pass over the chunks.
    def nobs_body(acc, inp):
        om_b = ObsMap(jnp.where(inp["obs_valid"], inp["lm_idx"],
                                ML).reshape(-1), ML)
        ones = jnp.ones((1, Wc * N), jnp.float32)
        return acc + om_b.seg_sum_t(ones)[0], None

    n_obs, _ = jax.lax.scan(
        nobs_body, jnp.zeros((ML,), jnp.float32), ch)
    lm_free = (n_obs >= 2.0) & m.lm_valid

    def cost_scan(kf_R, kf_t, lm_pos):
        """Total robust cost of a (chunked) window state."""
        lm_pos_t = lm_pos.T

        def body(acc, inp):
            om_b = ObsMap(jnp.where(inp["obs_valid"], inp["lm_idx"],
                                    ML).reshape(-1), ML)
            X_tb = om_b.gather_t(lm_pos_t, full=True)
            x = X_tb[0].reshape(Wc, N)
            y = X_tb[1].reshape(Wc, N)
            zw = X_tb[2].reshape(Wc, N)
            px, py, pz = _final_residuals(
                inp["kf_R"], inp["kf_t"], inp["kf_uv"],
                inp["inv_sigma2"], x, y, zw)
            z = jnp.maximum(pz, 1e-6)
            ru = fx * px / z + cx - inp["kf_uv"][..., 0]
            rv = fy * py / z + cy - inp["kf_uv"][..., 1]
            c = _robust_cost(ru, rv, inp["inv_sigma2"],
                             inp["obs_valid"], pz, huber_delta)
            return acc + c, None

        inp = dict(ch, kf_R=chunk_arrays(kf_R), kf_t=chunk_arrays(kf_t))
        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), inp)
        return total

    def ba_iter(carry, it):
        lam_it = lam_at(it)
        kf_R, kf_t, lm_pos = carry
        lm_pos_t = lm_pos.T                             # (3, ML)
        kf_R_ch = chunk_arrays(kf_R)
        kf_t_ch = chunk_arrays(kf_t)

        def chunk_body(acc, inp):
            c_idx, R_b, t_b = inp["i"], inp["kf_R"], inp["kf_t"]
            del c_idx
            om_b = ObsMap(jnp.where(inp["obs_valid"], inp["lm_idx"],
                                    ML).reshape(-1), ML)
            X_tb = om_b.gather_t(lm_pos_t, full=True)   # (3, Wc*N)
            x = X_tb[0].reshape(Wc, N)
            y = X_tb[1].reshape(Wc, N)
            zw = X_tb[2].reshape(Wc, N)
            ru, rv, wgt, Jp_u, Jp_v, Jt_u, Jt_v, pz0 = _obs_terms(
                R_b, t_b, inp["kf_uv"], inp["inv_sigma2"],
                inp["obs_valid"], x, y, zw, fx, fy, cx, cy, huber_delta)
            H_pp_b, b_p_b, acc_t_b, H_pl_b = _block_assembly(
                om_b, ru, rv, wgt, Jp_u, Jp_v, Jt_u, Jt_v)
            c0_b = _robust_cost(ru, rv, inp["inv_sigma2"],
                                inp["obs_valid"], pz0, huber_delta)
            acc_t_sum, c0_sum = acc
            return (acc_t_sum + acc_t_b, c0_sum + c0_b), \
                (H_pp_b, b_p_b, H_pl_b)

        inp = dict(ch, i=jnp.arange(C), kf_R=kf_R_ch, kf_t=kf_t_ch)
        (acc_t, c0), (H_pp_st, b_p_st, H_pl_st) = jax.lax.scan(
            chunk_body,
            (jnp.zeros((12, ML), jnp.float32), jnp.zeros((), jnp.float32)),
            inp)
        H_pp = H_pp_st.reshape(W, 6, 6)
        b_p = b_p_st.reshape(W, 6)
        H_pl = H_pl_st.reshape(W, 6, 3, ML)
        delta_p, delta_lt = _schur_solve(
            H_pp, b_p, acc_t, H_pl, lam_it, lm_free, pose_free)

        dR, dt = jax.vmap(se3_exp)(delta_p)
        kf_R_new, kf_t_new = jax.vmap(se3_compose)(dR, dt, kf_R, kf_t)
        lm_pos_new = lm_pos + delta_lt.T
        # LM step acceptance — same divergent-solve guard as _ba_small.
        c1 = cost_scan(kf_R_new, kf_t_new, lm_pos_new)
        ok = c1 <= c0

        def sel(new, old):
            return jnp.where(ok, new, old)

        return (sel(kf_R_new, kf_R), sel(kf_t_new, kf_t),
                sel(lm_pos_new, lm_pos)), None

    (kf_R, kf_t, lm_pos), _ = jax.lax.scan(
        ba_iter, (kf_R, kf_t, m.lm_pos), jnp.arange(iters))

    # Final residual pass (chunked) for observation pruning.
    lm_pos_t = lm_pos.T

    def resid_body(_, inp):
        om_b = ObsMap(jnp.where(inp["obs_valid"], inp["lm_idx"],
                                ML).reshape(-1), ML)
        X_tb = om_b.gather_t(lm_pos_t)
        x = X_tb[0].reshape(Wc, N)
        y = X_tb[1].reshape(Wc, N)
        zw = X_tb[2].reshape(Wc, N)
        px, py, pz = _final_residuals(
            inp["kf_R"], inp["kf_t"], inp["kf_uv"], inp["inv_sigma2"],
            x, y, zw)
        z = jnp.maximum(pz, 1e-6)
        ru = fx * px / z + cx - inp["kf_uv"][..., 0]
        rv = fy * py / z + cy - inp["kf_uv"][..., 1]
        chi2 = (ru * ru + rv * rv) * inp["inv_sigma2"]
        return None, (chi2, pz)

    inp = dict(ch, kf_R=chunk_arrays(kf_R), kf_t=chunk_arrays(kf_t))
    _, (chi2_st, pz_st) = jax.lax.scan(resid_body, None, inp)
    chi2 = chi2_st.reshape(W, N)
    pz = pz_st.reshape(W, N)
    kf_obs_pruned = _prune_obs(kf_obs, obs_valid, chi2, pz,
                               prune, chi2_prune_mult)
    return _write_back(m, kf_R, kf_t, kf_obs_pruned, lm_pos,
                       kf_ok, gid, MK)


def ba_slice(m: MapState, K, cfg: MapConfig, window_ids, lam,
             prune=False, n_fixed: int = 2, **kw) -> MapState:
    """ONE Gauss-Newton iteration over ``window_ids`` at (traced)
    damping ``lam`` — the amortized form of local BA: instead of a
    multi-iteration burst at keyframe rate stalling the frame chain,
    the System runs one slice per frame with an externally-decayed
    lambda (the TPU-native analog of ORB-SLAM3's LocalMapping thread
    overlapping Tracking: time-slicing on a single device)."""
    return local_bundle_adjustment(
        m, K, cfg, iters=1, damping=lam, window_ids=window_ids,
        prune=prune, n_fixed=n_fixed, **kw)
