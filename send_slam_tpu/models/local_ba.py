"""Local bundle adjustment: sparse Gauss-Newton with Schur-complement
landmark elimination, entirely in XLA.

TPU-native replacement for ORB-SLAM3's Optimizer::LocalBundleAdjustment
on g2o (slam_backends/orb_slam_3/CMakeLists.txt:61,107). g2o builds a
heap graph and a CHOLMOD sparse solve; here the problem is dense-blocked
and fixed-shape:

- The window is the last ``ba_window`` keyframes (the covisibility-
  recency window); the first two window poses are held fixed (monocular
  gauge + anchor, like ORB-SLAM's fixed-KF set).
- Observations are the window's dense (W, N) keypoint->landmark table —
  no graph construction at all; invalid slots carry zero weight.
- Landmark (3x3) blocks are eliminated in closed form (batched inverse
  over the landmark table), the reduced (W*6)^2 camera system is solved
  dense — at W=8 that is a 48x48 solve, microseconds on the MXU.
- Robustness: Huber weights on the chi2 with per-octave sigma, a
  Levenberg damping term, and a fixed iteration count (data-independent
  control flow; jit-friendly).

Landmarks observed fewer than 2 times inside the window get a zero
update (their information is rank-deficient in-window); out-of-window
observations are not included — the standard local-BA approximation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from send_slam_tpu.config import MapConfig
from send_slam_tpu.geometry.se3 import se3_compose, se3_exp
from send_slam_tpu.models.map_state import MapState

CHI2_2DOF = 5.991


def wide_bundle_adjustment(m: MapState, K, cfg: MapConfig,
                           max_window: int = 64, iters: int = 8) -> MapState:
    """Periodic drift polish: wide-window BA (up to ``max_window``
    recent keyframes) at a fraction of the keyframe rate. For the
    post-loop-closure whole-map refinement see
    ``global_bundle_adjustment``."""
    import dataclasses
    wide = dataclasses.replace(
        cfg, ba_window=min(cfg.max_keyframes, max_window))
    return local_bundle_adjustment(m, K, wide, iters=iters)


def global_bundle_adjustment(
    m: MapState,
    K: jnp.ndarray,
    cfg: MapConfig,
    iters: int = 8,
    chunk: int = 2048,
    huber_delta: float = 2.447,
    damping: float = 1e-3,
    scale_factor: float = 1.2,
    n_fixed: int = 2,
) -> MapState:
    """Whole-map bundle adjustment over ALL valid keyframes and ALL
    valid landmarks (ORB-SLAM3's RunGlobalBundleAdjustment after a loop
    closure, CMakeLists.txt:51,61).

    Same Schur-eliminated Gauss-Newton as the local window, but the
    (MK, ML, 6, 3) pose-landmark cross tensor would be ~1 GB at the
    flagship capacities — so the reduced-camera-system assembly
    S = Σ_l H_pl(l) H_ll(l)^-1 H_pl(l)^T is CHUNKED over the landmark
    axis with a fori_loop: each chunk materializes only a
    (MK, chunk, 6, 3) block, accumulating into the (MK, MK, 6, 6)
    reduced system. Per-observation terms (Jacobian blocks, landmark
    Hessians, back-substitution) stay observation-major over the dense
    (MK, N) table — no big intermediate at all. Memory is O(MK·N +
    MK·chunk·18 + (6·MK)^2), a few hundred MB at MK=256, N=1250."""
    MK, ML, N = m.max_keyframes, m.max_landmarks, m.n_keypoints
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    chunk = min(chunk, ML)
    while ML % chunk:
        chunk -= 1
    n_chunks = ML // chunk

    obs = m.kf_obs_lm                                     # (MK,N)
    lm_idx = jnp.clip(obs, 0, ML - 1)
    obs_valid = (obs >= 0) & m.kf_kp_valid & m.kf_valid[:, None] \
        & m.lm_valid[lm_idx]
    flat_ids = jnp.where(obs_valid, lm_idx, ML).reshape(-1)

    inv_sigma2 = 1.0 / (scale_factor
                        ** (2.0 * m.kf_octave.astype(jnp.float32)))

    ones = obs_valid.astype(jnp.float32).reshape(-1)
    lm_obs_count = jnp.zeros((ML,), jnp.float32).at[flat_ids].add(
        ones, mode="drop")
    lm_free = (lm_obs_count >= 2.0) & m.lm_valid

    ids = jnp.arange(MK)
    pose_free = m.kf_valid & (ids >= n_fixed) & (ids < m.n_kf)

    kf_uv = m.kf_uv

    def ba_iter(carry, _):
        kf_R, kf_t, lm_pos = carry
        X = lm_pos[lm_idx]                                  # (MK,N,3)
        p = jnp.einsum('wij,wnj->wni', kf_R, X) + kf_t[:, None, :]
        z = jnp.maximum(p[..., 2], 1e-6)
        inv_z = 1.0 / z
        u = fx * p[..., 0] * inv_z + cx
        v = fy * p[..., 1] * inv_z + cy
        r = jnp.stack([u, v], -1) - kf_uv                   # (MK,N,2)

        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        nrm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w_huber = jnp.minimum(1.0, huber_delta / nrm)
        wgt = (obs_valid & (p[..., 2] > 1e-3)).astype(jnp.float32) \
            * w_huber * inv_sigma2                          # (MK,N)

        zeros = jnp.zeros_like(z)
        J_proj = jnp.stack([
            jnp.stack([fx * inv_z, zeros,
                       -fx * p[..., 0] * inv_z * inv_z], -1),
            jnp.stack([zeros, fy * inv_z,
                       -fy * p[..., 1] * inv_z * inv_z], -1),
        ], -2)                                              # (MK,N,2,3)
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        zero = jnp.zeros_like(px)
        neg_hat = jnp.stack([
            jnp.stack([zero, pz, -py], -1),
            jnp.stack([-pz, zero, px], -1),
            jnp.stack([py, -px, zero], -1),
        ], -2)                                              # (MK,N,3,3)
        eye3 = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), neg_hat.shape)
        J_pose = J_proj @ jnp.concatenate([eye3, neg_hat], -1)  # (MK,N,2,6)
        J_pt = J_proj @ kf_R[:, None]                        # (MK,N,2,3)

        H_pp = jnp.einsum('wnia,wn,wnib->wab', J_pose, wgt, J_pose)
        b_p = jnp.einsum('wnia,wn,wni->wa', J_pose, wgt, r)  # (MK,6)
        Hpl_obs = jnp.einsum('wnia,wn,wnib->wnab', J_pose, wgt, J_pt)
        Hll_obs = jnp.einsum('wnia,wn,wnib->wnab', J_pt, wgt, J_pt)
        bl_obs = jnp.einsum('wnia,wn,wni->wna', J_pt, wgt, r)

        H_ll = jnp.zeros((ML, 3, 3)).at[flat_ids].add(
            Hll_obs.reshape(-1, 3, 3), mode="drop")
        b_l = jnp.zeros((ML, 3)).at[flat_ids].add(
            bl_obs.reshape(-1, 3), mode="drop")

        lam_l = damping * jnp.maximum(
            jnp.trace(H_ll, axis1=1, axis2=2)[:, None, None] / 3.0, 1e-6)
        H_ll_d = H_ll + lam_l * jnp.eye(3)
        H_ll_inv = jnp.where(
            lm_free[:, None, None], jnp.linalg.inv(
                jnp.where(lm_free[:, None, None], H_ll_d, jnp.eye(3))),
            0.0)                                            # (ML,3,3)

        rows = jnp.broadcast_to(ids[:, None], (MK, N)).reshape(-1)

        def chunk_body(c, acc):
            S, b_red = acc
            lo = c * chunk
            in_chunk = obs_valid.reshape(-1) & (flat_ids >= lo) \
                & (flat_ids < lo + chunk)
            local = jnp.where(in_chunk, flat_ids - lo, chunk)
            H_pl_c = jnp.zeros((MK, chunk, 6, 3)).at[rows, local].add(
                Hpl_obs.reshape(-1, 6, 3), mode="drop")
            Hinv_c = jax.lax.dynamic_slice(
                H_ll_inv, (lo, 0, 0), (chunk, 3, 3))
            bl_c = jax.lax.dynamic_slice(b_l, (lo, 0), (chunk, 3))
            T_c = jnp.einsum('wlab,lbc->wlac', H_pl_c, Hinv_c)
            S = S + jnp.einsum('wlac,vlbc->wvab', T_c, H_pl_c)
            b_red = b_red - jnp.einsum('wlac,lc->wa', T_c, bl_c)
            return S, b_red

        S0 = jnp.zeros((MK, MK, 6, 6))
        S, b_red = jax.lax.fori_loop(0, n_chunks, chunk_body, (S0, b_p))

        lam_p = damping * jnp.maximum(
            jnp.einsum('waa->w', H_pp)[:, None, None] / 6.0, 1e-6)
        S_full = -S
        S_full = S_full.at[ids, ids].add(H_pp + lam_p * jnp.eye(6))

        free = pose_free.astype(jnp.float32)
        mask2 = free[:, None] * free[None, :]
        S_full = S_full * mask2[:, :, None, None]
        S_full = S_full.at[ids, ids].add(
            (1.0 - free)[:, None, None] * jnp.eye(6))
        b_rhs = b_red * free[:, None]

        A = S_full.transpose(0, 2, 1, 3).reshape(MK * 6, MK * 6)
        delta_p = -jnp.linalg.solve(A, b_rhs.reshape(-1)[:, None])[:, 0]
        delta_p = delta_p.reshape(MK, 6) * free[:, None]

        # Back-substitution, observation-major.
        dp_obs = jnp.einsum('wnab,wa->wnb', Hpl_obs, delta_p)  # (MK,N,3)
        Hpl_dp = jnp.zeros((ML, 3)).at[flat_ids].add(
            dp_obs.reshape(-1, 3), mode="drop")
        delta_l = -jnp.einsum('lab,lb->la', H_ll_inv, b_l + Hpl_dp)
        delta_l = delta_l * lm_free[:, None]

        dR, dt = jax.vmap(se3_exp)(delta_p)
        kf_R_new, kf_t_new = jax.vmap(se3_compose)(dR, dt, kf_R, kf_t)
        return (kf_R_new, kf_t_new, lm_pos + delta_l), None

    (kf_R, kf_t, lm_pos), _ = jax.lax.scan(
        ba_iter, (m.kf_R, m.kf_t, m.lm_pos), None, length=iters)

    # Post-BA outlier-observation pruning at the final estimate.
    X = lm_pos[lm_idx]
    p = jnp.einsum('wij,wnj->wni', kf_R, X) + kf_t[:, None, :]
    z = jnp.maximum(p[..., 2], 1e-6)
    u = fx * p[..., 0] / z + cx
    v = fy * p[..., 1] / z + cy
    r = jnp.stack([u, v], -1) - kf_uv
    chi2 = jnp.sum(r * r, -1) * inv_sigma2
    bad_obs = obs_valid & ((chi2 > 4.0 * CHI2_2DOF) | (p[..., 2] <= 1e-3))
    kf_obs = jnp.where(bad_obs, -1, m.kf_obs_lm)

    return m._replace(kf_R=kf_R, kf_t=kf_t, kf_obs_lm=kf_obs, lm_pos=lm_pos)


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
) -> MapState:
    """Run local BA over a keyframe window; returns the map with
    refined window poses and landmark positions.

    window_ids: optional (W,) int32 keyframe ids, sorted ascending and
    padded with MK for empty slots (covisibility windows —
    covisibility.covis_window_ids). Default: the most recent
    ``cfg.ba_window`` keyframes (pure recency)."""
    W = cfg.ba_window if window_ids is None else window_ids.shape[0]
    MK = m.max_keyframes
    ML = m.max_landmarks
    N = m.n_keypoints
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    if window_ids is None:
        start = jnp.maximum(m.n_kf - W, 0)
        win_ids = start + jnp.arange(W, dtype=jnp.int32)
    else:
        win_ids = window_ids
    win_ok = win_ids < jnp.minimum(m.n_kf, MK)
    gid = jnp.clip(win_ids, 0, MK - 1)

    kf_R = m.kf_R[gid]          # (W,3,3)
    kf_t = m.kf_t[gid]          # (W,3)
    kf_uv = m.kf_uv[gid]        # (W,N,2)
    kf_oct = m.kf_octave[gid]   # (W,N)
    kf_obs = m.kf_obs_lm[gid]   # (W,N)
    kf_kpv = m.kf_kp_valid[gid]
    kf_ok = m.kf_valid[gid] & win_ok  # (W,)

    lm_idx_g = jnp.clip(kf_obs, 0, ML - 1)        # (W,N) global ids
    obs_valid = (kf_obs >= 0) & kf_kpv & kf_ok[:, None] \
        & m.lm_valid[lm_idx_g]

    # Compact the window's landmark set: the window references at most
    # W*N observation slots but far fewer unique landmarks, and every
    # ML-sized block tensor below shrinks to LC. unique(size=...) keeps
    # the shape static; overflow beyond LC is dropped (logged nowhere —
    # LC is sized to the per-window observation budget).
    LC = min(ML, max(1024, W * N // 2))
    masked_ids = jnp.where(obs_valid, lm_idx_g, ML)
    uids = jnp.unique(masked_ids.reshape(-1), size=LC, fill_value=ML)
    # global -> compact: position of each obs id in the sorted uids.
    lm_idx = jnp.searchsorted(uids, lm_idx_g)      # (W,N) in [0, LC]
    hit = (uids[jnp.clip(lm_idx, 0, LC - 1)] == lm_idx_g) & (lm_idx < LC)
    obs_valid = obs_valid & hit
    lm_idx = jnp.clip(lm_idx, 0, LC - 1)
    uids_safe = jnp.clip(uids, 0, ML - 1)          # (LC,)
    u_valid = uids < ML

    inv_sigma2 = 1.0 / (scale_factor ** (2.0 * kf_oct.astype(jnp.float32)))

    # Landmarks need >= 2 in-window observations to be updated.
    ones = obs_valid.astype(jnp.float32).reshape(-1)
    lm_obs_count = jnp.zeros((LC,), jnp.float32).at[lm_idx.reshape(-1)].add(
        ones, mode="drop")
    lm_free = (lm_obs_count >= 2.0) & u_valid

    # The oldest n_fixed window slots are gauge anchors. Two by
    # default: one keyframe pins the 6-dof frame but NOT the monocular
    # scale — with a single anchor each marching-window BA can rescale
    # freely and the map detaches from its older landmarks. The
    # bootstrap BA passes n_fixed=1 (its scale is set by the median-
    # depth normalization immediately before).
    pose_free = kf_ok & (jnp.arange(W) >= n_fixed)

    lm_pos0 = m.lm_pos[uids_safe]                  # (LC,3) compact

    def ba_iter(carry, _):
        kf_R, kf_t, lm_pos = carry
        X = lm_pos[lm_idx]                                  # (W,N,3)
        p = jnp.einsum('wij,wnj->wni', kf_R, X) + kf_t[:, None, :]
        z = jnp.maximum(p[..., 2], 1e-6)
        inv_z = 1.0 / z
        u = fx * p[..., 0] * inv_z + cx
        v = fy * p[..., 1] * inv_z + cy
        r = jnp.stack([u, v], -1) - kf_uv                   # (W,N,2)

        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        nrm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w_huber = jnp.minimum(1.0, huber_delta / nrm)
        wgt = (obs_valid & (p[..., 2] > 1e-3)).astype(jnp.float32) \
            * w_huber * inv_sigma2                          # (W,N)

        # Jacobians.
        zeros = jnp.zeros_like(z)
        J_proj = jnp.stack([
            jnp.stack([fx * inv_z, zeros, -fx * p[..., 0] * inv_z * inv_z], -1),
            jnp.stack([zeros, fy * inv_z, -fy * p[..., 1] * inv_z * inv_z], -1),
        ], -2)                                              # (W,N,2,3)
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        zero = jnp.zeros_like(px)
        neg_hat = jnp.stack([
            jnp.stack([zero, pz, -py], -1),
            jnp.stack([-pz, zero, px], -1),
            jnp.stack([py, -px, zero], -1),
        ], -2)                                              # (W,N,3,3)
        eye3 = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), neg_hat.shape)
        J_pose = J_proj @ jnp.concatenate([eye3, neg_hat], -1)  # (W,N,2,6)
        J_pt = J_proj @ kf_R[:, None]                        # (W,N,2,3)

        # Blocks.
        H_pp = jnp.einsum('wnia,wn,wnib->wab', J_pose, wgt, J_pose)
        b_p = jnp.einsum('wnia,wn,wni->wa', J_pose, wgt, r)  # (W,6)
        Hpl_obs = jnp.einsum('wnia,wn,wnib->wnab', J_pose, wgt, J_pt)
        Hll_obs = jnp.einsum('wnia,wn,wnib->wnab', J_pt, wgt, J_pt)
        bl_obs = jnp.einsum('wnia,wn,wni->wna', J_pt, wgt, r)

        flat_ids = lm_idx.reshape(-1)
        H_ll = jnp.zeros((LC, 3, 3)).at[flat_ids].add(
            Hll_obs.reshape(-1, 3, 3), mode="drop")
        b_l = jnp.zeros((LC, 3)).at[flat_ids].add(
            bl_obs.reshape(-1, 3), mode="drop")

        # Landmark elimination.
        lam_l = damping * jnp.maximum(
            jnp.trace(H_ll, axis1=1, axis2=2)[:, None, None] / 3.0, 1e-6)
        H_ll_d = H_ll + lam_l * jnp.eye(3)
        H_ll_inv = jnp.where(
            lm_free[:, None, None], jnp.linalg.inv(
                jnp.where(lm_free[:, None, None], H_ll_d, jnp.eye(3))),
            0.0)                                            # (ML,3,3)

        # Scatter the per-observation cross blocks to (W, LC, 6, 3).
        H_pl = jnp.zeros((W, LC, 6, 3)).at[
            jnp.arange(W)[:, None].repeat(N, 1).reshape(-1),
            flat_ids].add(Hpl_obs.reshape(-1, 6, 3), mode="drop")

        T = jnp.einsum('wlab,lbc->wlac', H_pl, H_ll_inv)     # (W,ML,6,3)
        S = jnp.einsum('wlac,vlbc->wvab', T, H_pl)           # (W,W,6,6)
        b_red = b_p - jnp.einsum('wlac,lc->wa', T, b_l)      # (W,6)

        lam_p = damping * jnp.maximum(
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

        # Back-substitution for landmarks.
        Hpl_dp = jnp.einsum("wlab,wa->lb", H_pl, delta_p)    # (LC,3)
        delta_l = -jnp.einsum('lab,lb->la', H_ll_inv, b_l + Hpl_dp)
        delta_l = delta_l * lm_free[:, None]

        dR, dt = jax.vmap(se3_exp)(delta_p)
        kf_R_new, kf_t_new = jax.vmap(se3_compose)(dR, dt, kf_R, kf_t)
        lm_pos_new = lm_pos + delta_l
        return (kf_R_new, kf_t_new, lm_pos_new), None

    (kf_R, kf_t, lm_pos_c), _ = jax.lax.scan(
        ba_iter, (kf_R, kf_t, lm_pos0), None, length=iters)

    # Scatter the refined compact landmark block back into the table.
    lm_pos = m.lm_pos.at[jnp.where(u_valid, uids_safe, ML)].set(
        lm_pos_c, mode="drop")

    # Observation pruning (the post-BA outlier erase of ORB-SLAM's
    # LocalBundleAdjustment): drop in-window observations whose final
    # chi2 exceeds the threshold.
    X = lm_pos_c[lm_idx]
    p = jnp.einsum('wij,wnj->wni', kf_R, X) + kf_t[:, None, :]
    z = jnp.maximum(p[..., 2], 1e-6)
    u = fx * p[..., 0] / z + cx
    v = fy * p[..., 1] / z + cy
    r = jnp.stack([u, v], -1) - kf_uv
    chi2 = jnp.sum(r * r, -1) * inv_sigma2
    bad_obs = obs_valid & ((chi2 > 4.0 * CHI2_2DOF) | (p[..., 2] <= 1e-3))
    kf_obs_pruned = jnp.where(bad_obs, -1, kf_obs)

    # Write the window back (scatter by window id; padded slots drop).
    sid = jnp.where(kf_ok, gid, MK)

    def upd(arr, new):
        return arr.at[sid].set(new, mode="drop")

    return m._replace(kf_R=upd(m.kf_R, kf_R), kf_t=upd(m.kf_t, kf_t),
                      kf_obs_lm=upd(m.kf_obs_lm, kf_obs_pruned),
                      lm_pos=lm_pos)
