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
    """Post-loop-closure refinement (the role of ORB-SLAM's
    RunGlobalBundleAdjustment): the Sim(3) pose graph has already fixed
    the global topology, so a wide-window BA (up to ``max_window``
    recent keyframes) re-polishes metric structure. A truly global
    dense-blocked BA at max_keyframes=256 would need a ~1 GB H_pl
    tensor; the compacted-landmark variant is round-2 work."""
    import dataclasses
    wide = dataclasses.replace(
        cfg, ba_window=min(cfg.max_keyframes, max_window))
    return local_bundle_adjustment(m, K, wide, iters=iters)


def _window_slice(arr, start, W):
    """dynamic_slice along axis 0: arr[start:start+W]."""
    sizes = (W,) + arr.shape[1:]
    starts = (start,) + (0,) * (arr.ndim - 1)
    return jax.lax.dynamic_slice(arr, starts, sizes)


def local_bundle_adjustment(
    m: MapState,
    K: jnp.ndarray,
    cfg: MapConfig,
    iters: int = 5,
    huber_delta: float = 2.447,
    damping: float = 1e-3,
    scale_factor: float = 1.2,
    n_fixed: int = 2,
) -> MapState:
    """Run local BA over the most recent keyframes; returns the map with
    refined window poses and landmark positions."""
    W = cfg.ba_window
    ML = m.max_landmarks
    N = m.n_keypoints
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    start = jnp.maximum(m.n_kf - W, 0)

    kf_R = _window_slice(m.kf_R, start, W)        # (W,3,3)
    kf_t = _window_slice(m.kf_t, start, W)        # (W,3)
    kf_uv = _window_slice(m.kf_uv, start, W)      # (W,N,2)
    kf_oct = _window_slice(m.kf_octave, start, W)  # (W,N)
    kf_obs = _window_slice(m.kf_obs_lm, start, W)  # (W,N)
    kf_kpv = _window_slice(m.kf_kp_valid, start, W)
    kf_ok = _window_slice(m.kf_valid, start, W)   # (W,)

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

    # Write the window back.
    def upd(arr, new):
        return jax.lax.dynamic_update_slice(
            arr, new, (start,) + (0,) * (arr.ndim - 1))

    return m._replace(kf_R=upd(m.kf_R, kf_R), kf_t=upd(m.kf_t, kf_t),
                      kf_obs_lm=upd(m.kf_obs_lm, kf_obs_pruned),
                      lm_pos=lm_pos)
