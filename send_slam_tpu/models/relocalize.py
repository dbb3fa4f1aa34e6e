"""Relocalization: global descriptor matching + batched PnP RANSAC.

TPU-native replacement for ORB-SLAM3's MLPnPsolver + relocalization
flow (slam_backends/orb_slam_3/CMakeLists.txt:71; Tracking::Relocalization):
when tracking is lost, match the frame's descriptors against the
landmark table without a pose prior, then recover the camera pose with
RANSAC over a linear 6-point DLT PnP (each hypothesis one vmap lane),
refined by the robust pose GN from models/tracking.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from send_slam_tpu.config import TrackingConfig
from send_slam_tpu.models.tracking import pose_only_gn
from send_slam_tpu.ops.hamming import match_descriptors

CHI2_2DOF = 5.991


class RelocResult(NamedTuple):
    ok: jnp.ndarray          # () bool
    R: jnp.ndarray           # (3,3) camera-from-world
    t: jnp.ndarray           # (3,)
    n_inliers: jnp.ndarray   # () int32


def _pnp_dlt(X, xn):
    """Linear PnP from >= 6 points: X (K,3) world, xn (K,2) normalized
    image coords. Returns (R, t) with orthonormalized rotation."""
    K = X.shape[0]
    zeros = jnp.zeros((K, 4), X.dtype)
    Xh = jnp.concatenate([X, jnp.ones((K, 1), X.dtype)], 1)   # (K,4)
    r1 = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], 1)     # (K,12)
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], 1)
    A = jnp.concatenate([r1, r2], 0)                           # (2K,12)
    # Inverse-iteration-polished smallest singular vector: TPU f32 eigh
    # noise on A^T A was a round-2 parity finding (geometry/epipolar).
    from send_slam_tpu.geometry.epipolar import _smallest_singular_vector
    p = _smallest_singular_vector(A).reshape(3, 4)
    Rraw = p[:, :3]
    # Scale: rotation rows must be unit norm; sign: points in front.
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(Rraw)))
    scale = jnp.where(scale < 1e-12, 1.0, scale)
    p = p / scale
    Rraw = p[:, :3]
    sign = jnp.sign(jnp.sum((X @ Rraw.T + p[:, 3])[:, 2]))
    p = p * jnp.where(sign == 0, 1.0, sign)
    U, _, Vt = jnp.linalg.svd(p[:, :3])
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    return R, p[:, 3]


def relocalize(
    lm_pos: jnp.ndarray, lm_desc: jnp.ndarray, lm_valid: jnp.ndarray,
    kp_uv: jnp.ndarray, kp_desc: jnp.ndarray, kp_valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    cfg: TrackingConfig,
    n_hyp: int = 256,
    min_inliers: int = 15,
) -> RelocResult:
    """Pose recovery without a prior. All shapes static; jittable."""
    m = match_descriptors(lm_desc, kp_desc, lm_valid, kp_valid,
                          max_dist=float(cfg.hamming_th_low),
                          ratio=0.9, mutual=True)
    N = lm_pos.shape[0]
    uv = kp_uv[jnp.clip(m.idx, 0, kp_uv.shape[0] - 1)]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)

    # RANSAC: Gumbel-top-k distinct 6-point samples.
    g = jax.random.gumbel(key, (n_hyp, N))
    g = jnp.where(m.valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 6)                       # (n_hyp, 6)

    Rs, ts = jax.vmap(lambda i: _pnp_dlt(lm_pos[i], xn[i]))(idx)

    def count_inliers(R, t):
        p = lm_pos @ R.T + t
        z = jnp.maximum(p[:, 2], 1e-6)
        u = fx * p[:, 0] / z + cx
        v = fy * p[:, 1] / z + cy
        err = jnp.sum((jnp.stack([u, v], -1) - uv) ** 2, -1)
        return jnp.sum((err < CHI2_2DOF) & m.valid & (p[:, 2] > 0))

    scores = jax.vmap(count_inliers)(Rs, ts)
    best = jnp.argmax(scores)

    # Robust GN refinement from the best hypothesis.
    opt = pose_only_gn(Rs[best], ts[best], lm_pos, uv, m.valid,
                       fx, fy, cx, cy, huber_delta=cfg.huber_delta)
    ok = opt.n_inliers >= min_inliers
    return RelocResult(ok=ok, R=opt.R, t=opt.t, n_inliers=opt.n_inliers)
