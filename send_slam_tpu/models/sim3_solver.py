"""Sim(3) estimation between matched 3-D point sets.

TPU-native replacement for ORB-SLAM3's Sim3Solver (CMakeLists.txt:64):
the C++ sequential Horn RANSAC becomes a vmap over minimal 3-point
Umeyama hypotheses with a closed-form absolute-orientation solve per
lane, followed by a weighted refit on the consensus set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Sim3Result(NamedTuple):
    ok: jnp.ndarray       # () bool
    s: jnp.ndarray        # () scale
    R: jnp.ndarray        # (3,3)
    t: jnp.ndarray        # (3,)
    inlier: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray


def umeyama_sim3(src, dst, w=None):
    """Weighted closed-form similarity: dst ~ s R src + t.

    src, dst: (N,3); w: (N,) weights (0 masks a row)."""
    if w is None:
        w = jnp.ones(src.shape[0], src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], 0) / wsum
    mu_d = jnp.sum(dst * w[:, None], 0) / wsum
    xs = src - mu_s
    xd = dst - mu_d
    cov = (xd * w[:, None]).T @ xs / wsum
    U, D, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U @ Vt))
    S = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], src.dtype)).at[2, 2].set(sgn)
    R = U @ S @ Vt
    var_s = jnp.sum(w[:, None] * xs * xs) / wsum
    s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-12)
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def sim3_ransac(
    src: jnp.ndarray, dst: jnp.ndarray, valid: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 128,
    inlier_th: float = 0.05,
    min_inliers: int = 8,
) -> Sim3Result:
    """RANSAC Sim(3): src/dst (N,3) matched points, valid mask.

    inlier_th is a *relative* threshold: a pair is an inlier when its
    aligned residual is below inlier_th x (robust scene scale), making
    the gate invariant to the monocular gauge."""
    N = src.shape[0]
    scene = jnp.sqrt(jnp.sum(
        jnp.where(valid[:, None], (dst - jnp.mean(
            jnp.where(valid[:, None], dst, 0.0), 0,
            keepdims=True)) ** 2, 0.0)) / jnp.maximum(jnp.sum(valid), 1))
    th = inlier_th * jnp.maximum(scene, 1e-6)

    g = jax.random.gumbel(key, (n_hyp, N))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 3)

    def hyp(i):
        s, R, t = umeyama_sim3(src[i], dst[i])
        return s, R, t

    ss, Rs, ts = jax.vmap(hyp)(idx)

    def count(s, R, t):
        pred = s * (src @ R.T) + t
        err = jnp.linalg.norm(pred - dst, axis=-1)
        return jnp.sum((err < th) & valid), (err < th) & valid

    counts, inls = jax.vmap(count)(ss, Rs, ts)
    best = jnp.argmax(counts)

    # Weighted refit on the consensus set, twice.
    w = inls[best].astype(src.dtype)
    s, R, t = umeyama_sim3(src, dst, w)
    pred = s * (src @ R.T) + t
    inl = (jnp.linalg.norm(pred - dst, axis=-1) < th) & valid
    s, R, t = umeyama_sim3(src, dst, inl.astype(src.dtype))
    pred = s * (src @ R.T) + t
    inl = (jnp.linalg.norm(pred - dst, axis=-1) < th) & valid

    n = jnp.sum(inl)
    return Sim3Result(ok=n >= min_inliers, s=s, R=R, t=t,
                      inlier=inl, n_inliers=n)
