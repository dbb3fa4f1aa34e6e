"""Homography decomposition (Faugeras 1988) for planar initialization.

The H-path of ORB-SLAM3's TwoViewReconstruction::ReconstructH
(CMakeLists.txt:73): a calibrated homography A = K^-1 H K decomposes
into 8 motion hypotheses {R, t, n}; cheirality selection picks the
physical one. All branches are computed unconditionally and stacked —
batched hypothesis scoring replaces C++ control flow.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def decompose_homography(H: jnp.ndarray, K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """H (3,3) pixel-space homography -> (8,3,3) R and (8,3) unit t
    candidates (camera2-from-camera1)."""
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    U, D, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = D[0], D[1], D[2]

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))

    d2s = jnp.maximum(d2, 1e-12)

    Rs, ts = [], []

    # Case d' = +d2.
    sin_t = (d1 - d3) * x1 * x3 / d2s
    cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2s
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * sin_t
            Rp = jnp.asarray([
                [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
            ])
            Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-st)
            Rp = Rp.at[2, 0].set(st).at[2, 2].set(cos_t)
            tp = jnp.asarray([e1 * x1, 0.0, -e3 * x3]) * (d1 - d3)
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)

    # Case d' = -d2.
    sin_p = (d1 + d3) * x1 * x3 / d2s
    cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / d2s
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            sp = e1 * e3 * sin_p
            Rp = jnp.asarray([
                [1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0],
            ])
            Rp = Rp.at[0, 0].set(cos_p).at[0, 2].set(sp)
            Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cos_p)
            tp = jnp.asarray([e1 * x1, 0.0, e3 * x3]) * (d1 + d3)
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)

    R8 = jnp.stack(Rs)
    t8 = jnp.stack(ts)
    t8 = t8 / jnp.maximum(jnp.linalg.norm(t8, axis=-1, keepdims=True), 1e-12)
    return R8, t8
