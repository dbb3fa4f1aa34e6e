"""Two-view triangulation (DLT), batched and jit-friendly.

Replaces ORB-SLAM3 GeometricTools::Triangulate
(slam_backends/orb_slam_3/CMakeLists.txt:72) — the SVD-on-4x4 DLT — with
a closed-form 3x3 normal-equation solve that vmaps cleanly on TPU
(batched small solves beat per-point SVDs on the MXU/VPU).
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(P1, P2, x1, x2):
    """Triangulate one point from two projections.

    P1, P2: (3,4) projection matrices (K [R|t]).
    x1, x2: (2,) pixel observations.
    Returns (3,) world point (homogeneous solution normalized).

    DLT rows: x * P[2] - P[0], y * P[2] - P[1] for each view.
    Solved via normal equations on the 4x4 system with the homogeneous
    scale fixed by taking the null-space direction from A^T A's smallest
    eigenvector — but for speed we solve the inhomogeneous 3x3 system
    (fixing w=1), which is numerically fine for points not at infinity.
    """
    A = jnp.stack([
        x1[0] * P1[2] - P1[0],
        x1[1] * P1[2] - P1[1],
        x2[0] * P2[2] - P2[0],
        x2[1] * P2[2] - P2[1],
    ])                                   # (4,4)
    # Inhomogeneous: A[:, :3] X = -A[:, 3]
    M = A[:, :3]
    b = -A[:, 3]
    MtM = M.T @ M + 1e-9 * jnp.eye(3, dtype=A.dtype)
    Mtb = M.T @ b
    return jnp.linalg.solve(MtM, Mtb)


def solve3x3_batch(M, b):
    """Batched 3x3 linear solve by the closed-form adjugate,
    elementwise over the batch — batched jnp.linalg.solve/inv on tiny
    matrices lowers ~4x slower on TPU (see local_ba's landmark
    elimination). M: (N,3,3) symmetric-or-not, b: (N,3)."""
    a_, b_, c_ = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
    d_, e_, f_ = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
    g_, h_, i_ = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
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
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    x0 = (A_ * b[:, 0] + B_ * b[:, 1] + C_ * b[:, 2]) * inv_det
    x1_ = (D_ * b[:, 0] + E_ * b[:, 1] + F_ * b[:, 2]) * inv_det
    x2_ = (G_ * b[:, 0] + H_ * b[:, 1] + I_ * b[:, 2]) * inv_det
    return jnp.stack([x0, x1_, x2_], -1)


def triangulate_batch(P1, P2, x1, x2):
    """Batched DLT: x1, x2 (N,2) -> (N,3), fully vectorized (no vmap of
    per-point solves; one batched closed-form 3x3 solve)."""
    rows = []
    for P, x in ((P1, x1), (P2, x2)):
        rows.append(x[..., 0:1] * P[2][None] - P[0][None])  # (N,4)
        rows.append(x[..., 1:2] * P[2][None] - P[1][None])
    A = jnp.stack(rows, -2)              # (N,4,4)
    M = A[..., :3]
    b = -A[..., 3]
    MtM = jnp.einsum('nij,nik->njk', M, M) + 1e-9 * jnp.eye(3, dtype=A.dtype)
    Mtb = jnp.einsum('nij,ni->nj', M, b)
    return solve3x3_batch(MtM, Mtb)
