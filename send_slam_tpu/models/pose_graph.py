"""Sim(3) pose-graph optimization for loop correction.

TPU-native replacement for ORB-SLAM3's
Optimizer::OptimizeEssentialGraph on g2o (CMakeLists.txt:61,107): the
essential graph becomes dense edge tensors (i, j, relative Sim3
measurement, validity mask) and the solve is a damped Gauss-Newton
over per-keyframe sim3 log-corrections.

The Jacobian is assembled block-sparse the way g2o does, but in one
batched pass: each edge touches only its two nodes, so a vmapped
jacfwd over the edge's 14 parameters produces (E,7,7) blocks that are
scatter-added into the (MK,MK,7,7) Hessian — O(E) work instead of the
dense (7E x 7MK) full-graph jacfwd, which is what makes covisibility
edges (E ~ MK * top_k) affordable. The reduced system is one dense
(7MK)^2 Cholesky-sized solve: at MK=256 that is a 1792^2 matrix —
megabytes, a single MXU-friendly solve at loop-closure rate.

Convention: node i carries S_iw (world-to-keyframe-i similarity);
edge (i, j) measures S_ji = S_jw ∘ S_iw^-1 at graph-build time plus the
externally measured loop edges. Residual: log(S_ji_meas^-1 ∘ S_jw ∘
S_iw^-1) in R^7.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from send_slam_tpu.geometry.sim3 import (
    sim3_compose, sim3_exp, sim3_inverse, sim3_log,
)


class PoseGraphEdges(NamedTuple):
    i: jnp.ndarray        # (E,) int32 source node
    j: jnp.ndarray        # (E,) int32 target node
    s: jnp.ndarray        # (E,) measured scale of S_ji
    R: jnp.ndarray        # (E,3,3)
    t: jnp.ndarray        # (E,3)
    valid: jnp.ndarray    # (E,) bool
    weight: jnp.ndarray   # (E,) — loop edges can be up-weighted


def build_sequential_edges(kf_R, kf_t, kf_valid, n_kf) -> PoseGraphEdges:
    """Chain edges i -> i+1 from the current keyframe estimates (the
    spanning-tree part of the essential graph), with unit scale."""
    MK = kf_R.shape[0]
    i = jnp.arange(MK - 1, dtype=jnp.int32)
    j = i + 1
    valid = (j < n_kf) & kf_valid[i] & kf_valid[j]
    # S_ji = T_j ∘ T_i^-1 (scale 1).
    Ri, ti = kf_R[i], kf_t[i]
    Rj, tj = kf_R[j], kf_t[j]
    Rii = jnp.swapaxes(Ri, -1, -2)
    tii = -(Rii @ ti[..., None])[..., 0]
    R_ji = Rj @ Rii
    t_ji = (Rj @ tii[..., None])[..., 0] + tj
    return PoseGraphEdges(
        i=i, j=j, s=jnp.ones(MK - 1), R=R_ji, t=t_ji, valid=valid,
        weight=jnp.ones(MK - 1))


def relative_edges(kf_R, kf_t, i, j, valid, weight) -> PoseGraphEdges:
    """Edges (i, j) measuring S_ji = T_j ∘ T_i^-1 from the CURRENT pose
    estimates, unit scale — how ORB-SLAM constructs covisibility /
    spanning-tree essential-graph edges before a correction."""
    Ri, ti = kf_R[i], kf_t[i]
    Rj, tj = kf_R[j], kf_t[j]
    Rii = jnp.swapaxes(Ri, -1, -2)
    tii = -(Rii @ ti[..., None])[..., 0]
    R_ji = Rj @ Rii
    t_ji = (Rj @ tii[..., None])[..., 0] + tj
    return PoseGraphEdges(
        i=i.astype(jnp.int32), j=j.astype(jnp.int32),
        s=jnp.ones(i.shape[0]), R=R_ji, t=t_ji, valid=valid,
        weight=weight)


def concat_edges(a: PoseGraphEdges, b: PoseGraphEdges) -> PoseGraphEdges:
    return PoseGraphEdges(*[jnp.concatenate([x, y]) for x, y in zip(a, b)])


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    kf_R: jnp.ndarray,       # (MK,3,3) current T_iw rotations
    kf_t: jnp.ndarray,       # (MK,3)
    kf_valid: jnp.ndarray,   # (MK,) bool
    edges: PoseGraphEdges,
    iters: int = 20,
    damping: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns corrected (s_iw (MK,), R_iw, t_iw). Node 0 is fixed."""
    MK = kf_R.shape[0]
    ii = jnp.clip(edges.i, 0, MK - 1)
    jj = jnp.clip(edges.j, 0, MK - 1)

    # Measurement inverses are iteration-constant.
    smi, Rmi, tmi = sim3_inverse(edges.s, edges.R, edges.t)

    def edge_residual(xi2, Ri, ti, Rj, tj, sm, Rm, tm):
        """xi2: (2,7) correction logs of (node i, node j)."""
        dsi, dRi, dti = sim3_exp(xi2[0])
        si_, Ri_, ti_ = sim3_compose(dsi, dRi, dti, jnp.ones(()), Ri, ti)
        dsj, dRj, dtj = sim3_exp(xi2[1])
        sj_, Rj_, tj_ = sim3_compose(dsj, dRj, dtj, jnp.ones(()), Rj, tj)
        sii, Rii, tii = sim3_inverse(si_, Ri_, ti_)
        s_ji, R_ji, t_ji = sim3_compose(sj_, Rj_, tj_, sii, Rii, tii)
        se, Re, te = sim3_compose(sm, Rm, tm, s_ji, R_ji, t_ji)
        return sim3_log(se, Re, te)                    # (7,)

    free = kf_valid & (jnp.arange(MK) != 0)
    w_e = edges.valid.astype(kf_R.dtype) * edges.weight  # (E,)

    def gn_step(xis, _):
        def per_edge(i, j, sm, Rm, tm):
            xi2 = jnp.stack([xis[i], xis[j]])          # (2,7)
            f = lambda x: edge_residual(
                x, kf_R[i], kf_t[i], kf_R[j], kf_t[j], sm, Rm, tm)
            r = f(xi2)                                  # (7,)
            J = jax.jacfwd(f)(xi2)                      # (7,2,7)
            return r, J[:, 0, :], J[:, 1, :]
        r_e, Ji, Jj = jax.vmap(per_edge)(ii, jj, smi, Rmi, tmi)

        # Block Hessian scatter-assembly: H[a,b] += Ja^T w Jb.
        Hii = jnp.einsum('era,e,erb->eab', Ji, w_e, Ji)
        Hjj = jnp.einsum('era,e,erb->eab', Jj, w_e, Jj)
        Hij = jnp.einsum('era,e,erb->eab', Ji, w_e, Jj)
        bi = jnp.einsum('era,e,er->ea', Ji, w_e, r_e)
        bj = jnp.einsum('era,e,er->ea', Jj, w_e, r_e)

        H = jnp.zeros((MK, MK, 7, 7), kf_R.dtype)
        H = H.at[ii, ii].add(Hii)
        H = H.at[jj, jj].add(Hjj)
        H = H.at[ii, jj].add(Hij)
        H = H.at[jj, ii].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((MK, 7), kf_R.dtype)
        b = b.at[ii].add(bi)
        b = b.at[jj].add(bj)

        mask = jnp.repeat(free.astype(kf_R.dtype), 7)   # (7MK,)
        A = H.transpose(0, 2, 1, 3).reshape(MK * 7, MK * 7)
        A = A * (mask[:, None] * mask[None, :])
        A = A + damping * jnp.eye(MK * 7) + jnp.diag(1.0 - mask)
        rhs = b.reshape(-1) * mask
        delta = -jnp.linalg.solve(A, rhs[:, None])[:, 0]
        return xis + delta.reshape(MK, 7) * free[:, None], None

    xis0 = jnp.zeros((MK, 7))
    xis, _ = jax.lax.scan(gn_step, xis0, None, length=iters)

    dS = jax.vmap(sim3_exp)(xis)
    s_new, R_new, t_new = jax.vmap(
        lambda d, R, t: sim3_compose(d[0], d[1], d[2], jnp.ones(()), R, t)
    )(dS, kf_R, kf_t)
    return s_new, R_new, t_new
