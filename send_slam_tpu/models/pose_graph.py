"""Sim(3) pose-graph optimization for loop correction.

TPU-native replacement for ORB-SLAM3's
Optimizer::OptimizeEssentialGraph on g2o (CMakeLists.txt:61,107): the
essential graph becomes dense edge tensors (i, j, relative Sim3
measurement, validity mask), and the solve is a damped Gauss-Newton
over per-keyframe sim3 log-parameters with an autodiff (jacfwd)
Jacobian — one dense (7E x 7V) system at keyframe-graph scale, a
trivial matmul/solve for the MXU at loop-closure rate.

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

    # Parameters: per-node sim3 log of the *correction* C_i applied as
    # S_iw <- exp(xi_i) ∘ S_iw0. xi = 0 start keeps the initial guess.
    def edge_residuals(xis):
        def node(idx):
            s0 = jnp.ones(())
            dS = sim3_exp(xis[idx])
            return sim3_compose(dS[0], dS[1], dS[2],
                                s0, kf_R[idx], kf_t[idx])

        si, Ri, ti = node(edges.i)
        sj, Rj, tj = node(edges.j)
        # S_jw ∘ S_iw^-1
        sii, Rii, tii = sim3_inverse(si, Ri, ti)
        s_ji, R_ji, t_ji = sim3_compose(sj, Rj, tj, sii, Rii, tii)
        # meas^-1 ∘ (S_jw ∘ S_iw^-1)
        smi, Rmi, tmi = sim3_inverse(edges.s, edges.R, edges.t)
        se, Re, te = sim3_compose(smi, Rmi, tmi, s_ji, R_ji, t_ji)
        r = sim3_log(se, Re, te)                       # (E,7)
        w = (edges.valid.astype(r.dtype) * edges.weight)[:, None]
        return (r * w).reshape(-1)

    free = kf_valid & (jnp.arange(MK) != 0)

    def gn_step(xis, _):
        r = edge_residuals(xis)
        J = jax.jacfwd(lambda x: edge_residuals(x.reshape(MK, 7)))(
            xis.reshape(-1))                            # (7E, 7MK)
        mask = jnp.repeat(free, 7).astype(r.dtype)
        J = J * mask[None, :]
        JtJ = J.T @ J
        Jtr = J.T @ r
        A = JtJ + damping * jnp.eye(7 * MK) \
            + jnp.diag(1.0 - mask)                      # pin fixed params
        delta = -jnp.linalg.solve(A, Jtr[:, None])[:, 0]
        return xis + delta.reshape(MK, 7) * free[:, None], None

    xis0 = jnp.zeros((MK, 7))
    xis, _ = jax.lax.scan(gn_step, xis0, None, length=iters)

    dS = jax.vmap(sim3_exp)(xis)
    s_new, R_new, t_new = jax.vmap(
        lambda d, R, t: sim3_compose(d[0], d[1], d[2], jnp.ones(()), R, t)
    )(dS, kf_R, kf_t)
    return s_new, R_new, t_new
