"""Sim(3) — similarity transforms (s, R, t) for loop closure.

Replaces ORB-SLAM3's Sim3Solver / g2o sim3 types
(slam_backends/orb_slam_3/CMakeLists.txt:64,67) in the Sim(3)
pose-graph optimization. Represented as a triple ``(s, R, t)`` acting
as ``x -> s * R @ x + t``.
"""

from __future__ import annotations

import jax.numpy as jnp

from send_slam_tpu.geometry.se3 import hat, so3_exp, so3_log

_EPS = 1e-8


def sim3_apply(s, R, t, x):
    return s[..., None] * (R @ x[..., None])[..., 0] + t


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / jnp.maximum(s, _EPS)
    return s_inv, Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0]


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) ∘ (sb,Rb,tb): x -> sa Ra (sb Rb x + tb) + ta."""
    return sa * sb, Ra @ Rb, sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta


def _sim3_W(phi, sigma):
    """The W matrix of the Sim(3) exponential: t = W @ rho.

    W = A*I + B*K + C*K^2 with coefficients depending on (theta, sigma)
    (Strasdat's thesis, eq. for sim3 exp)."""
    theta = jnp.sqrt(jnp.sum(phi * phi, -1) + 1e-24)
    K = hat(phi)
    K2 = K @ K
    s = jnp.exp(sigma)

    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5
    sig_safe = jnp.where(small_sig, 1.0, sigma)
    th_safe = jnp.where(small_th, 1.0, theta)
    th2 = th_safe * th_safe
    sig2 = sig_safe * sig_safe

    # A
    A_gen_gen = (s * jnp.sin(th_safe) * sig_safe + (1 - s * jnp.cos(th_safe)) * th_safe) / (th_safe * (sig2 + th2))
    A_gen_smth = jnp.zeros_like(theta)  # theta→0 limit of sin-term: handled below
    # theta -> 0, sigma generic: A -> ? W -> ((s-1)/sigma) I  => A = (s-1)/sigma, B=C series; use that.
    A_smallth = jnp.zeros_like(theta)
    # sigma -> 0, theta generic: A -> (1 - cos th)/th^2
    A_smallsig = (1 - jnp.cos(th_safe)) / th2
    A = jnp.where(small_sig, A_smallsig, jnp.where(small_th, A_smallth, A_gen_gen))
    del A_gen_smth, A_smallth

    # C (coefficient of I)
    C_gen = (s - 1) / sig_safe
    C_small = jnp.ones_like(sigma) * (1.0 + sigma / 2.0)
    C = jnp.where(small_sig, C_small, C_gen)

    # B (coefficient of K^2): ( C - ((s*cos th - 1)*sigma + s*sin th * th) / (sig2+th2) ) / th2
    B_gen = (C - ((s * jnp.cos(th_safe) - 1) * sig_safe + s * jnp.sin(th_safe) * th_safe) / (sig2 + th2)) / th2
    B_smallsig = (th_safe - jnp.sin(th_safe)) / (th2 * th_safe)
    B = jnp.where(small_sig, B_smallsig, jnp.where(small_th, jnp.zeros_like(theta), B_gen))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    W = C[..., None, None] * eye + A[..., None, None] * K + B[..., None, None] * K2
    return W


def sim3_exp(xi):
    """(…,7) = (rho, phi, sigma) -> (s, R, t)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(phi, sigma)
    t = (W @ rho[..., None])[..., 0]
    return s, R, t


def sim3_log(s, R, t):
    """(s,R,t) -> (…,7) twist (rho, phi, sigma)."""
    phi = so3_log(R)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], -1)
