"""SO(3)/SE(3) Lie group ops, pure JAX, vmap-friendly.

Conventions:
- Rotations ``R``: (3,3) matrices; quaternions ``q = (x, y, z, w)``
  (matches the reference pose packet field order,
  orbslam3_mono_networked.cc:252-264).
- SE(3) represented as a pair ``(R, t)`` with world-from-camera or
  camera-from-world decided by the caller; helpers are convention-free.
- ``se3_exp`` takes twists ``xi = (rho, phi)`` (translation first,
  rotation last), returning (R, t) — the standard V(phi) @ rho form.

All functions are differentiable and safe at the identity (Taylor
branches via jnp.where with cutoff eps).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v):
    """(…,3) -> (…,3,3) skew-symmetric matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def vee(m):
    """(…,3,3) skew -> (…,3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], -1)


def _sinc(x):
    """sin(x)/x, stable at 0."""
    return jnp.where(jnp.abs(x) < _EPS, 1.0 - x * x / 6.0, jnp.sin(x) / jnp.where(jnp.abs(x) < _EPS, 1.0, x))


def so3_exp(phi):
    """(…,3) axis-angle -> (…,3,3) rotation (Rodrigues)."""
    # sqrt(sum+tiny): norm() has a NaN forward-mode tangent at 0.
    theta = jnp.sqrt(jnp.sum(phi * phi, -1, keepdims=True) + 1e-24)
    theta = theta[..., None]                      # (…,1,1)
    K = hat(phi)
    K2 = K @ K
    t2 = theta * theta
    a = jnp.where(t2 < _EPS, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.where(t2 < _EPS, 1.0, theta))
    b = jnp.where(t2 < _EPS, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(t2 < _EPS, 1.0, t2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R):
    """(…,3,3) rotation -> (…,3) axis-angle. Stable near 0 and pi.

    Jacobian-safe: arccos input is clipped strictly inside (-1, 1) so
    autodiff (jacfwd in the pose-graph optimizer) never sees the
    infinite arccos derivative at the identity; the value error this
    introduces (theta floor ~5e-4) vanishes through the sinc division.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)                     # (…,)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5    # sin(theta) * axis
    # Near 0: log ≈ w.  Generic: theta / sin(theta) * w.
    s = _sinc(theta)[..., None]
    generic = w / jnp.maximum(s, _EPS)
    # Near pi: axis from diagonal of (R + I)/2 = aa^T style.
    near_pi = theta[..., None] > (jnp.pi - 1e-3)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis_sq = jnp.maximum((diag + 1.0) * 0.5, 1e-12)  # floor: sqrt'(0)=inf
    axis = jnp.sqrt(axis_sq)
    # Fix axis signs from off-diagonals (largest component positive).
    sign_ref = jnp.argmax(axis_sq, axis=-1)
    off = jnp.stack([
        R[..., 0, 1] + R[..., 1, 0],
        R[..., 0, 2] + R[..., 2, 0],
        R[..., 1, 2] + R[..., 2, 1],
    ], -1)  # 2*ax*ay, 2*ax*az, 2*ay*az

    def _signs_for(k):
        # component k assumed positive; derive others from products
        if k == 0:
            sy = jnp.sign(off[..., 0]); sz = jnp.sign(off[..., 1])
            return jnp.stack([jnp.ones_like(sy), sy, sz], -1)
        if k == 1:
            sx = jnp.sign(off[..., 0]); sz = jnp.sign(off[..., 2])
            return jnp.stack([sx, jnp.ones_like(sx), sz], -1)
        sx = jnp.sign(off[..., 1]); sy = jnp.sign(off[..., 2])
        return jnp.stack([sx, sy, jnp.ones_like(sx)], -1)

    signs = jnp.where(
        (sign_ref == 0)[..., None], _signs_for(0),
        jnp.where((sign_ref == 1)[..., None], _signs_for(1), _signs_for(2)))
    signs = jnp.where(signs == 0, 1.0, signs)
    pi_branch = axis * signs * theta[..., None]
    return jnp.where(near_pi, pi_branch, generic)


def _left_jacobian(phi):
    """SO(3) left Jacobian V(phi) used in se3_exp: t = V @ rho."""
    theta = jnp.sqrt(jnp.sum(phi * phi, -1) + 1e-24)[..., None, None]
    K = hat(phi)
    K2 = K @ K
    t2 = theta * theta
    b = jnp.where(t2 < _EPS, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(t2 < _EPS, 1.0, t2))
    c = jnp.where(t2 < _EPS, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(t2 < _EPS, 1.0, t2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * K2


def _left_jacobian_inv(phi):
    theta = jnp.sqrt(jnp.sum(phi * phi, -1) + 1e-24)[..., None, None]
    K = hat(phi)
    K2 = K @ K
    t2 = theta * theta
    half = 0.5 * theta
    cot = jnp.where(
        t2 < _EPS, 1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.where(t2 < _EPS, 1.0, t2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot * K2


def se3_exp(xi):
    """(…,6) twist (rho, phi) -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _left_jacobian(phi)
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """(R, t) -> (…,6) twist (rho, phi)."""
    phi = so3_log(R)
    Vinv = _left_jacobian_inv(phi)
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def se3_identity(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): x -> Ra (Rb x + tb) + ta."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_apply(R, t, x):
    """Apply to points x (…,3)."""
    return (R @ x[..., None])[..., 0] + t


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_from_rotmat(R):
    """(…,3,3) -> unit quaternion (x, y, z, w), w >= 0.

    Shepperd's branchless-by-where method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(w, x, y, z):
        return jnp.stack([x, y, z, w], -1)

    q0 = mk(1 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = mk(m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = mk(m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21)
    q3 = mk(m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22)

    # Pick the numerically largest pivot.
    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cs = jnp.stack([c0, c1, c2, c3], -1)
    idx = jnp.argmax(cs, -1)
    q = jnp.where((idx == 0)[..., None], q0,
        jnp.where((idx == 1)[..., None], q1,
        jnp.where((idx == 2)[..., None], q2, q3)))
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def rotmat_from_quat(q):
    """(x,y,z,w) -> (…,3,3)."""
    q = quat_normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
    ], -2)
