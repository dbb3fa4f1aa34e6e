"""SO3/SE3/Sim3 numerics vs scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from send_slam_tpu.geometry import (
    se3_apply, se3_compose, se3_exp, se3_identity, se3_inverse, se3_log,
    sim3_apply, sim3_compose, sim3_exp, sim3_inverse, sim3_log,
    so3_exp, so3_log, quat_from_rotmat, rotmat_from_quat,
)

RNG = np.random.default_rng(0)


def random_rotvecs(n, scale=np.pi * 0.9):
    v = RNG.normal(size=(n, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    return v * RNG.uniform(0.01, scale, size=(n, 1))


class TestSO3:
    def test_exp_matches_scipy(self):
        phi = random_rotvecs(64)
        R = np.asarray(so3_exp(jnp.asarray(phi, jnp.float32)))
        R_ref = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_at_zero(self):
        R = np.asarray(so3_exp(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)

    def test_log_roundtrip(self):
        phi = random_rotvecs(64)
        R = so3_exp(jnp.asarray(phi, jnp.float32))
        phi2 = np.asarray(so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=1e-4)

    def test_log_near_pi(self):
        phi = random_rotvecs(32, scale=np.pi - 1e-4)
        phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True) * (np.pi - 5e-4)
        R = Rotation.from_rotvec(phi).as_matrix()
        phi2 = np.asarray(so3_log(jnp.asarray(R, jnp.float32)))
        R2 = Rotation.from_rotvec(phi2).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-3)

    def test_quat_roundtrip(self):
        phi = random_rotvecs(64)
        R = Rotation.from_rotvec(phi).as_matrix().astype(np.float32)
        q = quat_from_rotmat(jnp.asarray(R))
        # scipy uses (x, y, z, w) too
        q_ref = Rotation.from_matrix(R).as_quat()
        q_ref = q_ref * np.where(q_ref[:, 3:4] < 0, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)
        R2 = rotmat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = RNG.normal(size=(32, 6)).astype(np.float32) * 0.8
        R, t = se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_inverse_compose(self):
        xi = jnp.asarray(RNG.normal(size=(6,)).astype(np.float32))
        R, t = se3_exp(xi)
        Ri, ti = se3_inverse(R, t)
        Rc, tc = se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)

    def test_apply(self):
        R, t = se3_exp(jnp.asarray([0.1, -0.2, 0.3, 0.2, 0.1, -0.1], jnp.float32))
        x = jnp.asarray(RNG.normal(size=(10, 3)).astype(np.float32))
        y = se3_apply(R, t, x)
        y_ref = np.asarray(x) @ np.asarray(R).T + np.asarray(t)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)

    def test_jit_and_vmap(self):
        xi = jnp.asarray(RNG.normal(size=(16, 6)).astype(np.float32))
        R, t = jax.jit(jax.vmap(se3_exp))(xi)
        assert R.shape == (16, 3, 3) and t.shape == (16, 3)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = RNG.normal(size=(32, 7)).astype(np.float32) * 0.5
        s, R, t = sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(sim3_log(s, R, t))
        np.testing.assert_allclose(xi2, xi, atol=1e-3)

    def test_reduces_to_se3_at_sigma0(self):
        rng = np.random.default_rng(1)
        xi6 = rng.normal(size=(8, 6)).astype(np.float32) * 0.5
        xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], -1)
        s, R, t = sim3_exp(jnp.asarray(xi7))
        R_ref, t_ref = se3_exp(jnp.asarray(xi6))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), atol=1e-4)

    def test_inverse_compose_apply(self):
        xi = jnp.asarray(RNG.normal(size=(7,)).astype(np.float32) * 0.4)
        s, R, t = sim3_exp(xi)
        si, Ri, ti = sim3_inverse(s, R, t)
        sc, Rc, tc = sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)
        x = jnp.asarray([1.0, 2.0, 3.0])
        y = sim3_apply(s, R, t, x)
        y_ref = float(s) * np.asarray(R) @ np.asarray(x) + np.asarray(t)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)
