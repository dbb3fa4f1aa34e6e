"""Synthetic-scene tests for pose-only GN and two-view initialization."""

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.config import TrackingConfig
from send_slam_tpu.geometry.se3 import se3_exp, se3_inverse
from send_slam_tpu.models.initializer import two_view_init
from send_slam_tpu.models.tracking import pose_only_gn, track_frame

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0
W, H = 640, 480
RNG = np.random.default_rng(3)


def random_scene(n=200):
    return RNG.uniform([-3, -2, 4], [3, 2, 10], size=(n, 3)).astype(np.float32)


def project_np(R, t, X):
    p = X @ R.T + t
    return np.stack([FX * p[:, 0] / p[:, 2] + CX,
                     FY * p[:, 1] / p[:, 2] + CY], -1), p[:, 2]


class TestPoseGN:
    def test_recovers_pose_clean(self):
        X = random_scene()
        R_gt, t_gt = se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.04, 0.02, -0.03]))
        uv, _ = project_np(np.asarray(R_gt), np.asarray(t_gt), X)
        # Perturbed initial guess.
        R0, t0 = se3_exp(jnp.asarray([0.15, -0.1, 0.0, 0.0, 0.05, 0.0]))
        res = pose_only_gn(R0, t0, jnp.asarray(X), jnp.asarray(uv),
                           jnp.ones(len(X), bool), FX, FY, CX, CY)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=1e-3)
        assert int(res.n_inliers) == len(X)

    def test_robust_to_outliers(self):
        X = random_scene(300)
        R_gt, t_gt = se3_exp(jnp.asarray([0.1, 0.1, -0.05, -0.02, 0.03, 0.01]))
        uv, _ = project_np(np.asarray(R_gt), np.asarray(t_gt), X)
        uv = uv + RNG.normal(0, 0.5, uv.shape)          # pixel noise
        n_out = 60
        uv[:n_out] += RNG.uniform(30, 120, (n_out, 2))  # gross outliers
        R0, t0 = se3_exp(jnp.asarray([0.12, 0.05, 0.0, 0.0, 0.0, 0.0]))
        res = pose_only_gn(R0, t0, jnp.asarray(X), jnp.asarray(uv, jnp.float32),
                           jnp.ones(len(X), bool), FX, FY, CX, CY)
        # Outliers detected, pose still accurate.
        assert int(res.n_inliers) >= 220
        inl = np.asarray(res.inlier)
        assert inl[:n_out].sum() < 8, inl[:n_out].sum()
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=2e-2)

    def test_respects_validity_mask(self):
        X = random_scene(100)
        R_gt, t_gt = se3_exp(jnp.asarray([0.05, 0.0, 0.0, 0.0, 0.01, 0.0]))
        uv, _ = project_np(np.asarray(R_gt), np.asarray(t_gt), X)
        uv[50:] = 1e6  # garbage in masked-out rows must not matter
        valid = np.zeros(100, bool)
        valid[:50] = True
        res = pose_only_gn(jnp.eye(3), jnp.zeros(3), jnp.asarray(X),
                           jnp.asarray(uv, jnp.float32), jnp.asarray(valid),
                           FX, FY, CX, CY)
        assert int(res.n_inliers) == 50
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=1e-3)


class TestTrackFrame:
    def test_tracks_with_distractor_keypoints(self):
        n_lm, n_extra = 150, 100
        X = random_scene(n_lm)
        R_gt, t_gt = se3_exp(jnp.asarray([0.08, -0.03, 0.02, 0.01, 0.02, -0.01]))
        uv, z = project_np(np.asarray(R_gt), np.asarray(t_gt), X)

        # Landmark descriptors; frame sees them + distractor keypoints.
        lm_desc = RNG.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)
        kp_desc = np.concatenate(
            [lm_desc, RNG.integers(0, 2**32, (n_extra, 8), dtype=np.uint32)])
        kp_uv = np.concatenate(
            [uv + RNG.normal(0, 0.3, uv.shape),
             RNG.uniform([0, 0], [W, H], (n_extra, 2))]).astype(np.float32)
        kp_octave = np.zeros(n_lm + n_extra, np.int32)

        # Predicted pose slightly off.
        R_pred, t_pred = se3_exp(jnp.asarray([0.06, -0.01, 0.0, 0.0, 0.01, 0.0]))
        cfg = TrackingConfig()
        res = track_frame(
            R_pred, t_pred,
            jnp.asarray(X), jnp.asarray(lm_desc), jnp.ones(n_lm, bool),
            jnp.asarray(kp_uv), jnp.asarray(kp_desc),
            jnp.ones(n_lm + n_extra, bool), jnp.asarray(kp_octave),
            FX, FY, CX, CY, W, H, cfg)
        assert int(res.n_inliers) > 100, int(res.n_inliers)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=2e-3)


class TestTwoViewInit:
    def _build(self, n=300, planar=False):
        X = random_scene(n)
        if planar:
            X[:, 2] = 6.0
        R_gt, t_gt = se3_exp(jnp.asarray([0.3, 0.1, 0.02, 0.02, -0.06, 0.01]))
        uv1, z1 = project_np(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), X)
        uv2, z2 = project_np(np.asarray(R_gt), np.asarray(t_gt), X)
        desc = RNG.integers(0, 2**32, (n, 8), dtype=np.uint32)
        angles = np.zeros(n, np.float32)
        K = jnp.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], jnp.float32)
        return X, R_gt, t_gt, uv1, uv2, desc, angles, K

    def test_initializes_general_scene(self):
        X, R_gt, t_gt, uv1, uv2, desc, ang, K = self._build()
        n = len(X)
        cfg = TrackingConfig()
        res = two_view_init(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(ang),
            jnp.asarray(uv2, jnp.float32), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(ang),
            K, jax.random.PRNGKey(0), cfg)
        assert bool(res.ok), int(res.n_good)
        # Rotation exact up to noise; translation up to scale.
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=5e-3)
        t_est = np.asarray(res.t)
        t_ref = np.asarray(t_gt)
        cos = np.dot(t_est, t_ref) / (np.linalg.norm(t_est) * np.linalg.norm(t_ref))
        assert cos > 0.999, cos
        # Triangulated points match ground truth up to the same scale.
        ok = np.asarray(res.point_ok)
        assert ok.sum() > 200
        scale = np.linalg.norm(t_ref) / np.linalg.norm(t_est)
        np.testing.assert_allclose(np.asarray(res.points)[ok] * scale, X[ok],
                                   atol=0.05)

    def test_initializes_planar_scene_via_homography(self):
        """A pure plane degenerates the essential path; the Faugeras
        homography path must take over."""
        X, R_gt, t_gt, uv1, uv2, desc, ang, K = self._build(planar=True)
        n = len(X)
        res = two_view_init(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(ang),
            jnp.asarray(uv2, jnp.float32), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(ang),
            K, jax.random.PRNGKey(2), TrackingConfig())
        assert bool(res.ok), int(res.n_good)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt),
                                   atol=1e-2)
        t_est = np.asarray(res.t)
        t_ref = np.asarray(t_gt)
        cos = np.dot(t_est, t_ref) / (np.linalg.norm(t_est) * np.linalg.norm(t_ref))
        assert cos > 0.99, cos

    def test_rejects_pure_rotation(self):
        # No translation -> no parallax -> init must refuse.
        n = 300
        X = random_scene(n)
        R_gt, _ = se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.03, -0.05, 0.02]))
        uv1, _ = project_np(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), X)
        uv2, _ = project_np(np.asarray(R_gt), np.zeros(3, np.float32), X)
        desc = RNG.integers(0, 2**32, (n, 8), dtype=np.uint32)
        ang = np.zeros(n, np.float32)
        K = jnp.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], jnp.float32)
        res = two_view_init(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(ang),
            jnp.asarray(uv2, jnp.float32), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(ang),
            K, jax.random.PRNGKey(1), TrackingConfig())
        assert not bool(res.ok), int(res.n_good)
