"""Camera model / triangulation / epipolar numerics vs cv2 oracles."""

import cv2
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.geometry import (
    eight_point_fundamental, homography_dlt, homography_error,
    intrinsics_matrix, project, sampson_error, se3_exp,
    triangulate_batch, undistort_points, unproject,
)

RNG = np.random.default_rng(42)
FX, FY, CX, CY = 517.3, 516.5, 318.6, 255.3
DIST = np.array([0.26, -0.95, -0.005, 0.0026, 1.16], np.float32)


def make_scene(n=100):
    pts = RNG.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3)).astype(np.float32)
    return pts


class TestCameraModel:
    def test_project_matches_cv2(self):
        pts = make_scene()
        uv = np.asarray(project(jnp.asarray(pts), FX, FY, CX, CY, jnp.asarray(DIST)))
        K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float64)
        uv_ref, _ = cv2.projectPoints(
            pts.reshape(-1, 1, 3).astype(np.float64), np.zeros(3), np.zeros(3),
            K, DIST.astype(np.float64))
        np.testing.assert_allclose(uv, uv_ref.reshape(-1, 2), atol=1e-2)

    def test_undistort_matches_cv2(self):
        pts = make_scene()
        uv_d = np.asarray(project(jnp.asarray(pts), FX, FY, CX, CY, jnp.asarray(DIST)))
        uv_u = np.asarray(undistort_points(
            jnp.asarray(uv_d), FX, FY, CX, CY, jnp.asarray(DIST)))
        K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float64)
        ref = cv2.undistortPoints(
            uv_d.reshape(-1, 1, 2).astype(np.float64), K,
            DIST.astype(np.float64), P=K).reshape(-1, 2)
        np.testing.assert_allclose(uv_u, ref, atol=0.05)

    def test_unproject_project_roundtrip(self):
        uv = RNG.uniform([0, 0], [640, 480], size=(50, 2)).astype(np.float32)
        rays = unproject(jnp.asarray(uv), FX, FY, CX, CY)
        uv2 = project(rays, FX, FY, CX, CY)
        np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-4)


class TestTriangulation:
    def test_triangulate_recovers_points(self):
        pts = make_scene(64)
        K = np.asarray(intrinsics_matrix(FX, FY, CX, CY))
        R, t = se3_exp(jnp.asarray([0.3, 0.05, 0.0, 0.02, -0.04, 0.01], jnp.float32))
        R, t = np.asarray(R), np.asarray(t)
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, t[:, None]])
        x1 = pts @ K.T
        x1 = x1[:, :2] / x1[:, 2:3]
        pc2 = pts @ R.T + t
        x2 = pc2 @ K.T
        x2 = x2[:, :2] / x2[:, 2:3]
        X = np.asarray(triangulate_batch(
            jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32),
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)))
        np.testing.assert_allclose(X, pts, atol=5e-2)


class TestEpipolar:
    def _two_view(self, n=80, noise=0.0):
        pts = make_scene(n)
        K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
        R, t = se3_exp(jnp.asarray([0.4, 0.1, 0.05, 0.03, -0.05, 0.02], jnp.float32))
        R, t = np.asarray(R), np.asarray(t)
        x1 = pts @ K.T
        x1 = x1[:, :2] / x1[:, 2:3]
        pc2 = pts @ R.T + t
        x2 = pc2 @ K.T
        x2 = x2[:, :2] / x2[:, 2:3]
        if noise:
            x1 = x1 + RNG.normal(scale=noise, size=x1.shape)
            x2 = x2 + RNG.normal(scale=noise, size=x2.shape)
        return x1.astype(np.float32), x2.astype(np.float32), K, R, t

    def test_eight_point_low_residual(self):
        x1, x2, K, R, t = self._two_view()
        F = eight_point_fundamental(jnp.asarray(x1), jnp.asarray(x2))
        err = np.asarray(sampson_error(F, jnp.asarray(x1), jnp.asarray(x2)))
        assert np.median(err) < 1e-2, np.median(err)

    def test_eight_point_matches_cv2(self):
        x1, x2, K, R, t = self._two_view(noise=0.3)
        F = np.asarray(eight_point_fundamental(jnp.asarray(x1), jnp.asarray(x2)))
        F_ref, _ = cv2.findFundamentalMat(x1, x2, cv2.FM_8POINT)
        # Compare up to scale via normalized Frobenius distance.
        a = F / np.linalg.norm(F)
        b = F_ref / np.linalg.norm(F_ref)
        d = min(np.linalg.norm(a - b), np.linalg.norm(a + b))
        assert d < 5e-2, d

    def test_homography_planar(self):
        # Planar scene: all points at z=5 plane.
        pts = make_scene(40)
        pts[:, 2] = 5.0
        K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
        R, t = se3_exp(jnp.asarray([0.3, -0.1, 0.02, 0.05, 0.02, -0.03], jnp.float32))
        R, t = np.asarray(R), np.asarray(t)
        x1 = pts @ K.T
        x1 = (x1[:, :2] / x1[:, 2:3]).astype(np.float32)
        pc2 = pts @ R.T + t
        x2 = pc2 @ K.T
        x2 = (x2[:, :2] / x2[:, 2:3]).astype(np.float32)
        H = homography_dlt(jnp.asarray(x1), jnp.asarray(x2))
        err = np.asarray(homography_error(H, jnp.asarray(x1), jnp.asarray(x2)))
        assert np.max(err) < 1e-2, np.max(err)


class TestKannalaBrandt8:
    DIST_KB = np.array([-0.28, 0.07, 0.0002, 1.8e-05], np.float32)

    def test_project_matches_cv2_fisheye(self):
        from send_slam_tpu.geometry.camera import project_kb8
        pts = make_scene()
        uv = np.asarray(project_kb8(jnp.asarray(pts), 458.0, 457.0,
                                    367.0, 248.0, jnp.asarray(self.DIST_KB)))
        K = np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1]])
        ref, _ = cv2.fisheye.projectPoints(
            pts.reshape(-1, 1, 3).astype(np.float64),
            np.zeros(3), np.zeros(3), K, self.DIST_KB.astype(np.float64))
        np.testing.assert_allclose(uv, ref.reshape(-1, 2), atol=1e-2)

    def test_undistort_roundtrip(self):
        from send_slam_tpu.geometry.camera import (
            project_kb8, undistort_points_kb8,
        )
        pts = make_scene()
        uv_d = project_kb8(jnp.asarray(pts), 458.0, 457.0, 367.0, 248.0,
                           jnp.asarray(self.DIST_KB))
        uv_u = np.asarray(undistort_points_kb8(
            uv_d, 458.0, 457.0, 367.0, 248.0, jnp.asarray(self.DIST_KB)))
        # Undistorted = pinhole projection of the same points.
        from send_slam_tpu.geometry.camera import project
        ref = np.asarray(project(jnp.asarray(pts), 458.0, 457.0, 367.0, 248.0))
        np.testing.assert_allclose(uv_u, ref, atol=0.05)


class TestSampsonRefinement:
    """refine_rt_sampson: geometric GN on the essential manifold must
    recover the t-direction the algebraic 8-point refit leaves as a
    lottery at low parallax (round-4 init-tail forensics; no reference
    counterpart — TwoViewReconstruction gets the same effect from its
    iterative BA refinement)."""

    def _low_parallax_pair(self, n=300, noise=5e-4, baseline=0.02):
        rng = np.random.default_rng(3)
        from scipy.spatial.transform import Rotation
        R_gt = Rotation.from_rotvec([0.02, -0.03, 0.01]).as_matrix()
        t_gt = np.array([1.0, 0.2, -0.1])
        t_gt /= np.linalg.norm(t_gt)
        X = rng.uniform(-1, 1, (n, 3)) + [0, 0, 4.0]
        x1 = X[:, :2] / X[:, 2:]
        Xc2 = X @ R_gt.T + baseline * t_gt
        x2 = Xc2[:, :2] / Xc2[:, 2:]
        x1 = x1 + rng.normal(0, noise, x1.shape)
        x2 = x2 + rng.normal(0, noise, x2.shape)
        return (x1.astype(np.float32), x2.astype(np.float32),
                R_gt.astype(np.float32), t_gt.astype(np.float32))

    def test_pins_translation_direction(self):
        from scipy.spatial.transform import Rotation
        from send_slam_tpu.geometry.epipolar import refine_rt_sampson
        x1, x2, R_gt, t_gt = self._low_parallax_pair()
        R0 = Rotation.from_rotvec([0.025, -0.028, 0.012]).as_matrix()
        t0 = t_gt + np.array([0.3, -0.2, 0.1])   # ~13 deg off
        w = np.ones(len(x1), np.float32)
        R, t = refine_rt_sampson(
            jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w))
        R, t = np.asarray(R), np.asarray(t)
        tdir_err = np.degrees(np.arccos(min(abs(float(t @ t_gt)), 1.0)))
        rot_err = np.degrees(np.arccos(
            np.clip((np.trace(R @ R_gt.T) - 1) / 2, -1, 1)))
        assert tdir_err < 5.0, tdir_err      # start: ~13 deg
        assert rot_err < 0.1, rot_err

    def test_step_acceptance_never_worsens_cost(self):
        """On a degenerate (zero-baseline) pair the cost surface in t
        is flat/noisy — refinement must not run away from the start."""
        from send_slam_tpu.geometry.epipolar import (
            refine_rt_sampson, sampson_cost,
        )
        x1, x2, R_gt, t_gt = self._low_parallax_pair(baseline=0.0)
        R0 = R_gt.copy()
        t0 = np.array([1.0, 0.0, 0.0], np.float32)
        w = np.ones(len(x1), np.float32)
        R, t = refine_rt_sampson(
            jnp.asarray(R0), jnp.asarray(t0),
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w))
        c0 = sampson_cost(jnp.asarray(R0), jnp.asarray(t0),
                          jnp.asarray(x1), jnp.asarray(x2),
                          jnp.asarray(w))
        c1 = sampson_cost(R, t, jnp.asarray(x1), jnp.asarray(x2),
                          jnp.asarray(w))
        assert float(c1) <= float(c0) * (1 + 1e-5), (float(c0), float(c1))
