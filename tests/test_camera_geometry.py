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
