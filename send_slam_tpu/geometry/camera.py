"""Camera models: pinhole projection + radtan (k1 k2 p1 p2 k3) distortion.

Replaces ORB-SLAM3's CameraModels/Pinhole.cpp (CMakeLists.txt:68) and
the calibration payload the reference sends ("PinHole",
image_logger.ex:124-150). KannalaBrandt8 fisheye is a documented
non-goal for mono pinhole parity but the radtan model here covers the
TUM/EuRoC pinhole sequences.

All functions broadcast over leading axes (vmap-free batch use).
"""

from __future__ import annotations

import jax.numpy as jnp


def intrinsics_matrix(fx, fy, cx, cy, dtype=jnp.float32):
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=dtype)
    return K


def distort_radtan(xn, dist):
    """Apply radial-tangential distortion to normalized coords.

    xn: (…,2) normalized image coords (x/z, y/z)
    dist: (5,) = (k1, k2, p1, p2, k3)
    """
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], -1)


def project(points_cam, fx, fy, cx, cy, dist=None):
    """Camera-frame 3D points (…,3) -> pixel coords (…,2).

    If ``dist`` (5,) is given, applies radtan before the intrinsics.
    Guards z with a floor; callers should mask points behind the camera.
    """
    z = jnp.maximum(points_cam[..., 2], 1e-6)
    xn = points_cam[..., :2] / z[..., None]
    if dist is not None:
        xn = distort_radtan(xn, dist)
    u = fx * xn[..., 0] + cx
    v = fy * xn[..., 1] + cy
    return jnp.stack([u, v], -1)


def unproject(uv, fx, fy, cx, cy):
    """Pixels (…,2) -> unit-depth normalized rays (…,3), no distortion."""
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], -1)


def distort_kb8(xn, dist):
    """Kannala-Brandt (fisheye, "KannalaBrandt8") distortion on
    normalized coords: theta-polynomial model with k1..k4
    (ORB-SLAM3 CameraModels/KannalaBrandt8.cpp; cv2.fisheye).

    xn: (…,2); dist: (4,) = (k1, k2, k3, k4).
    """
    k1, k2, k3, k4 = dist[0], dist[1], dist[2], dist[3]
    r = jnp.sqrt(jnp.sum(xn * xn, -1))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = theta_d / jnp.maximum(r, 1e-9)
    scale = jnp.where(r < 1e-9, 1.0, scale)
    return xn * scale[..., None]


def project_kb8(points_cam, fx, fy, cx, cy, dist):
    """Fisheye projection: camera-frame points (…,3) -> pixels (…,2)."""
    z = jnp.maximum(points_cam[..., 2], 1e-6)
    xn = points_cam[..., :2] / z[..., None]
    xd = distort_kb8(xn, dist)
    u = fx * xd[..., 0] + cx
    v = fy * xd[..., 1] + cy
    return jnp.stack([u, v], -1)


def undistort_points_kb8(uv, fx, fy, cx, cy, dist, iters: int = 10):
    """Invert the KB8 model by Newton iteration on theta (like
    cv2.fisheye.undistortPoints). Returns pixel coords under pure
    pinhole K."""
    k1, k2, k3, k4 = dist[0], dist[1], dist[2], dist[3]
    xd = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], -1)
    theta_d = jnp.sqrt(jnp.sum(xd * xd, -1))
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d
        df = 1 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
        theta = theta - f / jnp.maximum(df, 1e-9)
    r = jnp.tan(theta)
    scale = r / jnp.maximum(theta_d, 1e-9)
    scale = jnp.where(theta_d < 1e-9, 1.0, scale)
    xn = xd * scale[..., None]
    u = fx * xn[..., 0] + cx
    v = fy * xn[..., 1] + cy
    return jnp.stack([u, v], -1)


def undistort_points(uv, fx, fy, cx, cy, dist, iters: int = 8):
    """Iteratively invert radtan distortion (like cv2.undistortPoints).

    Returns *pixel* coordinates in the same K (i.e. P = K on output).
    Fixed iteration count for jit friendliness; 8 Newton-ish fixed-point
    steps match OpenCV's default tolerance on realistic distortion.
    """
    x0 = (uv[..., 0] - cx) / fx
    y0 = (uv[..., 1] - cy) / fy
    xd = jnp.stack([x0, y0], -1)
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]

    xn = xd
    for _ in range(iters):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        xn = jnp.stack([
            (xd[..., 0] - dx) / radial,
            (xd[..., 1] - dy) / radial,
        ], -1)
    u = fx * xn[..., 0] + cx
    v = fy * xn[..., 1] + cy
    return jnp.stack([u, v], -1)
