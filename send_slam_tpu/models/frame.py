"""Per-frame feature bundle: ORB features + undistorted keypoints.

The TPU-native analogue of ORB-SLAM3's Frame (CMakeLists.txt:62).
Keypoints are undistorted once at construction (like
Frame::UndistortKeyPoints) so the whole downstream pipeline projects
with a pure pinhole model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from send_slam_tpu.config import CameraConfig, OrbConfig
from send_slam_tpu.geometry.camera import (
    undistort_points, undistort_points_kb8,
)
from send_slam_tpu.ops.orb import FrameFeatures, extract_orb


class Frame(NamedTuple):
    feat: FrameFeatures
    uv_und: jnp.ndarray      # (N, 2) float32 — undistorted pixel coords
    timestamp: jnp.ndarray   # () float64/float32


def make_frame(img: jnp.ndarray, timestamp, orb_cfg: OrbConfig,
               cam: CameraConfig) -> Frame:
    """(H, W) float32 grayscale -> Frame. Jit-compatible."""
    feat = extract_orb(img, orb_cfg)
    has_dist = any(abs(v) > 0 for v in (cam.k1, cam.k2, cam.p1, cam.p2, cam.k3))
    if cam.model == "KannalaBrandt8":
        dist = jnp.asarray([cam.k1, cam.k2, cam.p1, cam.p2], jnp.float32)
        uv_und = undistort_points_kb8(
            feat.uv, cam.fx, cam.fy, cam.cx, cam.cy, dist)
    elif has_dist:
        dist = jnp.asarray(
            [cam.k1, cam.k2, cam.p1, cam.p2, cam.k3], jnp.float32)
        uv_und = undistort_points(
            feat.uv, cam.fx, cam.fy, cam.cx, cam.cy, dist)
    else:
        uv_und = feat.uv
    return Frame(feat=feat, uv_und=uv_und,
                 timestamp=jnp.asarray(timestamp, jnp.float32))
