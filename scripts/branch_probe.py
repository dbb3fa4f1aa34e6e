"""Replicates tests/test_loop_e2e.py::test_long_loop_with_branch with
config overrides, printing loop diagnostics — the round-3 harness for
the subpixel-ON branch-scenario regression (0.61 vs the 0.06 bar).

Usage: SLAM_ORB_SUBPIXEL=1 python scripts/branch_probe.py
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import conftest  # noqa: F401

import dataclasses

import numpy as np
from scipy.spatial.transform import Rotation

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import ate_rmse
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


def main():
    world = SyntheticWorld(n_points=800, seed=9)
    orb_kwargs = dict(n_features=512, n_levels=4)
    otypes = {f.name: type(getattr(OrbConfig(), f.name))
              for f in dataclasses.fields(OrbConfig)}
    for k, v in os.environ.items():
        if k.startswith("SLAM_ORB_"):
            name = k[len("SLAM_ORB_"):].lower()
            cast = otypes[name]
            orb_kwargs[name] = (v.lower() in ("1", "true", "yes")
                                if cast is bool else cast(v))
            print(f"# override orb.{name} = {orb_kwargs[name]}")
    cfg = EngineConfig(
        orb=OrbConfig(**orb_kwargs),
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy),
        map=MapConfig(max_keyframes=64, max_landmarks=4096, ba_window=4),
        tracking=TrackingConfig(init_min_matches=50, pipeline_depth=2,
                                pipeline_stretch=1, loop_min_gap_kf=10),
    )
    n_frames, fps = 260, 30.0
    ts, Rs, tls = [], [], []
    for k in range(n_frames):
        a = k / (n_frames - 1)
        if a < 0.35:
            x, y = 1.6 * (a / 0.35), 0.0
        elif a < 0.6:
            b = (a - 0.35) / 0.25
            x, y = 1.6, 0.5 * np.sin(np.pi * b)
        elif a < 0.93:
            b = (a - 0.6) / 0.33
            x, y = 1.6 * (1 - b), 0.0
        else:
            x, y = 0.0, 0.0
        yaw = -0.1 * x / 1.6
        c = np.array([x, y, 0.0])
        R = Rotation.from_euler("y", yaw).as_matrix().T
        ts.append(k / fps)
        Rs.append(R)
        tls.append(-R @ c)
    ts = np.asarray(ts)

    sys_ = System(cfg)
    n_ok = 0
    for k in range(n_frames):
        out = sys_.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
        n_ok += out.tracking_state == 2
    gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
    kts, kpos, _ = sys_.keyframe_poses()
    err = ate_rmse(kts, kpos, ts, np.asarray(gt_pos))
    print(f"tracked: {n_ok}/{n_frames}  kfs: {int(np.asarray(sys_.map.n_kf))}")
    print(f"loops closed: {sys_.loops_closed}")
    print(f"loop attempts (last 10): {sys_.loop_attempts[-10:]}")
    print(f"corrected KF ATE: {err:.4f}")
    # Per-KF aligned errors to localize the residual.
    from send_slam_tpu.io.evaluate import umeyama_alignment
    gk = np.stack([np.asarray(gt_pos)[np.argmin(np.abs(ts - t))]
                   for t in kts])
    s2, R2, t2 = umeyama_alignment(kpos, gk)
    kerr = np.linalg.norm((s2 * (R2 @ kpos.T)).T + t2 - gk, axis=1)
    for t, v in zip(kts, kerr):
        print(f"kf t={t:6.3f}  err {v:.4f}")


if __name__ == "__main__":
    main()
