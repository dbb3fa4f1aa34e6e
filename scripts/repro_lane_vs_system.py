"""Is lane rot a multicam defect or the config's conditioning floor?

Runs the single-camera System on the EXACT trajectory/world/config of
TestMergeConsistency's worst lane (env SLAM_LANE, default 3) and
reports the same forensics as repro_merge_gauge: gauge fit, trajectory
residual, own-landmark median distance to true structure. If the
System rots too, the 160x120/256-feature config is below the engine's
conditioning floor and the test scenario — not the lane pipeline — is
what needs fixing."""

import os
import sys

sys.path.insert(0, ".")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1")

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.spatial import cKDTree

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import umeyama_alignment
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


def main():
    lane = int(os.environ.get("SLAM_LANE", "3"))
    cfg = EngineConfig(
        orb=OrbConfig(n_features=256, n_levels=3),
        camera=CameraConfig(width=160, height=120, fx=130.0,
                            fy=130.0, cx=80.0, cy=60.0),
        map=MapConfig(max_keyframes=8, max_landmarks=1024,
                      ba_window=4),
        tracking=TrackingConfig(init_min_matches=30,
                                kf_max_interval=3),
    )
    world = SyntheticWorld(n_points=700, width=160, height=120,
                           fx=130.0, fy=130.0)

    def lane_center(s):
        return np.array([0.35 * lane - 1.2 + 0.12 * s,
                         0.05 * np.sin(0.7 * s), 0.05 * s])

    n_steps = int(os.environ.get("SLAM_STEPS", "30"))
    s = System(cfg)
    est, gts = [], []
    for k in range(n_steps):
        c = lane_center(k)
        img = world.render(np.eye(3), -c)
        out = s.track_monocular(img.astype(np.float32), k / 30.0)
        gts.append(c)
        if out.tracking_state == 2:
            est.append((k, np.asarray(out.position)))
        print(f"s{k:02d} state {out.tracking_state} inl {out.n_inliers}",
              flush=True)
    s._flush_pipeline()

    if len(est) < 4:
        print("too few tracked frames:", len(est))
        return
    e = np.stack([p for _, p in est])
    g = np.stack([gts[k] for k, _ in est])
    s_l, R_l, t_l = umeyama_alignment(e, g, with_scale=True)
    resid = np.sqrt(np.mean(np.sum(
        ((s_l * (R_l @ e.T)).T + t_l - g) ** 2, -1)))
    lm_valid = np.asarray(s.map.lm_valid)
    lm_pos = np.asarray(s.map.lm_pos)[lm_valid]
    w = (s_l * (R_l @ lm_pos.T)).T + t_l
    tree = cKDTree(world.points)
    d, _ = tree.query(w)
    print(f"SYSTEM lane {lane}: n_est {len(e)}  gauge_scale {s_l:.2f}  "
          f"traj_resid {resid:.3f} m  own_lm_med {np.median(d):.3f} m  "
          f"p90 {np.percentile(d, 90):.3f} m  own_n {lm_pos.shape[0]}")


if __name__ == "__main__":
    main()
