"""A/B: essential-graph covisibility-edge temporal-gap filter
(VERDICT r2 item 7 / weak #8).

Long-range covisibility edges are MEASURED in drifted coordinates: an
edge between KF 5 and KF 50 encodes the relative pose the drifted
estimates had, so during loop PGO it fights the correction the loop
edge supplies. covis_edges(max_gap=N) drops edges spanning more than N
keyframe slots; the System currently ships with the filter DISABLED
(loop_covis_max_gap=0). This harness runs the two loop scenarios
(out-and-back revisit + branch excursion) across seeds for each gap
setting and prints corrected keyframe-trajectory ATE. Keep the winner.

Usage: python scripts/ab_covis_gap.py [gap0 gap1 ...]   (default 0 20)
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import conftest  # noqa: F401  (CPU backend, like the suite)

import numpy as np
from scipy.spatial.transform import Rotation

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import ate_rmse
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld

from test_loop_e2e import out_and_back


def branch_traj(n_frames=260, fps=30.0):
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
        Rwc = Rotation.from_euler("y", yaw).as_matrix()
        R = Rwc.T
        ts.append(k / fps)
        Rs.append(R)
        tls.append(-R @ c)
    return np.asarray(ts), Rs, tls


def run_once(world, ts, Rs, tls, gap: int, seed: int):
    cfg = EngineConfig(
        orb=OrbConfig(n_features=512, n_levels=4),
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy),
        map=MapConfig(max_keyframes=64, max_landmarks=4096, ba_window=4),
        tracking=TrackingConfig(init_min_matches=50, pipeline_depth=2,
                                pipeline_stretch=1, loop_min_gap_kf=10,
                                loop_covis_max_gap=gap),
    )
    sys_ = System(cfg)
    sys_._key = __import__("jax").random.PRNGKey(seed)
    for k in range(len(ts)):
        sys_.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
    sys_._flush_pipeline()
    gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
    kts, kpos, _ = sys_.keyframe_poses()
    err = ate_rmse(kts, kpos, ts, np.asarray(gt_pos))
    return err, sys_.loops_closed


def main():
    gaps = [int(g) for g in sys.argv[1:]] or [0, 20]
    scen = {
        "revisit": (SyntheticWorld(n_points=700, seed=5), out_and_back()),
        "branch": (SyntheticWorld(n_points=800, seed=9), branch_traj()),
    }
    for name, (world, (ts, Rs, tls)) in scen.items():
        for gap in gaps:
            errs, loops = [], []
            for seed in (0, 1, 2):
                e, nl = run_once(world, ts, Rs, tls, gap, seed)
                errs.append(e)
                loops.append(nl)
            print(f"{name:8s} gap={gap:3d}  ATE "
                  f"{' '.join(f'{e:.3f}' for e in errs)}  "
                  f"median {np.median(errs):.3f}  loops {loops}",
                  flush=True)


if __name__ == "__main__":
    main()
