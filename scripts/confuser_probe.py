"""Replicates tests/test_loop_e2e.py::test_confuser_texture_closes_right_loop
with SLAM_TR_*/SLAM_ORB_* config overrides, printing loop diagnostics —
for A/B-ing cascade-damping knobs (kf_weak_frames, loop_cooldown_kf)
against the build-perturbation fragility of the confuser scenario.

Usage: SLAM_TR_KF_WEAK_FRAMES=2 python scripts/confuser_probe.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import conftest  # noqa: F401

import numpy as np

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import ate_rmse
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


def _overrides(prefix, cls):
    types = {f.name: type(getattr(cls(), f.name))
             for f in dataclasses.fields(cls)}
    out = {}
    for k, v in os.environ.items():
        if k.startswith(prefix):
            name = k[len(prefix):].lower()
            cast = types[name]
            if cast is bool:
                out[name] = v.lower() in ("1", "true", "yes")
            elif cast is tuple:
                out[name] = tuple(int(x) for x in v.split(","))
            else:
                out[name] = cast(v)
            print(f"# override {name} = {out[name]}")
    return out


def main():
    world = SyntheticWorld(n_points=700, seed=5)
    rng = np.random.default_rng(11)
    ptsA = np.asarray(world.points)
    ptsB = ptsA + np.array([7.0, 0.0, 0.0]) + rng.normal(0, 0.35, ptsA.shape)
    world.points = np.concatenate([ptsA, ptsB])
    world.intensity = np.concatenate([world.intensity] * 2)
    world.size_at_1m = np.concatenate([world.size_at_1m] * 2)
    world.grad_dir = np.concatenate([world.grad_dir] * 2)

    tr_kwargs = dict(init_min_matches=50, pipeline_depth=2,
                     pipeline_stretch=1, loop_min_gap_kf=10)
    tr_kwargs.update(_overrides("SLAM_TR_", TrackingConfig))
    orb_kwargs = dict(n_features=512, n_levels=4)
    orb_kwargs.update(_overrides("SLAM_ORB_", OrbConfig))
    cfg = EngineConfig(
        orb=OrbConfig(**orb_kwargs),
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy),
        map=MapConfig(max_keyframes=64, max_landmarks=4096, ba_window=4),
        tracking=TrackingConfig(**tr_kwargs),
    )
    n_frames, fps, hold = 300, 30.0, 16
    move = n_frames - hold
    ts, Rs, tls = [], [], []
    for k in range(n_frames):
        a = min(k, move - 1) / (move - 1)
        x = 4.5 * (1 - abs(2 * a - 1))
        c = np.array([x, 0.0, 0.0])
        R = np.eye(3)
        ts.append(k / fps)
        Rs.append(R)
        tls.append(-R @ c)
    ts = np.asarray(ts)
    t_a_end = ts[int(0.35 * n_frames)]

    sys_ = System(cfg)
    n_ok = 0
    for k in range(n_frames):
        out = sys_.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
        n_ok += out.tracking_state == 2
    sys_._flush_pipeline()

    applied = [a for a in sys_.loop_attempts if a[3] is True]
    kf_ts = np.asarray(sys_.map.kf_timestamp)
    kf_valid = np.asarray(sys_.map.kf_valid)
    print(f"tracked: {n_ok}/{n_frames}  kfs: {int(np.asarray(sys_.map.n_kf))}")
    print(f"loops closed: {sys_.loops_closed}  attempts: "
          f"{len(sys_.loop_attempts)}")
    for a in sys_.loop_attempts:
        print("  attempt", a)
    wrong = 0
    for a in applied:
        slot = a[4]
        if slot is not None and kf_valid[slot] and kf_ts[slot] > t_a_end:
            wrong += 1
    print(f"applied: {len(applied)}  wrong-region: {wrong}")
    gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
    kts, kpos, _ = sys_.keyframe_poses()
    err = ate_rmse(kts, kpos, ts, np.asarray(gt_pos))
    print(f"corrected KF ATE: {err:.4f}")


if __name__ == "__main__":
    main()
