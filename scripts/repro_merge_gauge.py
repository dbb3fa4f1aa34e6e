"""Repro + forensics for TestMergeConsistency's wrong-gauge import.

Replays the test scenario, then reports per lane:
  - OWN-map landmark median distance to true structure (through the
    lane's Umeyama gauge) — is the lane itself healthy?
  - gauge-fit trajectory RMS residual,
  - Sim3 inlier count + support RMS radius (re-run host-side),
  - imported-landmark median distance (the test's failing metric).
"""

import os
import sys

sys.path.insert(0, ".")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import umeyama_alignment
from send_slam_tpu.parallel import (
    init_multicam, make_mesh, multicam_slam_step,
)
from send_slam_tpu.parallel.map_merge import multicam_merge_step
from send_slam_tpu.utils.synth import SyntheticWorld

MODE_TRACKING = 2


def main():
    n = len(jax.devices())
    cfg = EngineConfig(
        orb=OrbConfig(n_features=256, n_levels=3),
        camera=CameraConfig(width=160, height=120, fx=130.0,
                            fy=130.0, cx=80.0, cy=60.0),
        map=MapConfig(max_keyframes=8, max_landmarks=1024,
                      ba_window=4),
        tracking=TrackingConfig(
            init_min_matches=30, kf_max_interval=3,
            lm_band_floor_octaves=int(
                os.environ.get("SLAM_BAND_FLOOR", "6"))),
    )
    world = SyntheticWorld(n_points=700, width=160, height=120,
                           fx=130.0, fy=130.0)
    mesh = make_mesh(n, ("cam",))
    state = init_multicam(cfg, n)
    step = multicam_slam_step(cfg, mesh)

    def lane_center(lane, s):
        return np.array([0.35 * lane - 1.2 + 0.12 * s,
                         0.05 * np.sin(0.7 * s), 0.05 * s])

    key = jax.random.PRNGKey(11)
    n_steps = 14
    est = [[] for _ in range(n)]
    gts = [[] for _ in range(n)]
    for s in range(n_steps):
        imgs = []
        for lane in range(n):
            R = np.eye(3)
            c = lane_center(lane, s)
            imgs.append(world.render(R, -R @ c))
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n)
        state, summary = step(
            state, jnp.asarray(np.stack(imgs), jnp.float32),
            jnp.full((n,), s / 30.0, jnp.float32), keys)
        srow = np.asarray(summary)
        for lane in range(n):
            gts[lane].append(lane_center(lane, s))
            if int(srow[lane, 0]) == MODE_TRACKING:
                est[lane].append((s, srow[lane, 4:7].copy()))

    tree = cKDTree(world.points)
    pre_valid = np.asarray(state.maps.lm_valid)
    pre_pos = np.asarray(state.maps.lm_pos)

    gauges = []
    for lane in range(n):
        e = np.stack([p for _, p in est[lane]])
        g = np.stack([gts[lane][s] for s, _ in est[lane]])
        s_l, R_l, t_l = umeyama_alignment(e, g, with_scale=True)
        resid = np.sqrt(np.mean(np.sum(
            ((s_l * (R_l @ e.T)).T + t_l - g) ** 2, -1)))
        own = pre_pos[lane][pre_valid[lane]]
        own_w = (s_l * (R_l @ own.T)).T + t_l
        d_own, _ = tree.query(own_w)
        gauges.append((s_l, R_l, t_l))
        print(f"lane {lane}: n_est {len(e)}  gauge_scale {s_l:.2f}  "
              f"traj_resid {resid:.3f} m  own_lm_med "
              f"{np.median(d_own):.3f} m  own_n {own.shape[0]}")

    merge = multicam_merge_step(cfg, mesh)
    key, sub = jax.random.split(key)
    keys = jax.random.split(sub, n)
    maps2, ok, n_imp = merge(state.maps, keys)
    ok = np.asarray(ok); n_imp = np.asarray(n_imp)
    print("merge ok:", ok, "imported:", n_imp)

    lm_pos = np.asarray(maps2.lm_pos)
    lm_valid = np.asarray(maps2.lm_valid)
    for lane in range(n):
        if not ok[lane]:
            continue
        imported = lm_valid[lane] & ~pre_valid[lane]
        if imported.sum() == 0:
            continue
        s_l, R_l, t_l = gauges[lane]
        w = (s_l * (R_l @ lm_pos[lane][imported].T)).T + t_l
        d, _ = tree.query(w)
        print(f"lane {lane}: imported {int(imported.sum())}  med "
              f"{np.median(d):.3f} m  p90 {np.percentile(d, 90):.3f} m")


if __name__ == "__main__":
    main()
