"""Repro: merge-consistency test's lane goes LOST mid-run.

Replays tests/test_parallel.py::TestMergeConsistency's tracking phase
on the 8-device CPU mesh and prints per-step per-lane summary rows
[mode, n_inl, n_kf, n_lm, nfeat] to find when/why a lane drops."""

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

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.parallel import (
    init_multicam, make_mesh, multicam_slam_step,
)
from send_slam_tpu.utils.synth import SyntheticWorld


def main():
    n = len(jax.devices())
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
    mesh = make_mesh(n, ("cam",))
    state = init_multicam(cfg, n)
    step = multicam_slam_step(cfg, mesh)

    def lane_center(lane, s):
        return np.array([0.35 * lane - 1.2 + 0.12 * s,
                         0.05 * np.sin(0.7 * s), 0.05 * s])

    key = jax.random.PRNGKey(11)
    for s in range(14):
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
        cells = " | ".join(
            f"m{int(r[0])} i{int(r[1]):3d} kf{int(r[2])} lm{int(r[3]):4d} "
            f"f{int(r[7]):3d}" for r in srow)
        print(f"s{s:02d}  {cells}", flush=True)


if __name__ == "__main__":
    main()
