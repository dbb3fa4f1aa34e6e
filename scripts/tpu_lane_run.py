"""8-lane multicam scenario on the REAL chip: the TPU-side validation
of the in-graph per-lane init discipline + ring merge (VERDICT r4
next-round #5).

Runs the exact TestMergeConsistency scenario (tests/test_parallel.py)
on whatever backend JAX exposes — on this machine the axon TPU v5e —
with all 8 lanes vmapped onto a 1-device mesh (the shard body is
vmap(per_cam), so lanes-per-device is free; on an 8-chip pod the same
code shards 1 lane per chip). Writes MULTICAM_TPU_r05.json with
per-lane trajectory ATE, per-lane imported-landmark structure medians
and merge acceptance — the committed artifact the CPU test bars are
cross-checked against.

Usage: python scripts/tpu_lane_run.py          (~10 min incl. compiles)
       SLAM_LANE_CPU=1 python scripts/tpu_lane_run.py   (CPU control)
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)

if os.environ.get("SLAM_LANE_CPU") == "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import jax.numpy as jnp

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import umeyama_alignment
from send_slam_tpu.parallel.map_merge import multicam_merge_step
from send_slam_tpu.parallel.mesh import make_mesh
from send_slam_tpu.parallel.multicam import (
    MODE_TRACKING, init_multicam, multicam_slam_step,
)
from send_slam_tpu.utils.synth import SyntheticWorld


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    n = 8                       # lanes, NOT devices
    n_dev = min(len(jax.devices()), n)
    cfg = EngineConfig(
        orb=OrbConfig(n_features=256, n_levels=3),
        camera=CameraConfig(width=160, height=120, fx=130.0,
                            fy=130.0, cx=80.0, cy=60.0),
        map=MapConfig(max_keyframes=8, max_landmarks=1024, ba_window=4),
        tracking=TrackingConfig(init_min_matches=30, kf_max_interval=3),
    )
    world = SyntheticWorld(n_points=700, width=160, height=120,
                           fx=130.0, fy=130.0)
    mesh = make_mesh(n_dev, ("cam",))
    state = init_multicam(cfg, n)
    step = multicam_slam_step(cfg, mesh)

    def lane_center(lane, s):
        return np.array([0.35 * lane - 1.2 + 0.12 * s,
                         0.05 * np.sin(0.7 * s), 0.05 * s])

    key = jax.random.PRNGKey(11)
    n_steps = 14
    est = [[] for _ in range(n)]
    gts = [[] for _ in range(n)]
    t0 = time.time()
    step_times = []
    for s in range(n_steps):
        imgs = [world.render(np.eye(3), -lane_center(lane, s))
                for lane in range(n)]
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n)
        t1 = time.time()
        state, summary = step(
            state, jnp.asarray(np.stack(imgs), jnp.float32),
            jnp.full((n,), s / 30.0, jnp.float32), keys)
        srow = np.asarray(summary)       # sync (fine at step rate here)
        step_times.append(time.time() - t1)
        for lane in range(n):
            gts[lane].append(lane_center(lane, s))
            if int(srow[lane, 0]) == MODE_TRACKING:
                est[lane].append((s, srow[lane, 4:7].copy()))
        print(f"# step {s}: modes {srow[:, 0].astype(int)}",
              file=sys.stderr)

    # Ring merge
    merge = multicam_merge_step(cfg, mesh)
    key, sub = jax.random.split(key)
    keys = jax.random.split(sub, n)
    pre_valid = np.asarray(state.maps.lm_valid)
    maps2, ok, n_imp = merge(state.maps, keys)
    ok = np.asarray(ok)
    n_imp = np.asarray(n_imp)

    # Per-lane trajectory ATE (Sim3-aligned) + imported-structure check
    from scipy.spatial import cKDTree
    tree = cKDTree(world.points)
    lm_pos = np.asarray(maps2.lm_pos)
    lm_valid = np.asarray(maps2.lm_valid)
    lane_ates, struct_meds = [], []
    for lane in range(n):
        if len(est[lane]) < 3:
            lane_ates.append(float("inf"))
            struct_meds.append(float("inf"))
            continue
        e = np.stack([p for _, p in est[lane]])
        g = np.stack([gts[lane][s] for s, _ in est[lane]])
        s_l, R_l, t_l = umeyama_alignment(e, g, with_scale=True)
        resid = (s_l * (R_l @ e.T)).T + t_l - g
        lane_ates.append(float(np.sqrt(np.mean(np.sum(resid ** 2, -1)))))
        imported = lm_valid[lane] & ~pre_valid[lane]
        if imported.sum():
            wp = (s_l * (R_l @ lm_pos[lane][imported].T)).T + t_l
            d, _ = tree.query(wp)
            struct_meds.append(float(np.median(d)))
        else:
            struct_meds.append(float("nan"))

    finite = [a for a in lane_ates if np.isfinite(a)]
    record = {
        "metric": "multicam_8lane_tpu",
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "n_lanes": n, "n_devices": n_dev, "n_steps": n_steps,
        "lane_ate_m": [round(a, 4) for a in lane_ates],
        "lane_ate_median_m": round(float(np.median(finite)), 4),
        "lane_ate_worst_m": round(max(finite), 4),
        "lanes_tracked": int(sum(np.isfinite(lane_ates))),
        "merge_ok": int(ok.sum()),
        "merge_imported": n_imp.tolist(),
        "struct_median_m": [round(m, 3) if np.isfinite(m) else -1.0
                            for m in struct_meds],
        "step_ms_median": round(
            float(np.median(step_times[4:])) * 1e3, 1),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(record))
    out = os.environ.get("SLAM_LANE_OUT", "MULTICAM_TPU_r05.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
