"""Per-stage on-device timing of the SLAM pipeline.

Usage: python scripts/profile_stages.py  (runs on whatever JAX exposes)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.config import CameraConfig, EngineConfig, MapConfig, TrackingConfig
from send_slam_tpu.models.frame import make_frame
from send_slam_tpu.models.local_ba import local_bundle_adjustment
from send_slam_tpu.models.local_mapping import insert_keyframe_with_triangulation
from send_slam_tpu.models.map_state import empty_map, update_landmark_stats
from send_slam_tpu.models.tracking import track_frame
from send_slam_tpu.ops.orb import extract_orb
from send_slam_tpu.ops.pyramid import build_pyramid, gaussian_blur
from send_slam_tpu.ops.fast import fast_score_map, nms3x3
from send_slam_tpu.utils.synth import SyntheticWorld


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:32s} {dt:8.2f} ms")
    return out


def main():
    world = SyntheticWorld(n_points=900, width=640, height=480,
                           fx=520.0, fy=520.0)
    cfg = EngineConfig(
        camera=CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                            cx=320.0, cy=240.0),
        map=MapConfig(max_keyframes=64, max_landmarks=8192, ba_window=8))
    cam, orb, tr = cfg.camera, cfg.orb, cfg.tracking
    ts, Rs, tls = world.trajectory(n_frames=4)
    img = jnp.asarray(world.render(Rs[0], tls[0]))
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                    jnp.float32)
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)

    # --- front-end pieces ---------------------------------------------
    timeit("pyramid(8)", jax.jit(
        lambda im: build_pyramid(im, orb.n_levels, orb.scale_factor)), img)
    timeit("blur(640)", jax.jit(lambda im: gaussian_blur(im)), img)
    from send_slam_tpu.ops.orb import _fast_score
    timeit("fast_dispatch(640)", jax.jit(
        lambda im: _fast_score(im, 7.0)), img)
    timeit("fast+nms(640)", jax.jit(
        lambda im: nms3x3(_fast_score(im, 7.0))), img)
    feat = timeit("extract_orb(full)", jax.jit(
        lambda im: extract_orb(im, orb)), img)

    frame = timeit("make_frame", jax.jit(
        lambda im: make_frame(im, 0.0, orb, cam)), img)

    # --- map + tracking ------------------------------------------------
    m = empty_map(cfg.map, orb.n_features)
    rng = np.random.default_rng(0)
    ML = cfg.map.max_landmarks
    m = m._replace(
        lm_pos=jnp.asarray(rng.uniform([-6, -4, 3], [6, 4, 10], (ML, 3)),
                           jnp.float32),
        lm_desc=jnp.asarray(rng.integers(0, 2**32, (ML, 8), dtype=np.uint32)),
        lm_valid=jnp.ones((ML,), bool))
    R0 = jnp.eye(3, dtype=jnp.float32)
    t0 = jnp.zeros(3, jnp.float32)

    track = jax.jit(lambda m, fr: track_frame(
        R0, t0, m.lm_pos, m.lm_desc, m.lm_valid,
        fr.uv_und, fr.feat.desc, fr.feat.valid, fr.feat.octave,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        tr, scale_factor=orb.scale_factor))
    res = timeit("track_frame(8192 lm)", track, m, frame)

    insert = jax.jit(lambda m, fr, idx, inl: insert_keyframe_with_triangulation(
        m, R0, t0, fr, idx, inl, K, tr))
    m2, kf_id, _ = timeit("insert_kf+triangulate", insert, m, frame,
                          res.matches.idx, res.matches.valid)

    ba = jax.jit(lambda m: local_bundle_adjustment(m, K, cfg.map))
    timeit("local_ba(W=8,ML=8192)", ba, m2)

    stats = jax.jit(update_landmark_stats)
    timeit("update_stats", stats, m, res.in_view, res.inlier)


if __name__ == "__main__":
    main()
