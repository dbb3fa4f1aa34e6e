"""Per-stage on-device timing of the SLAM pipeline.

Measurement discipline (CLAUDE.md): the axon relay can serve repeated
same-input executions from a cache and ``block_until_ready`` is
unreliable there, so every stage is timed by CHAINING it on varying
inputs (rotating frames / threading the map through) and fetching one
small output leaf at the end; the per-call figure subtracts nothing —
treat it as an upper bound that is HONEST, unlike the old fixed-input
loop whose sub-0.1 ms front-end numbers were relay-cache artifacts.

Usage: python scripts/profile_stages.py  (runs on whatever JAX exposes)
"""

import sys
import time

sys.path.insert(0, ".")

import os
cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from send_slam_tpu.config import CameraConfig, EngineConfig, MapConfig, TrackingConfig
from send_slam_tpu.models.frame import make_frame
from send_slam_tpu.models.local_ba import local_bundle_adjustment
from send_slam_tpu.models.local_mapping import insert_keyframe_with_triangulation
from send_slam_tpu.models.map_state import empty_map, update_landmark_stats
from send_slam_tpu.models.tracking import track_frame
from send_slam_tpu.ops.orb import extract_orb
from send_slam_tpu.utils.synth import SyntheticWorld


def fetch_leaf(out):
    """One small host fetch to drain the pipeline."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf if getattr(leaf, "ndim", 1) == 0 else leaf.reshape(-1)[0])


def time_rotating(name, fn, inputs, n=16):
    """fn(*inputs[k % len]) with VARYING inputs per call; one fetch at
    the end. Reported = total wall / n (includes dispatch + queue)."""
    out = fn(*inputs[0])
    fetch_leaf(out)
    t0 = time.perf_counter()
    for k in range(n):
        out = fn(*inputs[(k + 1) % len(inputs)])
    fetch_leaf(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:32s} {dt:8.2f} ms/call", flush=True)
    return out


def main():
    world = SyntheticWorld(n_points=900, width=640, height=480,
                           fx=520.0, fy=520.0)
    cfg = EngineConfig(
        camera=CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                            cx=320.0, cy=240.0),
        map=MapConfig(max_keyframes=64, max_landmarks=8192, ba_window=8))
    cam, orb, tr = cfg.camera, cfg.orb, cfg.tracking
    n_img = 8
    ts, Rs, tls = world.trajectory(n_frames=n_img)
    imgs = [jnp.asarray(world.render(Rs[k], tls[k])) for k in range(n_img)]
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                    jnp.float32)
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)

    # --- front end ------------------------------------------------------
    time_rotating("extract_orb(full)", jax.jit(
        lambda im: extract_orb(im, orb)), [(im,) for im in imgs])
    jf = jax.jit(lambda im: make_frame(im, 0.0, orb, cam))
    time_rotating("make_frame", jf, [(im,) for im in imgs])
    frames = [jf(im) for im in imgs]
    fetch_leaf(frames[-1])

    # --- map + tracking --------------------------------------------------
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
    res = time_rotating("track_frame(8192 lm)", track,
                        [(m, fr) for fr in frames])

    insert = jax.jit(
        lambda m, fr, idx, inl: insert_keyframe_with_triangulation(
            m, R0, t0, fr, idx, inl, K, tr)[0])
    # Chain the insert on its own output (inputs vary every call).
    k_img = [0]

    def istep(mm):
        k_img[0] += 1
        fr = frames[k_img[0] % n_img]
        return insert(mm, fr, res.matches.idx, res.matches.valid)

    out = istep(m)
    fetch_leaf(out)
    t0_ = time.perf_counter()
    n = 8
    for _ in range(n):
        out = istep(out)
    fetch_leaf(out)
    print(f"{'insert_kf+triangulate':32s} "
          f"{(time.perf_counter() - t0_) / n * 1e3:8.2f} ms/call",
          flush=True)
    m2 = out

    ba = jax.jit(lambda m: local_bundle_adjustment(m, K, cfg.map))
    out = ba(m2)
    fetch_leaf(out)
    t0_ = time.perf_counter()
    for _ in range(n):
        out = ba(out)
    fetch_leaf(out)
    print(f"{'local_ba(W=8,ML=8192) chained':32s} "
          f"{(time.perf_counter() - t0_) / n * 1e3:8.2f} ms/call",
          flush=True)

    stats = jax.jit(update_landmark_stats)
    out = stats(m, res.in_view, res.inlier)
    fetch_leaf(out)
    t0_ = time.perf_counter()
    for k in range(n):
        out = stats(out, res.in_view, res.inlier)
    fetch_leaf(out)
    print(f"{'update_stats chained':32s} "
          f"{(time.perf_counter() - t0_) / n * 1e3:8.2f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
