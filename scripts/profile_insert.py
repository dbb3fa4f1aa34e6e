"""On-device timing of the KEYFRAME-INSERT path decomposition.

insert_keyframe_with_triangulation is the one remaining >10 ms
keyframe-rate dispatch (CLAUDE.md round-5 item 3). This times the whole
step and each of its parts (cull / insert+refresh / per-ref
triangulation / duplicate fusion) with the same chained-varying-input
discipline as profile_kf_steps.py (the axon relay caches repeated
same-input executions and block_until_ready is unreliable there).

Usage: python scripts/profile_insert.py   (default backend = TPU)
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

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, TrackingConfig,
)
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


def time_chained(name, step, m0, n=8):
    def to_map(out):
        return out if hasattr(out, "kf_t") else out[0]

    out0 = step(m0)
    m1 = to_map(out0)
    np.asarray(m1.kf_t[0])
    t0 = time.perf_counter()
    m = m1
    for _ in range(n):
        m = to_map(step(m))
    t_disp = time.perf_counter() - t0
    np.asarray(m.kf_t[0])
    t_total = time.perf_counter() - t0
    print(f"{name:32s} {t_total/n*1e3:9.2f} ms/call   "
          f"(n={n}, dispatch {t_disp/n*1e3:.1f} ms/call)", flush=True)
    return out0


def main():
    world = SyntheticWorld(n_points=900, width=640, height=480,
                           fx=520.0, fy=520.0)
    cfg = EngineConfig(
        camera=CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                            cx=320.0, cy=240.0),
        map=MapConfig(max_keyframes=64, max_landmarks=8192, ba_window=8),
        tracking=TrackingConfig(init_min_matches=50),
    )
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    sys_ = System(cfg)
    t0 = time.perf_counter()
    sys_.warmup(image_dtype=np.uint8)
    print(f"warmup: {time.perf_counter()-t0:.1f} s", flush=True)

    ts, Rs, tls = world.trajectory(n_frames=40)
    frames = [np.round(world.render(Rs[k], tls[k])).astype(np.uint8)
              for k in range(40)]
    for k in range(40):
        sys_.track_monocular(frames[k], float(ts[k]))
    sys_._flush_pipeline()
    m = sys_.map
    np.asarray(m.kf_t[0])
    n_kf = int(np.asarray(m.n_kf))
    print(f"map built: n_kf={n_kf}", flush=True)

    from send_slam_tpu.models.frame import make_frame
    from send_slam_tpu.models.local_mapping import (
        create_new_landmarks, fuse_duplicate_landmarks,
        insert_keyframe_with_triangulation,
    )
    from send_slam_tpu.models.map_state import (
        cull_landmarks, insert_keyframe, refresh_landmarks,
    )

    orb, cam = cfg.orb, cfg.camera
    tr = cfg.tracking
    K = sys_._K
    jf = jax.jit(lambda im: make_frame(im.astype(jnp.float32), 0.0,
                                       orb, cam))
    frs = [jf(jnp.asarray(f)) for f in frames[:16]]
    np.asarray(frs[-1].uv_und[0])

    N = cfg.orb.n_features
    ML = cfg.map.max_landmarks
    eye = jnp.eye(3, dtype=jnp.float32)

    # Production-shaped observations: run the real tracking step on the
    # built map (as System does right before an insert) and use ITS
    # match_idx / inlier mask — an all-False mask would profile maximal
    # triangulation candidates and an empty fuse workload instead of
    # the production data distribution.
    from send_slam_tpu.models.tracking import track_frame

    @jax.jit
    def obs_for(mm, fr):
        newest = jnp.clip(mm.n_kf - 1, 0, mm.max_keyframes - 1)
        res = track_frame(
            mm.kf_R[newest], mm.kf_t[newest],
            mm.lm_pos, mm.lm_desc, mm.lm_valid,
            fr.uv_und, fr.feat.desc, fr.feat.valid, fr.feat.octave,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            tr, scale_factor=orb.scale_factor, n_levels=orb.n_levels)
        return (res.R, res.t, res.matches.idx,
                res.matches.valid & res.inlier, res.n_inliers)

    obs = [obs_for(m, fr) for fr in frs]
    print(f"insert workload: {int(np.asarray(obs[0][4]))} tracked inliers "
          f"on frame 0", flush=True)

    # Full insert step: pose + observations from the real track result,
    # varying frame per call, chained on the map.
    k_img = [0]

    @jax.jit
    def full_insert(mm, R, t, idx, inl, fr):
        m2, kf_id, n_new = insert_keyframe_with_triangulation(
            mm, R, t, fr, idx, inl, K, tr,
            scale_factor=orb.scale_factor, n_levels=orb.n_levels,
            triangulate_backs=tr.triangulate_backs)
        return m2

    def fstep(mm):
        k_img[0] += 1
        j = k_img[0] % len(frs)
        R, t, idx, inl, _ = obs[j]
        return full_insert(mm, R, t, idx, inl, frs[j])
    time_chained("insert_full(3 refs+fuse)", fstep, m, n=8)

    # --- parts ------------------------------------------------------
    # Each part is idempotent on a settled map, so a naive chain would
    # run iterations 2..n on byte-identical inputs — exactly what the
    # axon relay caches. Perturb a cheap input leaf per call (visible/
    # found counters or the target keyframe) so every timed execution
    # sees fresh bytes.
    k_it = [0]

    @jax.jit
    def cull_step(mm, k):
        mm = mm._replace(lm_visible=mm.lm_visible + (k % 2))
        return cull_landmarks(mm)[0]

    def cstep(mm):
        k_it[0] += 1
        return cull_step(mm, jnp.asarray(k_it[0] % 2, jnp.int32))
    time_chained("cull_landmarks", cstep, m, n=8)

    @jax.jit
    def ins_refresh(mm, fr):
        obs_row = jnp.full((N,), -1, jnp.int32)
        m2, kf_id = insert_keyframe(
            mm, eye, jnp.zeros(3, jnp.float32), fr.timestamp, fr.uv_und,
            fr.feat.desc, fr.feat.octave, fr.feat.valid, obs_row)
        return refresh_landmarks(m2, kf_id)

    k_img[0] = 0
    def rstep(mm):
        k_img[0] += 1
        return ins_refresh(mm, frs[k_img[0] % len(frs)])
    time_chained("insert_kf+refresh", rstep, m, n=8)

    @jax.jit
    def tri_one(mm, back):
        newest = jnp.clip(mm.n_kf - 1, 0, mm.max_keyframes - 1)
        m2, n = create_new_landmarks(
            mm, newest, jnp.maximum(newest - back, 0), K, tr,
            scale_factor=orb.scale_factor, n_levels=orb.n_levels)
        return m2

    def tstep(mm):
        k_it[0] += 1
        return tri_one(mm, jnp.asarray(1 + k_it[0] % 2, jnp.int32))
    time_chained("create_new_landmarks(x1)", tstep, m, n=8)

    @jax.jit
    def fuse_one(mm, k):
        mm = mm._replace(lm_found=mm.lm_found + (k % 2))
        newest = jnp.clip(mm.n_kf - 1, 0, mm.max_keyframes - 1)
        m2, n = fuse_duplicate_landmarks(mm, newest, K, tr)
        return m2

    def fustep(mm):
        k_it[0] += 1
        return fuse_one(mm, jnp.asarray(k_it[0] % 2, jnp.int32))
    time_chained("fuse_duplicates", fustep, m, n=8)

    @jax.jit
    def refresh_only(mm, back):
        newest = jnp.clip(mm.n_kf - 1, 0, mm.max_keyframes - 1)
        return refresh_landmarks(mm, jnp.maximum(newest - back, 0))

    def restep(mm):
        k_it[0] += 1
        return refresh_only(mm, jnp.asarray(k_it[0] % 2, jnp.int32))
    time_chained("refresh_landmarks", restep, m, n=8)


if __name__ == "__main__":
    main()
