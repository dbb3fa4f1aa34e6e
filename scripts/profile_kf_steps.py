"""Trustworthy on-device timing of the KEYFRAME-RATE programs.

The axon relay can serve repeated same-input executions from a cache
and `block_until_ready` is unreliable there (CLAUDE.md), so each
program is timed by CHAINING it on its own output (inputs vary every
call) and fetching one small leaf at the end; the reported per-call
time is (total - one fetch RTT estimate) / n.

Usage: python scripts/profile_kf_steps.py   (runs on default backend)
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


def fetch_rtt(x):
    t0 = time.perf_counter()
    np.asarray(x)
    return time.perf_counter() - t0


def time_chained(name, step, m0, n=8):
    """step: m -> m (or (m, extra...)); chained so inputs vary.
    Reports (dispatch+drain)/n — the tail fetch is INCLUDED so queued
    device execution is charged to the step being measured."""
    m = m0
    # one call to ensure compiled (warmup() already compiled these)
    def to_map(out):
        return out if hasattr(out, "kf_t") else out[0]

    out0 = step(m)
    m1 = to_map(out0)
    np.asarray(m1.kf_t[0])          # full drain
    t0 = time.perf_counter()
    m = m1
    for _ in range(n):
        m = to_map(step(m))
    t_disp = time.perf_counter() - t0
    np.asarray(m.kf_t[0])
    t_total = time.perf_counter() - t0
    per = t_total / n * 1e3
    print(f"{name:28s} {per:9.2f} ms/call   "
          f"(n={n}, dispatch {t_disp/n*1e3:.1f} ms/call)", flush=True)
    return out0


def main():
    world = SyntheticWorld(n_points=900, width=640, height=480,
                           fx=520.0, fy=520.0)
    # Capacity knobs: SLAM_PROF_MK/ML/BW profile the flagship scale
    # (256/16384) instead of the bench scale — the long-bench median
    # is set by THESE programs, not the 64/8192 ones.
    mk = int(os.environ.get("SLAM_PROF_MK", "64"))
    ml = int(os.environ.get("SLAM_PROF_ML", "8192"))
    bw = int(os.environ.get("SLAM_PROF_BW", "8"))
    cfg = EngineConfig(
        camera=CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                            cx=320.0, cy=240.0),
        map=MapConfig(max_keyframes=mk, max_landmarks=ml, ba_window=bw),
        tracking=TrackingConfig(init_min_matches=50),
    )
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    sys_ = System(cfg)
    t0 = time.perf_counter()
    sys_.warmup(image_dtype=np.uint8)
    print(f"warmup: {time.perf_counter()-t0:.1f} s", flush=True)

    # Build a real small map by tracking ~30 frames.
    ts, Rs, tls = world.trajectory(n_frames=40)
    frames = [np.round(world.render(Rs[k], tls[k])).astype(np.uint8)
              for k in range(40)]
    for k in range(40):
        sys_.track_monocular(frames[k], float(ts[k]))
    sys_._flush_pipeline()
    m = sys_.map
    np.asarray(m.kf_t[0])
    print(f"map built: n_kf={int(np.asarray(m.n_kf))}", flush=True)

    img = jnp.asarray(frames[20])
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, jnp.float32)

    # --- front-end breakdown (varying input per call: distinct
    # pre-uploaded frames; one tail fetch drains the queue) ----------
    imgs_dev = [jnp.asarray(f) for f in frames[:16]]
    from send_slam_tpu.models.frame import make_frame as _mf
    from send_slam_tpu.ops.orb import extract_orb as _eo
    from send_slam_tpu.ops.pyramid import build_pyramid as _bp
    orb, camc = cfg.orb, cfg.camera
    jp = jax.jit(lambda im: _bp(im.astype(jnp.float32), orb.n_levels,
                                orb.scale_factor))
    je = jax.jit(lambda im: _eo(im.astype(jnp.float32), orb))
    jf = jax.jit(lambda im: _mf(im.astype(jnp.float32), 0.0, orb, camc))

    def time_per_image(name, fn, leaf, n=16):
        out = fn(imgs_dev[0])
        np.asarray(leaf(out))
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(imgs_dev[i % len(imgs_dev)])
        t_disp = time.perf_counter() - t0
        np.asarray(leaf(out))
        t_total = time.perf_counter() - t0
        print(f"{name:28s} {t_total/n*1e3:9.2f} ms/call   "
              f"(n={n}, dispatch {t_disp/n*1e3:.1f} ms/call)", flush=True)
        return out

    time_per_image("pyramid", jp, lambda o: o[0][0, 0])
    feat = time_per_image("extract_orb", je, lambda o: o.uv[0])
    frame0 = time_per_image("make_frame", jf, lambda o: o.uv_und[0])

    # track_frame alone, varying frame per call.
    jt = jax.jit(lambda mm, fr: sys_._track_step(
        mm, eye, zero, fr, cfg.tracking.search_radius_px))
    frs = [jf(im) for im in imgs_dev]
    np.asarray(frs[-1].uv_und[0])
    res0 = jt(m, frs[0])
    np.asarray(res0.t)
    t0 = time.perf_counter()
    for i in range(16):
        res_ = jt(m, frs[i % len(frs)])
    t_disp = time.perf_counter() - t0
    np.asarray(res_.t)
    print(f"{'track_frame':28s} {(time.perf_counter()-t0)/16*1e3:9.2f} "
          f"ms/call   (n=16, dispatch {t_disp/16*1e3:.1f} ms/call)",
          flush=True)

    # Per-frame hot path (chained on map output, varying image). The
    # round-3 frame_step carries a LoopState and makes the keyframe/
    # BA-slice decisions in-graph; a mid-sequence state exercises the
    # no-insert + slice path (the common case).
    st0 = sys_._st
    k_img = [0]
    def fstep(mm):
        k_img[0] += 1
        m2, st2, s = sys_._frame_step(
            mm, st0, imgs_dev[k_img[0] % len(imgs_dev)], 1.0,
            jnp.asarray(False))
        return m2, st2, s
    m3 = time_chained("frame_step(track+slice)", fstep, m, n=16)[0]

    lam = jnp.asarray(1e-3, jnp.float32)
    pr = jnp.asarray(False)
    time_chained("maintain(prune+cull)", sys_._maintain_step, m3, n=4)
    time_chained("wide_slice(W<=64)",
                 lambda mm: sys_._wide_slice(mm, lam, pr)[0], m3, n=4)
    time_chained("global_slice(W=MK)",
                 lambda mm: sys_._global_slice(mm, lam, pr)[0], m3, n=4)
    time_chained("compact", lambda mm: sys_._compact_step(mm)[0], m3, n=4)
    time_chained("forced_cull", lambda mm: sys_._forced_cull_step(mm)[0],
                 m3, n=4)

    kf_id = jnp.asarray(int(np.asarray(m3.n_kf)) - 1, jnp.int32)
    def loopc(mm):
        cand, score = sys_._loop_candidate(mm, kf_id)
        mo = mm._replace(kf_t=mm.kf_t + 0.0 * score)
        return mo
    time_chained("loop_candidate", loopc, m3, n=8)
    key = jax.random.PRNGKey(0)
    def loops3(mm):
        loop = sys_._loop_sim3(mm, kf_id,
                               jnp.zeros((3,), jnp.int32), key)
        leaf = jax.tree_util.tree_leaves(loop)[0]
        return mm._replace(
            kf_t=mm.kf_t + 0.0 * jnp.ravel(leaf)[0].astype(jnp.float32))
    time_chained("loop_sim3", loops3, m3, n=4)


if __name__ == "__main__":
    main()
