"""TPU vs CPU numerical-parity audit (VERDICT round-1 item 3).

The round-1 bench showed TPU ATE 2-4x the CPU ATE on the same synthetic
sequence. This script isolates WHERE the divergence enters by dumping
per-stage outputs on one backend and diffing against the other:

  stage 1  ORB front end      keypoint positions + descriptors
  stage 2  two-view init      R, t vs ground truth
  stage 3  pose-only GN       pose error on exact synthetic matches
  stage 4  40-frame mini e2e  ATE RMSE

Usage (two processes — JAX binds one platform per process here):
    python scripts/parity_check.py --dump /tmp/parity_cpu.npz --cpu
    python scripts/parity_check.py --dump /tmp/parity_tpu.npz
    python scripts/parity_check.py --compare /tmp/parity_cpu.npz \
        /tmp/parity_tpu.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dump(path: str, force_cpu: bool) -> None:
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import send_slam_tpu  # noqa: F401  (sets matmul precision)
    from send_slam_tpu.config import (
        CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
    )
    from send_slam_tpu.geometry.se3 import se3_log
    from send_slam_tpu.models.frame import make_frame
    from send_slam_tpu.models.initializer import two_view_init
    from send_slam_tpu.models.tracking import pose_only_gn
    from send_slam_tpu.utils.synth import SyntheticWorld

    out = {"backend": np.asarray(jax.default_backend(), dtype="U16")}
    world = SyntheticWorld(n_points=900, width=640, height=480,
                           fx=520.0, fy=520.0)
    cam = CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                       cx=320.0, cy=240.0)
    cfg = EngineConfig(
        camera=cam,
        map=MapConfig(max_keyframes=64, max_landmarks=8192, ba_window=8),
        tracking=TrackingConfig(init_min_matches=50),
    )
    ts, Rs, tls = world.trajectory(n_frames=40)
    K = world.K()

    # ---- stage 1: front end -------------------------------------------
    frames = []
    for k in (0, 8):
        img = jnp.asarray(np.round(world.render(Rs[k], tls[k])), jnp.float32)
        fr = jax.jit(lambda im: make_frame(im, 0.0, cfg.orb, cam))(img)
        frames.append(fr)
        out[f"kp_uv_{k}"] = np.asarray(fr.uv_und)
        out[f"kp_valid_{k}"] = np.asarray(fr.feat.valid)
        out[f"kp_desc_{k}"] = np.asarray(fr.feat.desc)
        out[f"kp_oct_{k}"] = np.asarray(fr.feat.octave)

    # ---- stage 2: two-view initializer (fixed key) ---------------------
    fa, fb = frames
    res = jax.jit(lambda a, b, key: two_view_init(
        a.uv_und, a.feat.desc, a.feat.valid, a.feat.angle,
        b.uv_und, b.feat.desc, b.feat.valid, b.feat.angle,
        jnp.asarray(K, jnp.float32), key, cfg.tracking))(
        fa, fb, jax.random.PRNGKey(7))
    out["init_ok"] = np.asarray(res.ok)
    out["init_R"] = np.asarray(res.R)
    out["init_t"] = np.asarray(res.t)
    out["init_ngood"] = np.asarray(res.n_good)
    # Ground-truth relative pose (up to scale): T_b0 = T_b ∘ T_0^-1.
    R_rel = Rs[8] @ Rs[0].T
    t_rel = tls[8] - R_rel @ tls[0]
    out["init_R_gt"] = R_rel
    out["init_t_gt"] = t_rel / max(np.linalg.norm(t_rel), 1e-12)

    # ---- stage 3: pose GN on exact correspondences ---------------------
    rng = np.random.default_rng(0)
    X = rng.uniform([-3, -3, 3], [3, 3, 9], (256, 3)).astype(np.float32)
    R_gt, t_gt = Rs[5].astype(np.float32), tls[5].astype(np.float32)
    p = X @ R_gt.T + t_gt
    uv = np.stack([520.0 * p[:, 0] / p[:, 2] + 320.0,
                   520.0 * p[:, 1] / p[:, 2] + 240.0], -1)
    uv += rng.normal(0, 0.3, uv.shape)                 # pixel noise
    R0 = Rs[4].astype(np.float32)
    t0 = tls[4].astype(np.float32)
    opt = jax.jit(pose_only_gn)(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X),
        jnp.asarray(uv, jnp.float32), jnp.ones((256,), bool),
        520.0, 520.0, 320.0, 240.0)
    dR = np.asarray(opt.R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    out["gn_rot_err_deg"] = np.asarray(ang)
    out["gn_t_err"] = np.linalg.norm(np.asarray(opt.t) - t_gt)

    # ---- stage 4: mini e2e ---------------------------------------------
    from send_slam_tpu.io.evaluate import ate_rmse
    from send_slam_tpu.models.system import System
    sys_ = System(cfg)
    sys_.warmup(image_dtype=np.uint8)
    est_ts, est_pos = [], []
    for k in range(40):
        img = np.round(world.render(Rs[k], tls[k])).astype(np.uint8)
        o = sys_.track_monocular(img, float(ts[k]))
        if o.tracking_state == 2:
            est_ts.append(o.timestamp)
            est_pos.append(o.position)
    gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
    out["e2e_n_ok"] = np.asarray(len(est_pos))
    out["e2e_ate"] = np.asarray(
        ate_rmse(est_ts, np.asarray(est_pos), ts, np.asarray(gt_pos))
        if len(est_pos) >= 3 else np.inf)

    np.savez(path, **out)
    print(f"# backend={out['backend']}")
    for k in ("init_ok", "init_ngood", "gn_rot_err_deg", "gn_t_err",
              "e2e_n_ok", "e2e_ate"):
        print(f"# {k} = {out[k]}")
    print(f"wrote {path}")


def compare(a_path: str, b_path: str) -> None:
    a, b = np.load(a_path), np.load(b_path)
    print(f"A={a['backend']}  B={b['backend']}")

    for k in (0, 8):
        va, vb = a[f"kp_valid_{k}"], b[f"kp_valid_{k}"]
        ua, ub = a[f"kp_uv_{k}"], b[f"kp_uv_{k}"]
        print(f"frame {k}: n_kp A={va.sum()} B={vb.sum()}")
        # Match keypoints by nearest position; report subpixel deltas.
        pa, pb = ua[va], ub[vb]
        d = np.linalg.norm(pa[:, None] - pb[None, :], axis=-1)
        nn = d.min(1)
        print(f"  kp matched<0.5px: {(nn < 0.5).mean():.3f}  "
              f"median |duv|: {np.median(nn):.4f}px  "
              f"p95: {np.percentile(nn, 95):.3f}px")

    for k in ("init_ok", "init_ngood"):
        print(f"{k}: A={a[k]} B={b[k]}")
    for lbl, src in (("A", a), ("B", b)):
        dR = src["init_R"] @ src["init_R_gt"].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        tn = src["init_t"] / max(np.linalg.norm(src["init_t"]), 1e-12)
        terr = np.degrees(np.arccos(np.clip(
            np.abs(tn @ src["init_t_gt"]), -1, 1)))
        print(f"init {lbl}: rot err {ang:.4f} deg, t-dir err {terr:.4f} deg")
    for k in ("gn_rot_err_deg", "gn_t_err", "e2e_n_ok", "e2e_ate"):
        print(f"{k}: A={a[k]:.6f} B={b[k]:.6f}" if a[k].ndim == 0
              else f"{k}: A={a[k]} B={b[k]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()
    if args.compare:
        compare(*args.compare)
    else:
        dump(args.dump or "/tmp/parity.npz", args.cpu)
