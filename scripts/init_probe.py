"""Probe the two-view init on the EXACT bench pair, vs ground truth.

The round-3 TPU bench profile showed the error is large from the first
post-init frames — the committed init STRUCTURE itself differs between
backends (same committed pair, frames t=0.0 and t=0.200). This probe
replays the System's exact key sequence for attempt N and reports
rotation / translation-direction error vs GT and triangulated-depth
error vs the sprite world, per backend.

Usage: python scripts/init_probe.py            (axon TPU)
       SLAM_PROBE_CPU=1 python scripts/init_probe.py
"""

import os
import sys

sys.path.insert(0, ".")

if os.environ.get("SLAM_PROBE_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


def _commit_report(world, ts, Rs, tls, fa, fb, res, label=""):
    """GT quality + commit-time observables of ONE committed init."""
    ka = int(round(float(np.asarray(fa.timestamp)) * 30))
    kb = int(round(float(np.asarray(fb.timestamp)) * 30))
    R_gt = Rs[kb] @ Rs[ka].T
    t_gt = np.asarray(tls[kb]) - R_gt @ np.asarray(tls[ka])
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    t_dir = t_est / max(np.linalg.norm(t_est), 1e-12)
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(R_est @ R_gt.T) - 1) / 2, -1, 1)))
    t_err = np.degrees(np.arccos(np.clip(abs(t_dir @ t_gt_dir), -1, 1)))

    # Commit-time observables (no GT): accepted-point parallax and
    # the normalized baseline (init_v numerator).
    pok = np.asarray(res.point_ok)
    X = np.asarray(res.points)[pok]
    C1 = -(R_est.T @ t_est)
    r0 = X
    r1 = X - C1[None]
    cosp = np.sum(r0 * r1, -1) / np.maximum(
        np.linalg.norm(r0, axis=-1) * np.linalg.norm(r1, axis=-1), 1e-12)
    par_deg = np.degrees(np.arccos(np.clip(cosp, -1, 1)))
    z = X[:, 2]
    print(f"{label}frames {ka}->{kb}: rot {rot_err:6.2f} deg  "
          f"t-dir {t_err:6.2f} deg  n_good {int(res.n_good):3d}  "
          f"score {float(res.score):6.1f}  |t| {np.linalg.norm(t_est):.3f}  "
          f"par p50/p90 {np.median(par_deg):.2f}/"
          f"{np.percentile(par_deg, 90):.2f} deg  "
          f"z p10/p50/p90 {np.percentile(z, 10):.2f}/{np.median(z):.2f}/"
          f"{np.percentile(z, 90):.2f}")


def main():
    seed = int(os.environ.get("SLAM_PROBE_SEED", "11"))
    world = SyntheticWorld(n_points=900, width=640, height=480,
                           fx=520.0, fy=520.0, seed=seed)
    cfg = EngineConfig(
        orb=OrbConfig(subpixel=os.environ.get("SLAM_PROBE_SUBPIXEL",
                                              "1") == "1"),
        camera=CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                            cx=320.0, cy=240.0),
        map=MapConfig(max_keyframes=64, max_landmarks=8192, ba_window=8),
        tracking=TrackingConfig(init_min_matches=50,
                                pipeline_depth=int(os.environ.get(
                                    "SLAM_PROBE_DEPTH", "6")),
                                pipeline_stretch=int(os.environ.get(
                                    "SLAM_PROBE_STRETCH", "2"))),
    )
    # The bench's 90-frame trajectory (frame spacing depends on
    # n_frames!) — only the head is rendered/fed.
    ts, Rs, tls = world.trajectory(n_frames=90)
    # SLAM_PROBE_FRAMES > 20 keeps feeding after the first commit so
    # collapse-detector resets and their RE-commits are captured too —
    # the rotten-init coverage diagnosis needs every commit, not the
    # first (each entry reports GT quality + commit-time observables).
    n_feed = int(os.environ.get("SLAM_PROBE_FRAMES", "20"))
    frames = [np.round(world.render(Rs[k], tls[k])).astype(np.uint8)
              for k in range(n_feed)]

    sys_ = System(cfg)
    # Drive the REAL init loop and intercept the committed pair — no
    # key-sequence replay guesswork.
    commits = []
    orig_commit = sys_._commit_init

    def commit_spy(ref_frame, cur_frame, res, timestamp, n_good=None):
        commits.append(dict(ref=ref_frame, cur=cur_frame, res=res,
                            ts=timestamp))
        orig_commit(ref_frame, cur_frame, res, timestamp, n_good=n_good)

    sys_._commit_init = commit_spy
    for k in range(n_feed):
        sys_.track_monocular(frames[k], float(ts[k]))
        if commits and n_feed <= 20:
            break
    if not commits:
        print(f"no init committed in {n_feed} frames")
        return
    print(f"world seed {seed}: {len(commits)} commit(s)")
    for i, c in enumerate(commits):
        _commit_report(world, ts, Rs, tls, c["ref"], c["cur"], c["res"],
                       label=f"  commit {i}: ")
    committed = commits[0]
    res = committed["res"]
    fa = committed["ref"]
    ka = int(round(float(np.asarray(fa.timestamp)) * 30))
    kb = int(round(float(np.asarray(committed["cur"].timestamp)) * 30))
    print(f"committed pair: frames {ka} -> {kb} (ts {committed['ts']:.3f})")

    # GT relative pose camB-from-camA (world == cam0 frame here).
    R_gt = Rs[kb] @ Rs[ka].T
    t_gt = np.asarray(tls[kb]) - R_gt @ np.asarray(tls[ka])
    t_gt_dir = t_gt / np.linalg.norm(t_gt)

    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    t_dir = t_est / max(np.linalg.norm(t_est), 1e-12)
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(R_est @ R_gt.T) - 1) / 2, -1, 1)))
    t_err = np.degrees(np.arccos(np.clip(abs(t_dir @ t_gt_dir), -1, 1)))

    print(f"backend: {jax.default_backend()}")
    print(f"ok={bool(res.ok)} n_good={int(res.n_good)} "
          f"score={float(res.score):.2f}")
    print(f"rot err:   {rot_err:.4f} deg")
    print(f"t-dir err: {t_err:.4f} deg")

    # Triangulated-depth error vs the sprite world (scale-aligned:
    # monocular init scale is arbitrary — align median depth).
    pok = np.asarray(res.point_ok)
    X = np.asarray(res.points)[pok]
    uv = np.asarray(fa.feat.uv)[pok]
    p = world.points @ Rs[ka].T + tls[ka]
    z = p[:, 2]
    u = world.fx * p[:, 0] / z + world.cx
    v = world.fy * p[:, 1] / z + world.cy
    errs, zs_est, zs_gt = [], [], []
    for j in range(len(X)):
        d2 = (u - uv[j, 0]) ** 2 + (v - uv[j, 1]) ** 2
        i0 = np.argmin(d2)
        s_px = max(2.0, world.size_at_1m[i0] / z[i0])
        if d2[i0] > s_px ** 2:
            continue
        zs_est.append(X[j, 2])
        zs_gt.append(z[i0])
    zs_est = np.asarray(zs_est)
    zs_gt = np.asarray(zs_gt)
    s = np.median(zs_gt) / np.median(zs_est)
    rel = (s * zs_est - zs_gt) / zs_gt
    print(f"n assoc:   {len(zs_est)}/{int(pok.sum())}")
    print(f"depth rel err: median {np.median(rel):+.4f}  "
          f"mad {np.median(np.abs(rel - np.median(rel))):.4f}  "
          f"p90(|.|) {np.percentile(np.abs(rel), 90):.4f}")


if __name__ == "__main__":
    main()
