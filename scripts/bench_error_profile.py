"""Per-frame error profile of the EXACT bench scenario (CPU).

Reproduces bench.py's world/config/uint8 frames, then prints the
Sim3-aligned per-frame error series and per-KF error series — is the
bench ATE a settling transient, linear drift, or correction jumps?

Usage: python scripts/bench_error_profile.py   (CPU, ~10 min)
Env:   SLAM_BENCH_FRAMES, SLAM_ORB_*/SLAM_TR_* overrides like bench.py.
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

if os.environ.get("SLAM_PROFILE_TPU") != "1":
    import conftest  # noqa: F401  (forces the CPU backend like the suite)

import dataclasses

import numpy as np

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import umeyama_alignment
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


def main():
    n_frames = int(os.environ.get("SLAM_BENCH_FRAMES", "90"))
    # SLAM_WORLD_SEED: vary the rendered world. Single-seed results
    # are basin samples (CPU seed-23 run: ATE 0.25 with a perfectly
    # healthy map); sweep seeds before calling a knob a win. Note a
    # byte-identical rerun after a code change means the change did
    # not reach the compiled program (round 4: XLA's dot-add rewrite
    # silently folded the hi+lo exact splits back to bf16 — see
    # ops/segsum._sum_passes), NOT that the backend caches results:
    # a two-process changed-program probe returned fresh outputs.
    seed = int(os.environ.get("SLAM_WORLD_SEED", "11"))
    print(f"# world seed: {seed}")
    world = SyntheticWorld(n_points=900, width=640, height=480,
                           fx=520.0, fy=520.0, seed=seed)
    tr_kwargs = dict(init_min_matches=50, pipeline_depth=6,
                     pipeline_stretch=2)
    orb_kwargs = {}
    ftypes = {f.name: type(getattr(TrackingConfig(), f.name))
              for f in dataclasses.fields(TrackingConfig)}
    otypes = {f.name: type(getattr(OrbConfig(), f.name))
              for f in dataclasses.fields(OrbConfig)}

    def _cast(cast, v):
        if cast is bool:
            return v.lower() in ("1", "true", "yes")
        if cast is tuple:
            return tuple(int(x) for x in v.split(","))
        return cast(v)

    for k, v in os.environ.items():
        if k.startswith("SLAM_TR_"):
            name = k[len("SLAM_TR_"):].lower()
            tr_kwargs[name] = _cast(ftypes[name], v)
            print(f"# override tracking.{name} = {tr_kwargs[name]}")
        elif k.startswith("SLAM_ORB_"):
            name = k[len("SLAM_ORB_"):].lower()
            orb_kwargs[name] = _cast(otypes[name], v)
            print(f"# override orb.{name} = {orb_kwargs[name]}")
    cfg = EngineConfig(
        orb=OrbConfig(**orb_kwargs),
        camera=CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                            cx=320.0, cy=240.0),
        map=MapConfig(max_keyframes=64, max_landmarks=8192, ba_window=8),
        tracking=TrackingConfig(**tr_kwargs),
    )
    # SLAM_PROFILE_LAPS=N: use the multi-lap (out-and-back) trajectory
    # of the long-session bench — revisit/cull/fuse forensics.
    laps = float(os.environ.get("SLAM_PROFILE_LAPS", "0"))
    if laps > 0:
        ts, Rs, tls = world.trajectory_laps(n_frames=n_frames, laps=laps)
    else:
        ts, Rs, tls = world.trajectory(n_frames=n_frames)
    frames = [np.round(world.render(Rs[k], tls[k])).astype(np.uint8)
              for k in range(n_frames)]
    gt_pos = np.asarray([-R.T @ t for R, t in zip(Rs, tls)])

    sys_ = System(cfg)
    est = {}
    states = []
    inliers = []
    lm_series = []
    scale_series = []
    map_stats = os.environ.get("SLAM_PROFILE_MAPSTATS") == "1"

    def _scale_proxy():
        # Map-frame extent: max camera-center norm over valid KFs. A
        # retroactive map rescale (the round-4 TPU forensics: the KF
        # table ended ~9x the stream trajectory's scale) shows up as a
        # jump in this series at the frame it happens.
        mm = sys_.map
        ok = np.asarray(mm.kf_valid)
        if not ok.any():
            return 0.0
        R = np.asarray(mm.kf_R)[ok]
        t = np.asarray(mm.kf_t)[ok]
        C = -np.einsum("kij,kj->ki", R.transpose(0, 2, 1), t)
        return float(np.linalg.norm(C, axis=1).max())

    for k in range(n_frames):
        out = sys_.track_monocular(frames[k], float(ts[k]))
        states.append(out.tracking_state)
        inliers.append(out.n_inliers)
        lm_series.append(out.n_landmarks)
        if map_stats:   # forces a device sync per frame — diagnostics only
            lm_series[-1] = int(np.asarray(sys_.map.n_landmarks()))
            scale_series.append(_scale_proxy())
        if out.tracking_state == 2 and out.position is not None:
            est[round(out.timestamp * 30)] = np.asarray(out.position)
    pre_flush = _scale_proxy()
    sys_._flush_pipeline()
    print(f"# map extent pre-flush {pre_flush:.4f} "
          f"post-flush {_scale_proxy():.4f}")
    if scale_series:
        print("# map extent per frame: "
              + " ".join(f"{v:.3f}" for v in scale_series))

    # End-of-run map forensics: is the trackable set replenished
    # (new landmarks created AND matched) or starving?
    m = sys_.map
    n_kf = int(np.asarray(m.n_kf))
    print(f"# map: n_kf={n_kf} n_landmarks={int(np.asarray(m.n_landmarks()))}")
    if lm_series:
        print("# n_landmarks per frame: "
              + " ".join(str(v) for v in lm_series))
    vc = np.asarray(m.lm_vote_count)[np.asarray(m.lm_valid)]
    if vc.size:
        hist = np.bincount(np.clip(vc, 0, 9), minlength=10)
        print("# lm vote-count histogram (1..9+): "
              + " ".join(str(int(h)) for h in hist[1:]))
    fnd = np.asarray(m.lm_found, float)[np.asarray(m.lm_valid)]
    vis = np.asarray(m.lm_visible, float)[np.asarray(m.lm_valid)]
    if vis.size:
        r = fnd / np.maximum(vis, 1)
        print(f"# lm found/visible: median {np.median(r):.2f}  "
              f"q10 {np.quantile(r, 0.1):.2f}  q90 {np.quantile(r, 0.9):.2f}")
    obs = np.asarray(m.kf_obs_lm)
    valid_lm = np.asarray(m.lm_valid)
    kf_ts = np.asarray(m.kf_timestamp)
    kf_ok = np.asarray(m.kf_valid)
    print("# per-KF live obs counts (t: obs->valid):")
    for s in range(min(n_kf, m.max_keyframes)):
        if not kf_ok[s]:
            continue
        row = obs[s]
        n_obs = int((row >= 0).sum())
        n_live = int(valid_lm[np.clip(row, 0, m.max_landmarks - 1)][
            row >= 0].sum())
        print(f"#   kf{s:3d} t={kf_ts[s]:.3f}  obs {n_obs:4d} -> live {n_live:4d}")

    print("# states: " + "".join(str(s) for s in states))
    print("# inliers (lagged): "
          + " ".join(str(i) for i in inliers))
    print(f"# loop attempts: {sys_.loop_attempts}")
    commit_ts = sys_.init_commit_ts
    print(f"# init attempts: {sys_.init_attempts}  committed at: "
          f"{-1.0 if commit_ts is None else commit_ts:.3f} s")
    ks = sorted(est.keys())
    e = np.stack([est[k] for k in ks])
    g = gt_pos[ks]
    s_, R_, t_ = umeyama_alignment(e, g)
    err = np.linalg.norm((s_ * (R_ @ e.T)).T + t_ - g, axis=1)
    print("# per-frame aligned error (m):")
    for k, v in zip(ks, err):
        print(f"frame {k:3d}  err {v:.4f}")
    print(f"# stream ATE: {float(np.sqrt(np.mean(err ** 2))):.4f}")

    kts, kpos, _ = sys_.keyframe_poses()
    gk = np.stack([gt_pos[np.argmin(np.abs(ts - t))] for t in kts])
    s2, R2, t2 = umeyama_alignment(kpos, gk)
    kerr = np.linalg.norm((s2 * (R2 @ kpos.T)).T + t2 - gk, axis=1)
    # Alignment-free cross-check: the KF-table position vs the STREAM
    # pose recorded when that frame was tracked, plus the KF position
    # mapped through the stream's alignment. Separates "BA rewrote the
    # keyframe away from where tracking put it" (big raw delta) from
    # "the 12-point scale fit is ill-conditioned" (big kf-aligned err,
    # small raw delta).
    frame_ts = {k: ts[k] for k in ks}
    print(f"# alignment scales: stream {s_:.3f}  kf-own {s2:.3f}")
    print("# per-KF aligned error (m) [own fit | stream fit | raw delta"
          " vs stream pose, GT units]:")
    for t, v, p in zip(kts, kerr, kpos):
        k_near = min(ks, key=lambda k: abs(frame_ts[k] - t))
        raw = (s_ * np.linalg.norm(p - est[k_near])
               if abs(frame_ts[k_near] - t) < 1e-3 else float("nan"))
        g_near = gt_pos[np.argmin(np.abs(ts - t))]
        via_stream = np.linalg.norm(s_ * (R_ @ p) + t_ - g_near)
        print(f"kf t={t:.3f}  err {v:.4f}  {via_stream:.4f}  {raw:.4f}")
    print(f"# kf ATE: {float(np.sqrt(np.mean(kerr ** 2))):.4f}")


if __name__ == "__main__":
    main()
