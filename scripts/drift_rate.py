"""Pre-loop drift-rate metric (VERDICT r2 item 4).

Runs the out-and-back scenario with loop closing DISABLED and reports
raw odometric drift: endpoint error / path length, plus ATE of the
(uncorrected) keyframe trajectory. The reference class (ORB-SLAM3)
drifts ~1% of path on comparable sequences; BASELINE.md's north star is
ATE within 10% of it. Use this as the A/B harness for anything that
claims to improve drift (obs pruning thresholds, fusion radius, wide-BA
windows, keyframe policy).

Usage: python scripts/drift_rate.py        (CPU; ~4 min)
       SLAM_DRIFT_FRAMES=260 python scripts/drift_rate.py
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import conftest  # noqa: F401  (forces the CPU backend like the suite)

import numpy as np
from scipy.spatial.transform import Rotation

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import ate_rmse
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


def out_and_back(n_frames=220, reach=1.8, fps=30.0, hold=16):
    ts, Rs, tls = [], [], []
    move = n_frames - hold
    for k in range(n_frames):
        a = min(k, move - 1) / (move - 1)
        x = reach * (1 - abs(2 * a - 1))
        yaw = -0.1 * x / reach
        c = np.array([x, 0.0, 0.0])
        Rwc = Rotation.from_euler("y", yaw).as_matrix()
        R = Rwc.T
        ts.append(k / fps)
        Rs.append(R)
        tls.append(-R @ c)
    return np.asarray(ts), Rs, tls


def main():
    n_frames = int(os.environ.get("SLAM_DRIFT_FRAMES", "220"))
    seed = int(os.environ.get("SLAM_DRIFT_SEED", "5"))
    world = SyntheticWorld(n_points=700, seed=seed)
    # A/B knob overrides: SLAM_TR_<tracking_field>=value (typed from
    # the dataclass field), e.g. SLAM_TR_WIDE_BA_EVERY_KF=4.
    import dataclasses
    tr_kwargs = dict(init_min_matches=50, pipeline_depth=2,
                     pipeline_stretch=1,
                     # Loop closing OFF: raw odometry only.
                     loop_score_min=1e9)
    ftypes = {f.name: type(getattr(TrackingConfig(), f.name))
              for f in dataclasses.fields(TrackingConfig)}
    otypes = {f.name: type(getattr(OrbConfig(), f.name))
              for f in dataclasses.fields(OrbConfig)}
    orb_kwargs = dict(n_features=512, n_levels=4)

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
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy),
        map=MapConfig(max_keyframes=64, max_landmarks=4096, ba_window=4),
        tracking=TrackingConfig(**tr_kwargs),
    )
    ts, Rs, tls = out_and_back(n_frames=n_frames)
    gt_pos = np.asarray([-R.T @ t for R, t in zip(Rs, tls)])
    path_len = float(np.sum(np.linalg.norm(np.diff(gt_pos, axis=0), axis=1)))

    # SLAM_DRIFT_UINT8=1 quantizes renders to uint8 like the bench (and
    # like every real camera / the wire format): the float-render path
    # is an analytic-renderer artifact with no quantization noise, so
    # sub-pixel localization has nothing to correct there and A/Bs on
    # it do not transfer to real imagery.
    quant = os.environ.get("SLAM_DRIFT_UINT8") == "1"

    sys_ = System(cfg)
    est_ts, est_pos = [], []
    n_ok = 0
    for k in range(len(ts)):
        img = world.render(Rs[k], tls[k])
        if quant:
            img = np.round(img).astype(np.uint8)
        out = sys_.track_monocular(img, float(ts[k]))
        if out.tracking_state == 2 and out.position is not None:
            n_ok += 1
            est_ts.append(out.timestamp)
            est_pos.append(out.position)
    assert sys_.loops_closed == 0, "loop closing was supposed to be off"

    kts, kpos, _ = sys_.keyframe_poses()
    ate_kf = ate_rmse(kts, kpos, ts, gt_pos)
    ate_stream = ate_rmse(est_ts, np.asarray(est_pos), ts, gt_pos)

    # Endpoint drift: Sim3-align on the FIRST half (before drift
    # accumulates), then measure the aligned endpoint error — the
    # loop-closure gap a loop closer would have to fix.
    from send_slam_tpu.io.evaluate import umeyama_alignment
    half = len(kts) // 2
    gt_at = np.stack([gt_pos[np.argmin(np.abs(ts - t))] for t in kts])
    s_, R_, t_ = umeyama_alignment(kpos[:half], gt_at[:half])
    kpos_al = s_ * kpos @ R_.T + t_
    end_err = float(np.linalg.norm(kpos_al[-1] - gt_at[-1]))

    if os.environ.get("SLAM_DRIFT_VERBOSE") == "1":
        # Per-KF aligned error series (full-trajectory Sim3 alignment):
        # flat-from-KF0 offsets mean a bad INIT commit; a growing ramp
        # means accumulating scale/odometric drift.
        s2, R2, t2 = umeyama_alignment(kpos, gt_at)
        kerr = np.linalg.norm(s2 * kpos @ R2.T + t2 - gt_at, axis=1)
        for t, v in zip(kts, kerr):
            print(f"# kf t={t:7.3f}  aligned err {v:.4f}")
        print(f"# init attempts: {sys_.init_attempts}  "
              f"committed at {sys_.init_commit_ts}")

    print(f"frames tracked:   {n_ok}/{n_frames}")
    print(f"keyframes:        {int(np.asarray(sys_.map.n_kf))} "
          f"(inserted {sys_._n_kf_host})")
    print(f"path length:      {path_len:.3f} m")
    print(f"ATE (kf, raw):    {ate_kf:.4f} m")
    print(f"ATE (stream):     {ate_stream:.4f} m")
    print(f"endpoint drift:   {end_err:.4f} m  = "
          f"{100.0 * end_err / path_len:.2f}% of path")


if __name__ == "__main__":
    main()
