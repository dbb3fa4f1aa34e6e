"""Loop-closure integration: an out-and-back trajectory must trigger
retrieval + Sim3 verification + pose-graph correction (BASELINE.json
config 4's loop machinery, on the synthetic world)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import ate_rmse
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


def out_and_back(n_frames=220, reach=1.8, fps=30.0, hold=16):
    """Pan right to ``reach`` metres, come back, and hold at the start
    viewpoint for ``hold`` frames — revisiting with accumulated drift
    (the hold gives the loop closer frames to verify and correct)."""
    ts, Rs, tls = [], [], []
    move = n_frames - hold
    for k in range(n_frames):
        a = min(k, move - 1) / (move - 1)
        x = reach * (1 - abs(2 * a - 1))          # triangle wave 0->reach->0
        yaw = -0.1 * x / reach
        c = np.array([x, 0.0, 0.0])
        Rwc = Rotation.from_euler("y", yaw).as_matrix()
        R = Rwc.T
        ts.append(k / fps)
        Rs.append(R)
        tls.append(-R @ c)
    return np.asarray(ts), Rs, tls


@pytest.mark.slow
def test_loop_closes_on_revisit():
    world = SyntheticWorld(n_points=700, seed=5)
    cfg = EngineConfig(
        orb=OrbConfig(n_features=512, n_levels=4),
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy),
        map=MapConfig(max_keyframes=64, max_landmarks=4096, ba_window=4),
        tracking=TrackingConfig(init_min_matches=50, pipeline_depth=2, pipeline_stretch=1,
                                loop_min_gap_kf=10),
    )
    ts, Rs, tls = out_and_back()
    sys_ = System(cfg)
    est = {}
    n_ok = 0
    for k in range(len(ts)):
        out = sys_.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
        if out.tracking_state == 2 and out.position is not None:
            n_ok += 1
            est[out.timestamp] = out.position
    assert n_ok > 80, n_ok
    # The revisit must have triggered at least one loop closure.
    assert sys_.loops_closed >= 1, sys_.loops_closed
    gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
    # Evaluate the CORRECTED keyframe trajectory (streamed per-frame
    # poses keep their historical drift; the keyframe poses reflect
    # pose-graph correction — the TUM-benchmark convention).
    kts, kpos, _ = sys_.keyframe_poses()
    err = ate_rmse(kts, kpos, ts, np.asarray(gt_pos))
    # The loop machinery (retrieval -> Sim3 -> essential-graph PGO ->
    # whole-map BA) corrects raw odometric drift (~0.7 without it) to
    # ~0.01. Round 2's bar was 0.45 against a chaotic 0.08-0.38
    # spread; round 3 removed the chaos (deterministic host schedule,
    # scored init, conditional polish rebase, multi-candidate Sim3) —
    # measured 0.007-0.013 across seeds, 7-9 loop closures per run.
    # The bar is ~4x the worst measured seed.
    assert err < 0.06, err


@pytest.mark.slow
def test_long_loop_with_branch():
    """Out, a mid-sequence branch excursion, then back to the start:
    corrections must propagate through covisibility structure, not just
    the sequential chain (VERDICT round-1 item 5's done-bar)."""
    world = SyntheticWorld(n_points=800, seed=9)
    cfg = EngineConfig(
        orb=OrbConfig(n_features=512, n_levels=4),
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy),
        map=MapConfig(max_keyframes=64, max_landmarks=4096, ba_window=4),
        tracking=TrackingConfig(init_min_matches=50, pipeline_depth=2, pipeline_stretch=1,
                                loop_min_gap_kf=10),
    )
    n_frames, fps = 260, 30.0
    ts, Rs, tls = [], [], []
    for k in range(n_frames):
        a = k / (n_frames - 1)
        # Piecewise: out (0-0.35), branch up/down (0.35-0.6),
        # return (0.6-0.93), hold (tail).
        if a < 0.35:
            x, y = 1.6 * (a / 0.35), 0.0
        elif a < 0.6:
            b = (a - 0.35) / 0.25
            x, y = 1.6, 0.5 * np.sin(np.pi * b)
        elif a < 0.93:
            b = (a - 0.6) / 0.33
            x, y = 1.6 * (1 - b), 0.0
        else:
            x, y = 0.0, 0.0
        yaw = -0.1 * x / 1.6
        c = np.array([x, y, 0.0])
        Rwc = Rotation.from_euler("y", yaw).as_matrix()
        R = Rwc.T
        ts.append(k / fps)
        Rs.append(R)
        tls.append(-R @ c)
    ts = np.asarray(ts)

    sys_ = System(cfg)
    n_ok = 0
    for k in range(n_frames):
        out = sys_.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
        n_ok += out.tracking_state == 2
    assert n_ok > 120, n_ok
    assert sys_.loops_closed >= 1, sys_.loop_attempts[-5:]
    gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
    kts, kpos, _ = sys_.keyframe_poses()
    err = ate_rmse(kts, kpos, ts, np.asarray(gt_pos))
    # The branch excursion's keyframes are weakly constrained (they
    # re-observe mostly the same distant structure, so many get culled
    # as redundant and the survivors carry few observations) — the
    # loop corrections land (several verify) but cannot fully rectify
    # the leg. Round 2 measured ~0.48 (bar 0.55); the round-3 stack
    # (deterministic schedule + drift-rate fixes + multi-candidate
    # verification) measures 0.004 across seeds with 6 loop closures
    # per run. Bar at ~15x the measured value.
    assert err < 0.06, err


@pytest.mark.slow
def test_confuser_texture_closes_right_loop():
    """Two statistically similar regions (region B is region A's point
    field translated + non-rigidly jittered — similar local texture,
    different geometry): retrieval may rank the confuser first, but the
    multi-candidate Sim3 verification must close the loop against the
    REAL revisit, never the confuser (VERDICT r2 item 6 done-bar)."""
    world = SyntheticWorld(n_points=700, seed=5)
    rng = np.random.default_rng(11)
    ptsA = np.asarray(world.points)
    # Confuser field: same constellation shifted far right in x, each
    # point jittered ~0.35 — local appearance statistics match, the
    # rigid/similarity alignment does not.
    ptsB = ptsA + np.array([7.0, 0.0, 0.0]) \
        + rng.normal(0, 0.35, ptsA.shape)
    world.points = np.concatenate([ptsA, ptsB])
    # The confuser keeps region A's exact per-point appearance
    # (intensity/size/shading) — an appearance TWIN whose geometry
    # alone distinguishes it.
    world.intensity = np.concatenate([world.intensity] * 2)
    world.size_at_1m = np.concatenate([world.size_at_1m] * 2)
    world.grad_dir = np.concatenate([world.grad_dir] * 2)

    cfg = EngineConfig(
        orb=OrbConfig(n_features=512, n_levels=4),
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy),
        map=MapConfig(max_keyframes=64, max_landmarks=4096, ba_window=4),
        tracking=TrackingConfig(init_min_matches=50, pipeline_depth=2,
                                pipeline_stretch=1, loop_min_gap_kf=10),
    )
    # Sweep into confuser territory and back: x 0 -> 4.5 -> 0, hold.
    n_frames, fps, hold = 300, 30.0, 16
    move = n_frames - hold
    ts, Rs, tls = [], [], []
    for k in range(n_frames):
        a = min(k, move - 1) / (move - 1)
        x = 4.5 * (1 - abs(2 * a - 1))
        c = np.array([x, 0.0, 0.0])
        R = np.eye(3)
        ts.append(k / fps)
        Rs.append(R)
        tls.append(-R @ c)
    ts = np.asarray(ts)
    t_a_end = ts[int(0.35 * n_frames)]   # KFs before this are region-A-ish

    sys_ = System(cfg)
    for k in range(n_frames):
        sys_.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
    sys_._flush_pipeline()

    # a[3] is True for applied closures; "rejected" marks Sim3-verified
    # closures the post-correction sanity gate discarded.
    verified = [a for a in sys_.loop_attempts if a[3] is True]
    assert sys_.loops_closed >= 1, sys_.loop_attempts[-8:]
    # Every APPLIED loop candidate must be an early (region-A) keyframe
    # — never a confuser-region one. Timestamps survive compaction.
    kf_ts = np.asarray(sys_.map.kf_timestamp)
    for att in verified:
        applied = att[4]
        assert applied is not None
        # The candidate slot was recorded pre-compaction; tolerate a
        # compacted table by checking the slot's CURRENT timestamp if
        # still valid — a confuser KF (phase B) carries a mid-sequence
        # timestamp either way.
        t_cand = float(kf_ts[min(applied, len(kf_ts) - 1)])
        assert t_cand < t_a_end + 1.0, (att, t_cand, t_a_end)
